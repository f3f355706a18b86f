import numpy as np
import pytest


def test_dryrun_multichip_8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    candidate, xyz2, n_big, e = out
    assert np.isfinite(float(e))


def test_sharded_matches_unsharded():
    """The image-sharded optimizer step must produce the same numbers as
    the single-device run (float tolerance)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    import dataclasses

    import __graft_entry__ as ge
    from frog_tpu.parallel.mesh import make_mesh, shard_group_arrays
    from frog_tpu.registration import kernels

    arrays = ge._synthetic_arrays(n_images=4, n_points=64, n_links=128, seed=7)
    movable = jnp.ones((4,), bool)

    def step(a):
        affine, e = kernels.linear_update(a, movable, jnp.float32(0.5), True)
        return affine, e

    affine0, e0 = jax.jit(step)(arrays)

    mesh = make_mesh(4)
    sharded = shard_group_arrays(arrays, mesh)
    with mesh:
        affine1, e1 = jax.jit(step)(sharded)
    np.testing.assert_allclose(np.asarray(affine0), np.asarray(affine1), rtol=1e-5)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-5)
