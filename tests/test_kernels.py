"""Equivalence tests for the TPU-optimized kernel formulations."""
import numpy as np
import jax
import jax.numpy as jnp

from frog_tpu.registration import kernels


def test_segment_sum_sorted_matches_segment_sum():
    rng = np.random.default_rng(0)
    n, l, p = 3, 200, 40
    src = np.sort(rng.integers(0, p, (n, l)), axis=1)
    vals = rng.normal(size=(n, l, 2)).astype(np.float32)
    bnd = np.stack([np.searchsorted(src[i], np.arange(p + 1)) for i in range(n)])
    got = np.asarray(
        kernels.segment_sum_sorted(jnp.asarray(vals), jnp.asarray(bnd, jnp.int32))
    )
    want = np.stack(
        [
            np.asarray(
                jax.ops.segment_sum(jnp.asarray(vals[i]), jnp.asarray(src[i]), p)
            )
            for i in range(n)
        ]
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_separable_bspline_matches_gather():
    rng = np.random.default_rng(1)
    n, p = 2, 50
    dims = (6, 7, 5)
    origin = jnp.asarray([-10.0, -5.0, 0.0])
    spacing = jnp.asarray([8.0, 9.0, 11.0])
    coeffs = jnp.asarray(rng.normal(size=(n, *dims, 3)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-5, 40, (n, p, 3)), jnp.float32)

    want = np.asarray(
        kernels.transform_points_bspline(coeffs, origin, spacing, xyz)
    )
    basis = kernels.bspline_basis(origin, spacing, dims, xyz)
    got = np.asarray(kernels.bspline_apply_sep(coeffs, basis, xyz))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_separable_scatter_matches_dense():
    """The separable scatter must equal the direct 64-tap scatter-add."""
    rng = np.random.default_rng(2)
    n, p = 2, 30
    dims = (5, 6, 7)
    origin = jnp.asarray([0.0, 0.0, 0.0])
    spacing = jnp.asarray([10.0, 10.0, 10.0])
    xyz = jnp.asarray(rng.uniform(5, 45, (n, p, 3)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(n, p, 4)), jnp.float32)

    basis = kernels.bspline_basis(origin, spacing, dims, xyz)
    got = np.asarray(kernels._bspline_scatter_sep(basis, vals)).reshape(
        n, dims[0], dims[1], dims[2], 4
    )

    # dense reference via the gather-based weights
    from frog_tpu.transforms.bspline import bspline_weights

    want = np.zeros((n, *dims, 4), np.float32)
    u = np.asarray((xyz - origin) / spacing)
    base = np.floor(u).astype(int) - 1
    w = np.asarray(bspline_weights(jnp.asarray(u - np.floor(u))))
    for i in range(n):
        for q in range(p):
            for a in range(4):
                for b in range(4):
                    for c in range(4):
                        x, y, z = base[i, q] + (a, b, c)
                        if 0 <= x < dims[0] and 0 <= y < dims[1] and 0 <= z < dims[2]:
                            ww = w[i, q, 0, a] * w[i, q, 1, b] * w[i, q, 2, c]
                            want[i, x, y, z] += ww * np.asarray(vals)[i, q]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
