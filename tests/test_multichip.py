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

    arrays = ge._synthetic_arrays(n_images=4, n_points=64, seed=7)
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


def test_full_registration_sharded_equals_unsharded():
    """A complete registration run on an 8-device mesh must reproduce the
    single-device result."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from frog_tpu.parallel.mesh import make_mesh
    from frog_tpu.registration import GroupConfig, GroupRegistration
    from tests.synthetic import make_synthetic_group

    graph, _ = make_synthetic_group(n_images=8, n_points=100, warp_amp=3.0, seed=12)
    cfg = GroupConfig(
        linear_iterations=10,
        deformable_levels=1,
        deformable_iterations=10,
        initial_grid_size=60.0,
        verbose=False,
    )
    ref = GroupRegistration(graph, cfg)
    ref.run()

    mesh = make_mesh(8)
    with mesh:
        sharded = GroupRegistration(graph, cfg, mesh=mesh)
        sharded.run()

    np.testing.assert_allclose(
        np.asarray(sharded.arrays.xyz2), np.asarray(ref.arrays.xyz2), atol=1e-3
    )
    es_a = [m.E for m in ref.measures]
    es_b = [m.E for m in sharded.measures]
    np.testing.assert_allclose(es_a, es_b, rtol=1e-4)


def test_padded_mesh_equals_unsharded():
    """An image count NOT divisible by the mesh size pads with empty
    images; results must match the unsharded run (incl. the hubless-mean
    divisor)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from frog_tpu.parallel.mesh import make_mesh
    from frog_tpu.registration import GroupConfig, GroupRegistration
    from tests.synthetic import make_synthetic_group

    graph, _ = make_synthetic_group(n_images=6, n_points=80, warp_amp=3.0, seed=3)
    cfg = GroupConfig(
        linear_iterations=6,
        deformable_levels=1,
        deformable_iterations=6,
        initial_grid_size=60.0,
        verbose=False,
    )
    ref = GroupRegistration(graph, cfg)
    ref.run()

    mesh = make_mesh(4)
    with mesh:
        sharded = GroupRegistration(graph, cfg, mesh=mesh)
        sharded.run()
    assert sharded.arrays.n_images == 8 and sharded.n_real == 6
    np.testing.assert_allclose(
        np.asarray(sharded.arrays.xyz2)[:6], np.asarray(ref.arrays.xyz2),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        [m.E for m in sharded.measures], [m.E for m in ref.measures], rtol=1e-4
    )


def test_pair_partitioning():
    from frog_tpu.parallel.distributed import merge_pair_graphs, partition_pairs

    all_pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    got = []
    for p in range(4):
        got.extend(partition_pairs(6, p, 4))
    assert sorted(got) == sorted(all_pairs)


def test_multidevice_extraction_with_masks_equals_single(tmp_path):
    """Round-robin multi-device extraction WITH mask volumes: the mask is
    pinned to each volume's assigned device (extract.py
    extract_keypoints_async), and the keypoints must equal the
    single-device run's exactly."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from frog_tpu.io.keypoints import read_keypoints
    from frog_tpu.io.mhd import write_volume
    from frog_tpu.io.volume import Volume
    from frog_tpu.ops.surf3d import SurfParams
    from frog_tpu.pipeline import extract_stage

    rng = np.random.default_rng(11)
    shape = (40, 40, 40)
    g = np.stack(
        np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                    indexing="ij"), -1)
    vols, masks = [], []
    for i in range(3):
        data = np.zeros(shape, np.float32)
        for c in rng.uniform(6, 34, (15, 3)):
            data += np.float32(60.0) * np.exp(
                -np.sum((g - c) ** 2, -1) / 6.0).astype(np.float32)
        v = str(tmp_path / f"v{i}.nii.gz")
        write_volume(v, Volume(data, origin=np.zeros(3), spacing=np.ones(3)))
        vols.append(v)
        m = np.zeros(shape, np.float32)
        m[:, : 20 + 4 * i, :] = 1.0
        mf = str(tmp_path / f"m{i}.nii.gz")
        write_volume(mf, Volume(m, origin=np.zeros(3), spacing=np.ones(3)))
        masks.append(mf)

    surf = SurfParams(spacing=1.0, threshold=0.0, n_points=50)
    one = extract_stage(vols, surf, str(tmp_path / "one"), masks=masks,
                        verbose=False)
    shd = extract_stage(vols, surf, str(tmp_path / "shd"), masks=masks,
                        verbose=False, devices=3)
    for i, (f1, f2) in enumerate(zip(one, shd)):
        k1, k2 = read_keypoints(f1), read_keypoints(f2)
        np.testing.assert_array_equal(k1.xyz, k2.xyz)
        np.testing.assert_array_equal(k1.desc, k2.desc)
        assert k1.xyz[:, 1].max() < 20 + 4 * i + 0.5  # mask respected
