"""Equivalence tests for the TPU-optimized kernel formulations."""
import numpy as np
import jax
import jax.numpy as jnp

from frog_tpu.registration import kernels


def test_ktable_link_reduction_matches_naive():
    """The K-table dense link reduction equals a naive per-link loop."""
    import dataclasses

    from frog_tpu.registration.state import GroupArrays

    rng = np.random.default_rng(0)
    n, p, k = 3, 40, 8
    xyz = rng.uniform(0, 50, (n, p, 3)).astype(np.float32)
    link_dst = rng.integers(0, n * p, (n, p, k)).astype(np.int32)
    link_valid = rng.random((n, p, k)) < 0.6
    arrays = GroupArrays(
        xyz=jnp.asarray(xyz),
        xyz2=jnp.asarray(xyz),
        point_valid=jnp.ones((n, p), bool),
        link_dst=jnp.asarray(link_dst),
        link_valid=jnp.asarray(link_valid),
        hard_dst=jnp.zeros((n, p, 8), jnp.int32),
        hard_valid=jnp.zeros((n, p, 8), bool),
        em=jnp.tile(jnp.asarray([[10.0, 300.0, 0.5]], jnp.float32), (n, 1)),
        affine=jnp.tile(np.eye(4, dtype=np.float32), (n, 1, 1)),
    )
    pA, diff, dist = kernels.link_geometry(arrays)
    w = kernels.link_weights(arrays, dist)
    s_disp = np.asarray(jnp.sum(w[..., None] * diff, axis=2))

    from frog_tpu.registration.stats import inlier_probability

    flat = xyz.reshape(n * p, 3)
    em = np.asarray(arrays.em)
    want = np.zeros((n, p, 3), np.float32)
    for i in range(n):
        for q in range(p):
            for kk in range(k):
                if not link_valid[i, q, kk]:
                    continue
                dflat = int(link_dst[i, q, kk])
                d = flat[dflat] - xyz[i, q]
                dd = float(np.linalg.norm(d))
                pa = float(inlier_probability(jnp.float32(dd), jnp.asarray(em[i])))
                pb = float(
                    inlier_probability(
                        jnp.float32(dd), jnp.asarray(em[dflat // p])
                    )
                )
                want[i, q] += min(pa, pb) * d
    np.testing.assert_allclose(s_disp, want, rtol=1e-3, atol=1e-4)


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
    got = np.asarray(
        kernels._bspline_scatter_sep(basis, vals, dims[0] * dims[1])
    ).reshape(n, dims[0], dims[1], dims[2], 4)

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


def test_em_strided_sliced_gather_matches_full_slice():
    """The stride>1 EM fast path (slice the link table BEFORE the
    destination gather) is bit-identical to gathering every link distance
    and slicing afterwards — same split-bf16 table, same element order."""
    import dataclasses

    from frog_tpu.registration.state import GroupArrays
    from frog_tpu.registration.stats import estimate_mixture

    rng = np.random.default_rng(7)
    n, p, k = 3, 64, 6
    xyz2 = rng.uniform(0, 80, (n, p, 3)).astype(np.float32)
    link_dst = rng.integers(0, n * p, (n, p, k)).astype(np.int32)
    link_valid = rng.random((n, p, k)) < 0.7
    em0 = jnp.tile(jnp.asarray([[3.0, 40.0, 0.5]], jnp.float32), (n, 1))
    arrays = GroupArrays(
        xyz=jnp.asarray(xyz2),
        xyz2=jnp.asarray(xyz2),
        point_valid=jnp.ones((n, p), bool),
        link_dst=jnp.asarray(link_dst),
        link_valid=jnp.asarray(link_valid),
        hard_dst=jnp.zeros((n, p, 4), jnp.int32),
        hard_valid=jnp.zeros((n, p, 4), bool),
        em=em0,
        affine=jnp.tile(np.eye(4, dtype=np.float32), (n, 1, 1)),
    )
    for stride in (3, 17):
        fast = kernels.em_reestimate(
            arrays, arrays.xyz2, em0, 50, 1e-6, stride
        )
        # reference formulation: full gather, then slice
        _, _, dist = kernels.link_geometry(arrays)
        dist = dist.reshape(n, -1)[:, ::stride]
        valid = np.asarray(arrays.link_valid).reshape(n, -1)[:, ::stride]
        slow = estimate_mixture(
            dist, jnp.asarray(valid), em0, max_iterations=50, epsilon=1e-6
        )
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_virtual_row_split_matches_wide_rows():
    """A forced-narrow link table (surplus links in virtual rows that
    duplicate the point's coordinates) reproduces the wide-row layout:
    identical optimizer trajectories up to f32 summation order, identical
    link sets, identical per-image link counts."""
    import sys

    sys.path.insert(0, "tests")
    from synthetic import make_synthetic_group

    from frog_tpu.registration import GroupConfig, GroupRegistration
    from frog_tpu.registration.state import build_group_state

    graph, _ = make_synthetic_group(
        seed=11, n_images=4, n_points=250, extent=200.0, warp_amp=5.0,
        noise=0.5, outlier_fraction=0.1, match_fraction=0.9,
    )

    wide, meta_w = build_group_state(graph, links_per_row=64)
    narrow, meta_n = build_group_state(graph, links_per_row=4)
    assert narrow.link_dst.shape[2] == 4
    assert narrow.xyz.shape[1] > meta_n.n_points.max()  # virtual rows exist
    # identical half-link multisets per image: (true src, dst img, dst pt)
    for i in range(4):
        def linkset(arrays, meta, i):
            p = arrays.xyz.shape[1]
            dst = np.asarray(arrays.link_dst[i]).reshape(-1)
            valid = np.asarray(arrays.link_valid[i]).reshape(-1)
            k = arrays.link_dst.shape[2]
            src = np.repeat(np.asarray(meta.row_src[i]), k)
            return sorted(
                (int(s), int(d // p), int(d % p))
                for s, d, v in zip(src, dst, valid) if v
            )
        assert linkset(wide, meta_w, i) == linkset(narrow, meta_n, i)
        # virtual rows duplicate their source point's coordinates
        rs = np.asarray(meta_n.row_src[i])
        vmask = rs != np.arange(rs.shape[0])
        np.testing.assert_array_equal(
            np.asarray(narrow.xyz[i])[vmask], np.asarray(narrow.xyz[i])[rs[vmask]]
        )

    def run(links_per_row):
        cfg = GroupConfig(
            linear_iterations=8, deformable_levels=1,
            deformable_iterations=10, initial_grid_size=80.0,
            guarantee_diffeomorphism=False, verbose=False,
            links_per_row=links_per_row,
            # full-sample EM: the stride subsample's element order is
            # layout-dependent, which would mask layout equivalence
            em_max_samples=None,
        )
        reg = GroupRegistration(graph, cfg)
        reg.run()
        return np.asarray([m.E for m in reg.measures]), reg

    es_wide, reg_w = run(64)
    es_narrow, reg_n = run(4)
    np.testing.assert_allclose(es_narrow, es_wide, rtol=2e-4)
    for cw, cn in zip(reg_w.chains, reg_n.chains):
        np.testing.assert_allclose(
            np.asarray(cn.transforms[-1].coeffs),
            np.asarray(cw.transforms[-1].coeffs),
            atol=5e-3,
        )
