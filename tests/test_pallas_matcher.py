"""Pallas matcher kernel vs an exact emulation of its arithmetic
(interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from frog_tpu.ops import pallas_matcher as pm


@pytest.mark.skipif(not pm.HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_top2_matches_emulation():
    rng = np.random.default_rng(0)
    pb, pa, d = 256, 1024, 48
    desc_b = rng.normal(size=(pb, d)).astype(np.float32)
    desc_a = rng.normal(size=(pa, d)).astype(np.float32)
    desc_b /= np.linalg.norm(desc_b, axis=1, keepdims=True)
    desc_a /= np.linalg.norm(desc_a, axis=1, keepdims=True)
    desc_b[:200] = desc_a[:200] + rng.normal(scale=0.02, size=(200, d))
    lapl_b = rng.choice([-1.0, 1.0], pb).astype(np.float32)
    lapl_a = rng.choice([-1.0, 1.0], pa).astype(np.float32)
    lapl_a[:200] = lapl_b[:200]
    scale_b = rng.uniform(1, 2, pb).astype(np.float32)
    scale_a = rng.uniform(1, 2, pa).astype(np.float32)
    scale_a[:200] = scale_b[:200]
    valid_a = np.ones(pa, bool)
    valid_a[-50:] = False
    ratio = np.float32(1.3)

    db = jnp.asarray(desc_b)
    da = jnp.asarray(desc_a)
    meta_b = pm.prep_meta(
        jnp.asarray(lapl_b), jnp.asarray(scale_b), jnp.ones(pb, bool), db
    )
    meta_a = pm.prep_meta(
        jnp.asarray(lapl_a), jnp.asarray(scale_a), jnp.asarray(valid_a), da
    )
    d1, d2, i1, i2 = pm.pallas_top2(
        db.astype(jnp.bfloat16),
        meta_b,
        da.astype(jnp.bfloat16),
        meta_a,
        jnp.asarray([[ratio]], jnp.float32),
        interpret=True,
    )
    d1, d2, i1, i2 = (np.asarray(v) for v in (d1, d2, i1, i2))

    # Emulate the kernel's arithmetic exactly: bf16 inputs, f32 cross
    # accumulation, f32 norms/masks.
    db16 = np.asarray(jnp.asarray(desc_b, jnp.bfloat16).astype(jnp.float32))
    da16 = np.asarray(jnp.asarray(desc_a, jnp.bfloat16).astype(jnp.float32))
    cross = db16 @ da16.T
    norm_b = np.sum(desc_b.astype(np.float32) ** 2, axis=1, dtype=np.float32)
    norm_a = np.sum(desc_a.astype(np.float32) ** 2, axis=1, dtype=np.float32)
    dist = np.maximum(norm_b[:, None] + norm_a[None, :] - 2 * cross, 0).astype(
        np.float32
    )
    sr = (scale_b[:, None] / scale_a[None, :]).astype(np.float32)
    mask = lapl_b[:, None] == lapl_a[None, :]
    mask &= (sr <= ratio) & (sr * ratio >= np.float32(1.0))
    mask &= valid_a[None, :]
    dist = np.where(mask, dist, np.inf)

    want_i1 = np.argmin(dist, axis=1)
    want_d1 = dist[np.arange(pb), want_i1]
    dist2 = dist.copy()
    dist2[np.arange(pb), want_i1] = np.inf
    want_i2 = np.argmin(dist2, axis=1)
    want_d2 = dist2[np.arange(pb), want_i2]

    has1 = np.isfinite(want_d1)
    np.testing.assert_array_equal(np.isfinite(d1), has1)
    np.testing.assert_allclose(d1[has1], want_d1[has1], rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(i1[has1], want_i1[has1])
    has2 = np.isfinite(want_d2)
    np.testing.assert_array_equal(np.isfinite(d2), has2)
    np.testing.assert_allclose(d2[has2], want_d2[has2], rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(i2[has2], want_i2[has2])


@pytest.mark.skipif(not pm.HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_top2_v2_matches_emulation():
    """v2 (fused gate channel + packed-key top-2) against the exact
    emulation: found-flags must match exactly; the returned candidates
    must satisfy the gates and rank correctly up to the 2^-13 key
    quantization (the caller's exact rescore re-sorts the finalists)."""
    rng = np.random.default_rng(1)
    pb, pa, d = 512, 2048, 48
    desc_b = rng.normal(size=(pb, d)).astype(np.float32)
    desc_a = rng.normal(size=(pa, d)).astype(np.float32)
    desc_b /= np.linalg.norm(desc_b, axis=1, keepdims=True)
    desc_a /= np.linalg.norm(desc_a, axis=1, keepdims=True)
    desc_b[:300] = desc_a[:300] + rng.normal(scale=0.02, size=(300, d))
    lapl_b = rng.choice([-1.0, 1.0], pb).astype(np.float32)
    lapl_a = rng.choice([-1.0, 1.0], pa).astype(np.float32)
    lapl_a[:300] = lapl_b[:300]
    scale_b = rng.uniform(1, 2, pb).astype(np.float32)
    scale_a = rng.uniform(1, 2, pa).astype(np.float32)
    scale_a[:300] = scale_b[:300]
    valid_a = np.ones(pa, bool)
    valid_a[-70:] = False
    ratio = np.float32(1.3)

    db = jnp.asarray(desc_b)
    da = jnp.asarray(desc_a)
    meta_b = pm.prep_meta(
        jnp.asarray(lapl_b), jnp.asarray(scale_b), jnp.ones(pb, bool), db
    )
    meta_a = pm.prep_meta(
        jnp.asarray(lapl_a), jnp.asarray(scale_a), jnp.asarray(valid_a), da
    )
    d1, d2, i1, i2 = pm.pallas_top2_v2(
        db.astype(jnp.bfloat16),
        meta_b,
        da.astype(jnp.bfloat16),
        meta_a,
        jnp.asarray([[ratio]], jnp.float32),
        interpret=True,
    )
    d1, d2, i1, i2 = (np.asarray(v) for v in (d1, d2, i1, i2))

    db16 = np.asarray(jnp.asarray(desc_b, jnp.bfloat16).astype(jnp.float32))
    da16 = np.asarray(jnp.asarray(desc_a, jnp.bfloat16).astype(jnp.float32))
    cross = db16 @ da16.T
    norm_b = np.sum(desc_b.astype(np.float32) ** 2, axis=1, dtype=np.float32)
    norm_a = np.sum(desc_a.astype(np.float32) ** 2, axis=1, dtype=np.float32)
    dist = np.maximum(norm_b[:, None] + norm_a[None, :] - 2 * cross, 0).astype(
        np.float32
    )
    # the v2 gate: log-scale difference (equivalent to the ratio gate away
    # from the exact boundary) + laplacian sign + validity
    ls_b = np.log(scale_b) + np.where(lapl_b > 0, 2000.0, 0.0)
    ls_a = (
        np.log(scale_a)
        + np.where(lapl_a > 0, 2000.0, 0.0)
        + np.where(valid_a, 0.0, 1e9)
    )
    mask = np.abs(ls_b[:, None] - ls_a[None, :]) <= np.log(ratio)
    dist = np.where(mask, dist, np.inf)

    want_i1 = np.argmin(dist, axis=1)
    want_d1 = dist[np.arange(pb), want_i1]
    dist2 = dist.copy()
    dist2[np.arange(pb), want_i1] = np.inf
    want_d2 = dist2[np.arange(pb), np.argmin(dist2, axis=1)]

    has1 = np.isfinite(want_d1)
    np.testing.assert_array_equal(np.isfinite(d1), has1)
    # returned candidates must satisfy the gates...
    sel = np.flatnonzero(has1)
    assert mask[sel, i1[sel]].all()
    # ...and rank correctly up to key quantization
    got_d1 = dist[sel, i1[sel]]
    assert np.all(got_d1 <= want_d1[sel] * (1 + 2**-12) + 1e-12)
    has2 = np.isfinite(want_d2)
    np.testing.assert_array_equal(np.isfinite(d2), has2)
    sel2 = np.flatnonzero(has2)
    assert mask[sel2, i2[sel2]].all()
    got_d2 = dist[sel2, i2[sel2]]
    assert np.all(got_d2 <= want_d2[sel2] * (1 + 2**-12) + 1e-12)
    # the quantized surrogate distances agree with the true values
    np.testing.assert_allclose(
        d1[sel], want_d1[sel], rtol=2**-12, atol=1e-12
    )


@pytest.mark.skipif(not pm.HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_top2_v3_matches_v2_contract():
    """v3 (MXU-folded norm/laplacian/validity penalties) + the gated
    exact rescore must reproduce the v2 + plain rescore acceptance on a
    realistic planted fixture."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    pb, pa, d = 512, 2048, 48
    desc_b = rng.normal(size=(pb, d)).astype(np.float32)
    desc_a = rng.normal(size=(pa, d)).astype(np.float32)
    desc_b /= np.linalg.norm(desc_b, axis=1, keepdims=True)
    desc_a /= np.linalg.norm(desc_a, axis=1, keepdims=True)
    desc_b[:300] = desc_a[:300] + rng.normal(scale=0.02, size=(300, d))
    lapl_b = rng.choice([-1.0, 1.0], pb).astype(np.float32)
    lapl_a = rng.choice([-1.0, 1.0], pa).astype(np.float32)
    lapl_a[:300] = lapl_b[:300]
    scale_b = rng.uniform(1, 2, pb).astype(np.float32)
    scale_a = rng.uniform(1, 2, pa).astype(np.float32)
    scale_a[:300] = scale_b[:300]
    valid_a = np.ones(pa, bool)
    valid_a[-100:] = False
    ratio = np.float32(1.3)

    db, da = jnp.asarray(desc_b), jnp.asarray(desc_a)
    qb, rb, lsb = pm.prep_aug(
        jnp.asarray(lapl_b), jnp.asarray(scale_b), jnp.ones(pb, bool), db
    )
    qa, ra, lsa = pm.prep_aug(
        jnp.asarray(lapl_a), jnp.asarray(scale_a), jnp.asarray(valid_a), da
    )
    d1, d2, i1, i2 = pm.pallas_top2_v3(
        qb, lsb, ra, lsa, jnp.asarray([[ratio]], jnp.float32),
        interpret=True,
    )
    from frog_tpu.ops.matcher import _exact_rescore_gated

    e1, e2, best = _exact_rescore_gated(
        db, jnp.asarray(lapl_b), jnp.asarray(scale_b),
        da, jnp.asarray(lapl_a), jnp.asarray(scale_a), jnp.asarray(valid_a),
        i1, i2, d1, d2, jnp.float32(ratio),
    )
    e1, e2, best = np.asarray(e1), np.asarray(e2), np.asarray(best)

    # reference: exact masked top-1 in f64-ish numpy
    dist = (
        np.sum(desc_b**2, 1)[:, None] + np.sum(desc_a**2, 1)[None, :]
        - 2.0 * desc_b @ desc_a.T
    )
    mask = (lapl_b[:, None] == lapl_a[None, :]) & valid_a[None, :]
    sr = scale_b[:, None] / scale_a[None, :]
    mask &= (sr <= ratio) & (sr * ratio >= 1.0)
    dist = np.where(mask, dist, np.inf)
    want1 = np.argmin(dist, axis=1)
    have_any = np.isfinite(dist[np.arange(pb), want1])

    # planted rows (strong matches): winner must agree
    strong = np.arange(300)
    agree = (best[strong] == want1[strong]) | ~have_any[strong]
    assert agree.mean() > 0.99, agree.mean()
    # rows with no valid candidate must come back inf
    none = ~have_any
    assert np.all(np.isinf(e1[none]))
    # accepted distances are exact f32 recomputations
    ok = np.isfinite(e1) & (best == want1)
    np.testing.assert_allclose(
        e1[ok], dist[np.arange(pb), want1][ok], rtol=1e-5, atol=1e-6
    )
