import numpy as np
import jax.numpy as jnp

from frog_tpu.registration.stats import (
    CHI_MEAN,
    chi_pdf,
    estimate_mixture,
    histogram,
    inlier_probability,
)


def chi3_samples(rng, c, n):
    """Chi(3)-distributed samples scaled by c (= Maxwell distribution)."""
    return c * np.linalg.norm(rng.normal(size=(n, 3)), axis=1)


def test_chi_pdf_normalization():
    x = np.linspace(0, 10, 2001)
    pdf = np.asarray(chi_pdf(jnp.asarray(x, jnp.float32)))
    integral = np.trapezoid(pdf, x)
    np.testing.assert_allclose(integral, 1.0, atol=1e-3)
    np.testing.assert_allclose(np.trapezoid(pdf * x, x), CHI_MEAN, atol=1e-3)


def test_em_recovers_mixture():
    rng = np.random.default_rng(0)
    n_in, n_out = 8000, 2000
    c1_true, c2_true = 5.0, 120.0
    d = np.concatenate(
        [chi3_samples(rng, c1_true, n_in), chi3_samples(rng, c2_true, n_out)]
    ).astype(np.float32)
    d = d[None, :]  # one image
    valid = np.ones_like(d, dtype=bool)
    params = jnp.asarray([[10.0, 300.0, 0.5]], jnp.float32)
    out = np.asarray(estimate_mixture(jnp.asarray(d), jnp.asarray(valid), params))
    c1, c2, ratio = out[0]
    assert abs(c1 - c1_true) / c1_true < 0.1
    assert abs(c2 - c2_true) / c2_true < 0.1
    assert abs(ratio - 0.8) < 0.05


def test_em_multiple_images_lockstep():
    rng = np.random.default_rng(1)
    d1 = chi3_samples(rng, 3.0, 5000)
    d2 = chi3_samples(rng, 50.0, 5000)
    L = 5000
    d = np.stack([d1, d2]).astype(np.float32)
    valid = np.ones_like(d, dtype=bool)
    params = jnp.asarray([[10.0, 300.0, 0.5]] * 2, jnp.float32)
    out = np.asarray(estimate_mixture(jnp.asarray(d), jnp.asarray(valid), params))
    # Single-component data: the dominant component should match the scale.
    assert min(abs(out[0, 0] - 3.0), abs(out[0, 1] - 3.0)) < 1.0
    assert min(abs(out[1, 0] - 50.0), abs(out[1, 1] - 50.0)) < 10.0


def test_inlier_probability_properties():
    params = jnp.asarray([5.0, 100.0, 0.5], jnp.float32)
    d = jnp.asarray([0.05, 2.0, 5.0, 50.0, 300.0], jnp.float32)
    p = np.asarray(inlier_probability(d, params))
    assert p[0] == 1.0  # d < 0.1 shortcut (stats.h:87)
    assert p[1] > 0.9
    assert p[3] < 0.5
    assert p[4] < 0.05
    assert np.all((p >= 0) & (p <= 1))


def test_histogram_binning():
    d = np.array([[0.2, 0.6, 1.4, 5.0, 5.4]], np.float32)
    valid = np.array([[True, True, True, True, False]])
    h = histogram(d, valid, bin_size=1.0)
    # round(d): 0, 1, 1, 5
    assert h[0, 0] == 1 and h[0, 1] == 2 and h[0, 5] == 1
    assert h.shape[1] == 6
