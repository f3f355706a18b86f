import numpy as np
import jax.numpy as jnp
import pytest

from frog_tpu.transforms import (
    BSpline,
    bspline_displacement,
    bspline_weights,
    grid_from_bbox,
    zero_bspline,
)


def bspline_basis_ref(f):
    """Textbook uniform cubic B-spline basis at fractional offset f."""
    return np.array(
        [
            (1 - f) ** 3 / 6,
            (3 * f**3 - 6 * f**2 + 4) / 6,
            (-3 * f**3 + 3 * f**2 + 3 * f + 1) / 6,
            f**3 / 6,
        ]
    )


def dense_displacement_ref(coeffs, origin, spacing, p):
    """Straightforward numpy evaluation, zero border mode."""
    dims = coeffs.shape[:3]
    u = (np.asarray(p) - origin) / spacing
    base = np.floor(u).astype(int) - 1
    frac = u - np.floor(u)
    w = [bspline_basis_ref(frac[k]) for k in range(3)]
    out = np.zeros(3)
    for a in range(4):
        for b in range(4):
            for c in range(4):
                i, j, k = base[0] + a, base[1] + b, base[2] + c
                if 0 <= i < dims[0] and 0 <= j < dims[1] and 0 <= k < dims[2]:
                    out += w[0][a] * w[1][b] * w[2][c] * coeffs[i, j, k]
    return out


def test_weights_match_closed_form():
    f = np.linspace(0, 0.999, 23)
    ours = np.asarray(bspline_weights(jnp.asarray(f, dtype=jnp.float64)))
    ref = np.stack([bspline_basis_ref(x) for x in f])
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # Partition of unity.
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-6)


def test_displacement_matches_dense_reference():
    rng = np.random.default_rng(0)
    dims = (6, 5, 7)
    coeffs = rng.normal(size=(*dims, 3)).astype(np.float32)
    origin = np.array([-10.0, 3.0, -4.0])
    spacing = np.array([5.0, 4.0, 3.0])
    pts = rng.uniform(-5, 15, size=(40, 3)).astype(np.float32)

    got = np.asarray(
        bspline_displacement(
            jnp.asarray(coeffs), jnp.asarray(origin, jnp.float32),
            jnp.asarray(spacing, jnp.float32), jnp.asarray(pts)
        )
    )
    want = np.stack([dense_displacement_ref(coeffs, origin, spacing, p) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_border_outside_grid():
    dims = (5, 5, 5)
    b = BSpline(
        coeffs=jnp.ones((*dims, 3)),
        origin=jnp.zeros(3),
        spacing=jnp.ones(3),
    )
    far = jnp.array([[100.0, 100.0, 100.0], [-50.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(b.displacement(far)), 0.0, atol=1e-7)


def test_identity_for_zero_coeffs():
    b = zero_bspline((4, 4, 4), np.zeros(3), np.ones(3))
    pts = jnp.asarray(np.random.default_rng(1).uniform(0, 3, (10, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(b(pts)), np.asarray(pts), atol=1e-7)


def test_grid_from_bbox_matches_reference_sizing():
    # Mirror imageGroup.cxx:161-179: margin 0.1 each side, dims = round + 3,
    # origin = lo - spacing.
    dims, origin, spacing = grid_from_bbox([0, 0, 0], [100, 200, 50], 100.0, margin=0.1)
    # Scaled lengths: 120, 240, 60 -> cells 1, 2, 1 -> dims 4, 5, 4
    assert dims == (4, 5, 4)
    np.testing.assert_allclose(spacing, [120.0, 120.0, 60.0])
    np.testing.assert_allclose(origin, [-10 - 120, -20 - 120, -5 - 60])


def test_constant_field_interior():
    # With all coefficients equal to v, the interior displacement is exactly v
    # (partition of unity) as long as the 4x4x4 support is inside the grid.
    dims, origin, spacing = grid_from_bbox([0, 0, 0], [60, 60, 60], 20.0)
    v = np.array([1.5, -2.0, 0.25], np.float32)
    b = BSpline(
        coeffs=jnp.broadcast_to(jnp.asarray(v), (*dims, 3)),
        origin=jnp.asarray(origin, jnp.float32),
        spacing=jnp.asarray(spacing, jnp.float32),
    )
    pts = jnp.asarray([[10.0, 30.0, 50.0], [0.0, 0.0, 0.0], [60.0, 60.0, 60.0]])
    disp = np.asarray(b.displacement(pts))
    np.testing.assert_allclose(disp, np.broadcast_to(v, disp.shape), rtol=1e-5)
