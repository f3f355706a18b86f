import numpy as np
import jax.numpy as jnp

from frog_tpu.transforms import (
    Affine,
    BSpline,
    TransformChain,
    grid_from_bbox,
    identity_affine,
    similarity_from_params,
)


def make_chain(seed=0, coeff_scale=2.0):
    rng = np.random.default_rng(seed)
    affine = similarity_from_params(
        jnp.asarray([3.0, -2.0, 5.0]), jnp.asarray([1.1, 0.9, 1.05])
    )
    dims, origin, spacing = grid_from_bbox([-20, -20, -20], [80, 80, 80], 25.0)
    coeffs = rng.normal(scale=coeff_scale, size=(*dims, 3)).astype(np.float32)
    grid = BSpline(
        coeffs=jnp.asarray(coeffs),
        origin=jnp.asarray(origin, jnp.float32),
        spacing=jnp.asarray(spacing, jnp.float32),
    )
    return TransformChain(transforms=(affine, grid))


def test_application_order():
    # transforms[0] applies first (post-multiplied chain semantics,
    # imageGroup.cxx:835-837).
    a = similarity_from_params(jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([2.0, 2.0, 2.0]))
    b = similarity_from_params(jnp.asarray([0.0, 10.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]))
    chain = TransformChain(transforms=(a, b))
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    # a: 2*p + (1,0,0) = (3,2,2); b: +(0,10,0) = (3,12,2)
    np.testing.assert_allclose(np.asarray(chain(p)), [[3.0, 12.0, 2.0]], atol=1e-6)


def test_jacobian_matches_finite_differences():
    chain = make_chain()
    pts = jnp.asarray(np.random.default_rng(3).uniform(0, 50, (5, 3)), jnp.float32)
    jac = np.asarray(chain.jacobian(pts))
    eps = 1e-2
    for ax in range(3):
        d = np.zeros(3, np.float32)
        d[ax] = eps
        fd = (np.asarray(chain(pts + d)) - np.asarray(chain(pts - d))) / (2 * eps)
        np.testing.assert_allclose(jac[:, :, ax], fd, rtol=2e-2, atol=2e-2)


def test_inverse_roundtrip():
    chain = make_chain(coeff_scale=1.5)
    pts = jnp.asarray(np.random.default_rng(4).uniform(0, 50, (20, 3)), jnp.float32)
    fwd = chain(pts)
    back = chain.inverse(fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_identity_chain():
    chain = TransformChain(transforms=(identity_affine(),))
    pts = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(chain(pts)), np.asarray(pts))
