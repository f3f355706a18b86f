import numpy as np
import jax.numpy as jnp
import pytest

from frog_tpu.io.volume import Volume
from frog_tpu.ops.surf3d import SurfParams, extract_keypoints
from frog_tpu.ops.surf3d.descriptor import integral_volume, _box_sum
from frog_tpu.ops.surf3d.detector import hessian_response, scale_stack_sizes
from frog_tpu.ops.surf3d.resample import resample_isotropic


def blob_volume(shape=(48, 48, 48), centers=((24, 24, 24),), sigma=3.0, spacing=1.0):
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    data = np.zeros(shape, np.float32)
    for c in centers:
        r2 = np.sum((g - np.asarray(c)) ** 2, axis=-1)
        data += np.exp(-r2 / (2 * sigma**2)).astype(np.float32)
    return Volume(data * 100.0, origin=np.zeros(3), spacing=np.full(3, spacing))


def test_integral_volume_box_sums():
    rng = np.random.default_rng(0)
    data = rng.uniform(size=(10, 11, 12)).astype(np.float32)
    integral = integral_volume(jnp.asarray(data))
    lo = jnp.asarray([[2, 3, 4]], jnp.int32)
    hi = jnp.asarray([[7, 9, 10]], jnp.int32)
    got = float(_box_sum(integral, lo, hi)[0])
    want = float(data[2:7, 3:9, 4:10].sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detector_finds_blob_center():
    vol = blob_volume(centers=((24, 24, 24),), sigma=3.0)
    kp = extract_keypoints(vol, SurfParams(spacing=1.0, n_points=5, n_octaves=2))
    assert len(kp) >= 1
    best = kp.xyz[np.argmax(kp.response)]
    assert np.linalg.norm(best - np.array([24, 24, 24])) < 2.5, best


def test_detector_scale_selection():
    """A bigger blob should fire at a larger detected scale."""
    small = blob_volume(centers=((24, 24, 24),), sigma=2.0)
    big = blob_volume(shape=(64, 64, 64), centers=((32, 32, 32),), sigma=6.0)
    kp_s = extract_keypoints(small, SurfParams(spacing=1.0, n_points=3, n_octaves=3))
    kp_b = extract_keypoints(big, SurfParams(spacing=1.0, n_points=3, n_octaves=3))
    assert kp_b.scale[np.argmax(kp_b.response)] > kp_s.scale[np.argmax(kp_s.response)]


def test_laplacian_sign_distinguishes_polarity():
    bright = blob_volume(centers=((24, 24, 24),))
    dark = Volume(100.0 - bright.data, bright.origin, bright.spacing)
    kb = extract_keypoints(bright, SurfParams(spacing=1.0, n_points=1, n_octaves=2))
    kd = extract_keypoints(dark, SurfParams(spacing=1.0, n_points=1, n_octaves=2))
    assert kb.laplacian[0] != kd.laplacian[0]


def test_descriptors_match_across_translation():
    """The same blob pattern shifted by whole voxels must give nearly
    identical descriptors, and different patterns different ones."""
    v1 = blob_volume(
        shape=(56, 56, 56), centers=((20, 20, 20), (32, 24, 28)), sigma=2.5
    )
    v2 = blob_volume(
        shape=(56, 56, 56), centers=((26, 24, 22), (38, 28, 30)), sigma=2.5
    )
    p = SurfParams(spacing=1.0, n_points=6, n_octaves=2)
    k1 = extract_keypoints(v1, p)
    k2 = extract_keypoints(v2, p)
    # strongest keypoint of v2 is the translated twin of v1's
    a = k1.desc[np.argmax(k1.response)]
    b = k2.desc[np.argmax(k2.response)]
    assert np.linalg.norm(a - b) < 0.35, np.linalg.norm(a - b)
    rng = np.random.default_rng(0)
    rand = rng.normal(size=48)
    rand /= np.linalg.norm(rand)
    assert np.linalg.norm(a - rand) > 0.8


def test_mask_restricts_keypoints():
    vol = blob_volume(
        shape=(48, 48, 48), centers=((12, 24, 24), (36, 24, 24)), sigma=2.5
    )
    mask = Volume(
        (np.arange(48)[:, None, None] < 24).astype(np.float32)
        * np.ones((48, 48, 48), np.float32),
        vol.origin,
        vol.spacing,
    )
    kp = extract_keypoints(vol, SurfParams(spacing=1.0, n_points=10, n_octaves=2), mask=mask)
    assert len(kp) >= 1
    assert (kp.xyz[:, 0] < 24).all()


def test_resample_isotropic():
    rng = np.random.default_rng(1)
    vol = Volume(
        rng.uniform(size=(20, 30, 15)).astype(np.float32),
        origin=np.array([1.0, 2.0, 3.0]),
        spacing=np.array([2.0, 1.0, 3.0]),
    )
    iso = resample_isotropic(vol, 1.5)
    np.testing.assert_allclose(iso.spacing, 1.5)
    lo, hi = iso.bounds
    lo0, hi0 = vol.bounds
    assert (lo >= lo0 - 1e-5).all() and (hi <= hi0 + 1e-5).all()
    # identity resample returns the same data
    same = resample_isotropic(
        Volume(vol.data, np.zeros(3), np.ones(3)), 1.0
    )
    np.testing.assert_allclose(same.data, vol.data, atol=1e-5)


def test_scale_stack_sizes():
    assert scale_stack_sizes(1) == [3, 5, 7, 9]
    assert scale_stack_sizes(2) == [3, 5, 7, 9, 13, 17]
    assert scale_stack_sizes(3) == [3, 5, 7, 9, 13, 17, 25, 33]


def test_extraction_with_physical_spacing():
    """Keypoint coordinates must be in physical units."""
    vol = blob_volume(centers=((24, 24, 24),), sigma=3.0, spacing=2.0)
    kp = extract_keypoints(vol, SurfParams(spacing=2.0, n_points=3, n_octaves=2))
    best = kp.xyz[np.argmax(kp.response)]
    assert np.linalg.norm(best - np.array([48.0, 48.0, 48.0])) < 5.0
