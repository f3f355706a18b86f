import numpy as np
import jax.numpy as jnp
import pytest

from frog_tpu.io.volume import Volume
from frog_tpu.tools import (
    average_volumes,
    check_diffeomorphism,
    dummy_volume,
    resample_volume,
    transform_mesh,
    transform_points,
)
from frog_tpu.transforms import TransformChain, similarity_from_params
from tests.test_chain import make_chain


def make_vol(seed=0, shape=(20, 18, 16)):
    rng = np.random.default_rng(seed)
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    data = np.sin(g[..., 0] * 0.4) + np.cos(g[..., 1] * 0.3) + g[..., 2] * 0.1
    return Volume(data.astype(np.float32), origin=np.zeros(3), spacing=np.ones(3))


def test_resample_identity():
    vol = make_vol()
    out = resample_volume(vol, vol, chain=None)
    np.testing.assert_allclose(out.data, vol.data, atol=1e-5)


def test_resample_translation_roundtrip():
    """Translating a volume by t then resampling through the transform with
    inverse semantics must recover the original (interior)."""
    vol = make_vol()
    t = np.array([2.0, -1.0, 3.0], np.float32)
    chain = TransformChain(
        transforms=(
            similarity_from_params(jnp.asarray(t), jnp.asarray([1.0, 1.0, 1.0])),
        )
    )
    # volume expressed in source space; transform maps source -> common.
    # reference grid = shifted grid (common space)
    ref = Volume(vol.data, origin=vol.origin + t, spacing=vol.spacing)
    out = resample_volume(vol, ref, chain=chain, inverse=True)
    np.testing.assert_allclose(out.data, vol.data, atol=1e-3)


def test_resample_forward_inverse_consistency():
    vol = make_vol()
    chain = make_chain(coeff_scale=0.5)
    out_t = resample_volume(vol, vol, chain=chain, inverse=True)
    # applying with -ti on the already-true-inverse is not available in
    # closed form; just check output is finite and background fill happens
    assert np.isfinite(out_t.data).all()
    assert out_t.data.min() >= vol.data.min() - 1e-4


def test_resample_nearest_background():
    vol = make_vol()
    chain = TransformChain(
        transforms=(
            similarity_from_params(
                jnp.asarray([100.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0])
            ),
        )
    )
    out = resample_volume(
        vol, vol, chain=chain, inverse=True, interpolation="nearest", background=-5.0
    )
    # everything maps outside -> all background
    np.testing.assert_allclose(out.data, -5.0)


def test_average_volumes():
    v1 = make_vol(1)
    v2 = Volume(v1.data + 2.0, v1.origin, v1.spacing)
    mean, std = average_volumes([v1, v2])
    np.testing.assert_allclose(mean.data, v1.data + 1.0, atol=1e-5)
    np.testing.assert_allclose(std.data, 1.0, atol=1e-5)


def test_dummy_volume(tmp_path):
    import json

    f = str(tmp_path / "bbox.json")
    with open(f, "w") as fh:
        json.dump({"bbox": [[0, 0, 0], [10, 20, 5]]}, fh)
    vol = dummy_volume(f, 2.0)
    assert vol.shape == (5, 10, 3)
    np.testing.assert_allclose(vol.origin, [0, 0, 0])


def test_check_diffeomorphism_positive_and_negative():
    good = make_chain(coeff_scale=1.0)
    grid = (np.zeros(3), np.full(3, 10.0), np.array([6, 6, 6]))
    n_neg, total = check_diffeomorphism(good, grid)
    assert n_neg == 0 and total == 216

    # a folding transform: negative scale on x
    bad = TransformChain(
        transforms=(
            similarity_from_params(jnp.zeros(3), jnp.asarray([-1.0, 1.0, 1.0])),
        )
    )
    n_neg, total = check_diffeomorphism(bad, grid)
    assert n_neg == total


def test_transform_points_inverse():
    chain = make_chain(coeff_scale=1.0)
    pts = np.random.default_rng(3).uniform(0, 50, (10, 3)).astype(np.float32)
    fwd = transform_points(chain, pts)
    back = transform_points(chain, fwd, inverse=True)
    np.testing.assert_allclose(back, pts, atol=1e-2)


def test_mesh_roundtrip_formats(tmp_path):
    from frog_tpu.io.polydata import PolyData, read_polydata, write_polydata

    pts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = [[0, 1, 2], [0, 1, 3], [1, 2, 3]]
    mesh = PolyData(points=pts, faces=faces)
    for ext in ("ply", "obj", "vtk"):
        f = str(tmp_path / f"m.{ext}")
        write_polydata(f, mesh)
        back = read_polydata(f)
        np.testing.assert_allclose(back.points, pts, atol=1e-5)
        assert [list(map(int, fc)) for fc in back.faces] == faces
    # STL loses shared vertices by design; check triangle soup geometry
    f = str(tmp_path / "m.stl")
    write_polydata(f, mesh)
    back = read_polydata(f)
    assert len(back.faces) == 3
    assert back.points.shape == (9, 3)
    # vtp writer emits parseable XML
    f = str(tmp_path / "m.vtp")
    write_polydata(f, mesh)
    import xml.etree.ElementTree as ET

    ET.parse(f)


def test_transform_mesh():
    from frog_tpu.io.polydata import PolyData

    chain = TransformChain(
        transforms=(
            similarity_from_params(jnp.asarray([1.0, 2.0, 3.0]), jnp.ones(3)),
        )
    )
    mesh = PolyData(points=np.zeros((2, 3), np.float32), faces=[[0, 1]])
    out = transform_mesh(chain, mesh)
    np.testing.assert_allclose(out.points, [[1, 2, 3], [1, 2, 3]], atol=1e-6)
