import numpy as np
import jax.numpy as jnp

from frog_tpu.transforms import (
    read_frog_json,
    read_tfm,
    read_transform,
    write_frog_json,
    write_tfm,
)
from tests.test_chain import make_chain


def assert_chains_equal(a, b, atol=1e-5):
    pts = jnp.asarray(np.random.default_rng(9).uniform(-10, 60, (30, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(a(pts)), np.asarray(b(pts)), atol=atol)


def test_json_inline_roundtrip(tmp_path):
    chain = make_chain()
    f = str(tmp_path / "t.json")
    write_frog_json(chain, f, compact=False)
    back = read_frog_json(f)
    assert len(back) == len(chain)
    assert_chains_equal(chain, back)


def test_json_compact_roundtrip(tmp_path):
    chain = make_chain()
    f = str(tmp_path / "t.json")
    write_frog_json(chain, f, compact=True)
    assert (tmp_path / "t.json.0.nii.gz").exists()
    back = read_transform(f)
    assert_chains_equal(chain, back)


def test_tfm_roundtrip(tmp_path):
    chain = make_chain()
    f = str(tmp_path / "t.tfm")
    write_tfm(chain, f)
    back = read_tfm(f)
    assert_chains_equal(chain, back, atol=1e-4)


def test_json_vtk_flat_order(tmp_path):
    """Coefficient flattening must be x-fastest with components innermost
    (VTK memory order, transformIO.h:233-241)."""
    import json

    chain = make_chain()
    f = str(tmp_path / "t.json")
    write_frog_json(chain, f, compact=False)
    with open(f) as fh:
        root = json.load(fh)
    entry = root["transforms"][1]
    dims = entry["dimensions"]
    coeffs = np.asarray(chain.transforms[1].coeffs)
    flat = np.asarray(entry["coeffs"])
    # element (ix, iy, iz, c) lives at c + 3*(ix + dims[0]*(iy + dims[1]*iz))
    ix, iy, iz, c = 2, 1, 3, 1
    idx = c + 3 * (ix + dims[0] * (iy + dims[1] * iz))
    np.testing.assert_allclose(flat[idx], coeffs[ix, iy, iz, c], rtol=1e-6)


def test_legacy_rigid_json(tmp_path):
    import json

    f = str(tmp_path / "r.json")
    with open(f, "w") as fh:
        json.dump({"scale": 2.0, "translation": [1.0, 2.0, 3.0]}, fh)
    chain = read_transform(f)
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(chain(p)), [[3.0, 4.0, 5.0]], atol=1e-6)
