import numpy as np

from frog_tpu.io import Volume, read_mhd, read_nifti, read_volume, write_mhd, write_nifti


def make_vol(seed=0, ncomp=1, dtype=np.float32):
    rng = np.random.default_rng(seed)
    shape = (7, 6, 5) if ncomp == 1 else (7, 6, 5, ncomp)
    data = rng.normal(size=shape)
    if np.issubdtype(dtype, np.integer):
        data = (data * 100).astype(dtype)
    else:
        data = data.astype(dtype)
    return Volume(data=data, origin=np.array([1.0, -2.0, 3.5]), spacing=np.array([0.5, 1.0, 2.0]))


def assert_vols_equal(a, b):
    np.testing.assert_allclose(a.data, b.data, rtol=1e-6)
    np.testing.assert_allclose(a.origin, b.origin, atol=1e-5)
    np.testing.assert_allclose(a.spacing, b.spacing, atol=1e-5)


def test_nifti_roundtrip(tmp_path):
    for suffix in (".nii", ".nii.gz"):
        vol = make_vol()
        f = str(tmp_path / f"v{suffix}")
        write_nifti(f, vol)
        assert_vols_equal(vol, read_nifti(f))


def test_nifti_multicomponent(tmp_path):
    vol = make_vol(ncomp=3)
    f = str(tmp_path / "v.nii.gz")
    write_nifti(f, vol)
    back = read_nifti(f, reorient_to_ras=False)
    assert back.data.shape == vol.data.shape
    assert_vols_equal(vol, back)


def test_nifti_int16(tmp_path):
    vol = make_vol(dtype=np.int16)
    f = str(tmp_path / "v.nii")
    write_nifti(f, vol)
    back = read_nifti(f)
    assert back.data.dtype == np.int16
    assert_vols_equal(vol, back)


def test_mhd_roundtrip(tmp_path):
    for name, compressed in (("v.mhd", True), ("v.mhd", False), ("v.mha", None)):
        vol = make_vol()
        f = str(tmp_path / name)
        write_mhd(f, vol, compressed=compressed)
        assert_vols_equal(vol, read_mhd(f))


def test_read_volume_dispatch(tmp_path):
    vol = make_vol()
    f1 = str(tmp_path / "v.nii.gz")
    write_nifti(f1, vol)
    assert_vols_equal(vol, read_volume(f1))
    f2 = str(tmp_path / "v.mhd")
    write_mhd(f2, vol)
    assert_vols_equal(vol, read_volume(f2))


def test_ras_reorientation(tmp_path):
    """A LPS-stored volume must come back flipped into RAS."""
    import struct

    vol = make_vol()
    f = str(tmp_path / "v.nii")
    write_nifti(f, vol)
    # Flip x axis sign in the sform to simulate an L-first volume.
    with open(f, "rb") as fh:
        raw = bytearray(fh.read())
    sp = vol.spacing
    origin = vol.origin.copy()
    nx = vol.data.shape[0]
    # srow_x: [-sx, 0, 0, origin_x + sx*(nx-1)]
    struct.pack_into("<4f", raw, 280, -sp[0], 0.0, 0.0, origin[0] + sp[0] * (nx - 1))
    with open(f, "wb") as fh:
        fh.write(raw)
    back = read_nifti(f, reorient_to_ras=True)
    np.testing.assert_allclose(back.data, vol.data[::-1], rtol=1e-6)
    np.testing.assert_allclose(back.origin, vol.origin, atol=1e-4)


def test_nifti_gz_native_codec_cross_compatible(tmp_path):
    """The native libdeflate volume codec (io/native.py read_file_bytes /
    write_file_bytes) produces standard gzip streams: a file written
    through write_nifti is readable by the pure-python gzip module, and
    a gzip-module-written file reads back through read_nifti — so
    artifacts interoperate with the reference tooling regardless of
    which side wrote them."""
    import gzip
    import struct

    import numpy as np

    from frog_tpu.io.nifti import read_nifti, write_nifti
    from frog_tpu.io.volume import Volume

    rng = np.random.default_rng(5)
    data = rng.normal(size=(24, 20, 16)).astype(np.float32)
    vol = Volume(data, origin=(1.0, -2.0, 3.0), spacing=(1.5, 1.5, 2.0))

    # native (or fallback) write -> gzip-module read
    p1 = str(tmp_path / "a.nii.gz")
    write_nifti(p1, vol)
    raw = gzip.open(p1, "rb").read()
    assert struct.unpack_from("<i", raw, 0)[0] == 348  # NIfTI-1 header

    # gzip-module write -> (native) read
    p2 = str(tmp_path / "b.nii.gz")
    with gzip.open(p2, "wb") as f:
        f.write(raw)
    back = read_nifti(p2)
    np.testing.assert_array_equal(np.asarray(back.data), data)
    np.testing.assert_allclose(back.spacing, vol.spacing)

    # and the full native round trip is bit-exact
    rt = read_nifti(p1)
    np.testing.assert_array_equal(np.asarray(rt.data), data)
