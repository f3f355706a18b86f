import numpy as np

from frog_tpu.io.pairs import ImagePoints, PairGraph, read_pairs, write_pairs


def make_graph(seed=0, n=3, p=50):
    rng = np.random.default_rng(seed)
    images = []
    for i in range(n):
        images.append(
            ImagePoints(
                name=f"points{i}.csv.gz",
                ref_translation=rng.normal(size=3),
                xyz=rng.uniform(0, 100, (p, 3)).astype(np.float32),
                other=rng.uniform(0, 2, (p, 3)).astype(np.float32),
            )
        )
    matches = {}
    for i in range(n):
        for j in range(i + 1, n):
            m = rng.integers(0, p, size=(rng.integers(5, 20), 2))
            matches[(i, j)] = m.astype(np.int64)
    return PairGraph(images=images, matches=matches)


def test_pairs_roundtrip(tmp_path):
    g = make_graph()
    f = str(tmp_path / "pairs.bin")
    write_pairs(f, g)
    back = read_pairs(f)
    assert back.n_images == g.n_images
    assert back.n_matches == g.n_matches
    for a, b in zip(g.images, back.images):
        assert a.name == b.name
        np.testing.assert_allclose(a.ref_translation, b.ref_translation)
        np.testing.assert_allclose(a.xyz, b.xyz)
        np.testing.assert_allclose(a.other, b.other)
    for key in g.matches:
        np.testing.assert_array_equal(g.matches[key], back.matches[key])


def test_pairs_uint16_ids(tmp_path):
    g = make_graph()
    f = str(tmp_path / "pairs16.bin")
    write_pairs(f, g, point_id_dtype=np.uint16)
    back = read_pairs(f, point_id_dtype=np.uint16)
    assert back.n_matches == g.n_matches


def test_pairs_reference_layout(tmp_path):
    """Byte-level check of the header layout (match.cpp:675-744)."""
    import struct

    g = make_graph(n=2, p=3)
    f = str(tmp_path / "pairs.bin")
    write_pairs(f, g)
    raw = open(f, "rb").read()
    (n,) = struct.unpack_from("<H", raw, 0)
    assert n == 2
    (name_len,) = struct.unpack_from("<H", raw, 2)
    assert raw[4 : 4 + name_len].decode() == "points0.csv.gz"
    off = 4 + name_len
    ref = np.frombuffer(raw, "<f8", 3, off)
    np.testing.assert_allclose(ref, g.images[0].ref_translation)
    off += 24
    (npts,) = np.frombuffer(raw, np.uint32, 1, off)
    assert npts == 3
    off += 4
    row = np.frombuffer(raw, "<f4", 6, off)
    np.testing.assert_allclose(row[:3], g.images[0].xyz[0])
    np.testing.assert_allclose(row[3:], g.images[0].other[0])


def test_keypoints_roundtrip(tmp_path):
    from frog_tpu.io.keypoints import Keypoints, read_keypoints, write_keypoints

    rng = np.random.default_rng(2)
    mat = rng.normal(size=(20, 54)).astype(np.float32)
    kp = Keypoints.from_matrix(mat)
    for name in ("k.csv", "k.csv.gz", "k.bin", "k.json"):
        f = str(tmp_path / name)
        write_keypoints(f, kp)
        back = read_keypoints(f)
        assert len(back) == 20 and back.ndesc == 48
        np.testing.assert_allclose(back.to_matrix(), mat, rtol=1e-5)


def test_keypoints_csv_bitwise_roundtrip(tmp_path):
    """The native CSV codec (fast 9-digit formatter + fast parser,
    native/frogio.cpp) must reproduce every float BITWISE through a
    write -> read cycle, across magnitude extremes, subnormals, exact
    decimals and random values — and so must the pure-Python fallback."""
    from frog_tpu.io.keypoints import Keypoints, read_keypoints, write_keypoints

    rng = np.random.default_rng(7)
    special = np.array(
        [0.0, -0.0, 1.0, -1.0, 0.1, 1e-38, 1.1754944e-38, 1e-44, 1e-42,
         3.4028235e38, -3.4e38, 1e8, 999999999.0, 1.0000001, 0.5, 2.5,
         1e-5, 1e-4, 0.0001234, 123456789.0],
        np.float32,
    )
    vals = np.concatenate([
        special,
        rng.normal(size=2000).astype(np.float32),
        (rng.normal(size=2000) * 10.0 ** rng.integers(-38, 38, 2000))
        .astype(np.float32),
    ])
    vals = vals[np.isfinite(vals)]
    n = vals.size // 54 * 54
    mat = vals[:n].reshape(-1, 54).copy()
    # responses must be finite for from_matrix/top_by_response semantics
    kp = Keypoints.from_matrix(mat)
    for name in ("rt.csv", "rt.csv.gz"):
        f = str(tmp_path / name)
        write_keypoints(f, kp)
        back = read_keypoints(f)
        assert np.array_equal(back.to_matrix(), mat), name


def test_keypoints_top_by_response():
    from frog_tpu.io.keypoints import Keypoints

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(100, 54)).astype(np.float32)
    kp = Keypoints.from_matrix(mat)
    top = kp.top_by_response(10)
    assert len(top) == 10
    assert top.response.min() >= np.sort(kp.response)[-10]


def test_merge_pairs(tmp_path):
    """mergePairs (js/lib/FROG.js:162-171): union of two graphs over the
    same volumes, second graph's indices offset past the first's points."""
    from frog_tpu.io.pairs import merge_pairs

    a = make_graph(seed=1)
    b = make_graph(seed=2)
    m = merge_pairs(a, b)
    assert m.n_images == a.n_images
    for i in range(m.n_images):
        assert m.images[i].xyz.shape[0] == (
            a.images[i].xyz.shape[0] + b.images[i].xyz.shape[0]
        )
        np.testing.assert_array_equal(
            m.images[i].xyz[: a.images[i].xyz.shape[0]], a.images[i].xyz
        )
    assert m.n_matches == a.n_matches + b.n_matches
    # a's matches index into a's block, b's into the offset block
    for (i, j), mm in b.matches.items():
        merged = m.matches[(i, j)]
        tail = merged[-mm.shape[0]:]
        np.testing.assert_array_equal(
            tail,
            mm + np.asarray([[a.images[i].xyz.shape[0],
                              a.images[j].xyz.shape[0]]]),
        )
    # merged matched positions are the same physical points
    for (i, j), mm in m.matches.items():
        pa = m.images[i].xyz[mm[:, 0]]
        assert np.isfinite(pa).all()
    # survives the binary round trip
    from frog_tpu.io.pairs import read_pairs, write_pairs
    f = str(tmp_path / "merged.bin")
    write_pairs(f, m)
    g = read_pairs(f)
    assert g.n_matches == m.n_matches


def test_cli_merge(tmp_path):
    from frog_tpu.cli import main
    from frog_tpu.io.pairs import read_pairs, write_pairs

    a, b = make_graph(seed=3), make_graph(seed=4)
    fa, fb = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    out = str(tmp_path / "m.bin")
    write_pairs(fa, a)
    write_pairs(fb, b)
    assert main(["merge", out, fa, fb]) == 0
    assert read_pairs(out).n_matches == a.n_matches + b.n_matches
