import json

import numpy as np

from frog_tpu.io.volume import Volume
from frog_tpu.tools.qa import (
    checkerboard_volume,
    grid_volume,
    label_contour,
    register_two_volumes,
    trim_transform,
)


def ref_vol():
    return Volume(
        np.zeros((40, 60, 50), np.float32),
        origin=np.zeros(3),
        spacing=np.ones(3),
    )


def test_checkerboard():
    board = checkerboard_volume(ref_vol(), cell_mm=30.0)
    vals = np.unique(board.data)
    assert set(vals.tolist()) <= {50, 100}
    # both tones present, x axis single slab (no variation along x)
    assert len(vals) == 2
    assert (board.data[0] == board.data[-1]).all()


def test_grid_volume():
    g = grid_volume(ref_vol(), line_mm=30.0, spacing=1.0)
    assert g.data.max() > 0.9
    # gridline exists at x=30
    assert g.data[30].max() > 0.9
    # mostly dark between lines
    assert np.median(g.data) < 0.1


def test_label_contour():
    vol = ref_vol()
    vol.data[10:20, 10:20, 10:20] = 3
    out = label_contour(vol)
    assert out.data[10, 15, 15] == 3  # boundary voxel keeps label
    assert out.data[15, 15, 15] == 0  # interior removed
    assert out.data[5, 5, 5] == 0


def test_trim_transform(tmp_path):
    f = str(tmp_path / "t.json")
    with open(f, "w") as fh:
        json.dump(
            {"transforms": [{"type": "a"}, {"type": "b"}, {"type": "c"}]}, fh
        )
    out = str(tmp_path / "out.json")
    trim_transform(f, 2, out)
    data = json.loads(open(out).read())
    assert len(data["transforms"]) == 2


def test_register_two_volumes(tmp_path):
    from frog_tpu.io.mhd import write_volume
    from frog_tpu.ops.matcher import MatchParams
    from frog_tpu.ops.surf3d import SurfParams
    from frog_tpu.registration import GroupConfig

    rng = np.random.default_rng(0)
    shape = (48, 48, 48)
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    data = np.zeros(shape, np.float32)
    for c, s, a in zip(
        rng.uniform(10, 38, (20, 3)), rng.uniform(1.5, 3, 20), rng.uniform(40, 100, 20)
    ):
        data += np.float32(a) * np.exp(-np.sum((g - c) ** 2, -1) / (2 * s * s)).astype(
            np.float32
        )
    v1 = str(tmp_path / "v1.nii.gz")
    v2 = str(tmp_path / "v2.nii.gz")
    shift = np.array([3.0, -2.0, 1.0])
    write_volume(v1, Volume(data, origin=np.zeros(3), spacing=np.ones(3)))
    write_volume(v2, Volume(data, origin=shift, spacing=np.ones(3)))

    out = register_two_volumes(
        v1,
        v2,
        out_dir=str(tmp_path),
        surf=SurfParams(spacing=1.0, n_points=150, n_octaves=2),
        match_params=MatchParams(max_distance=1e10, second_ratio=0.9),
        config=GroupConfig(
            linear_iterations=15, deformable_levels=0, use_scale=False,
            verbose=False,
        ),
        verbose=False,
    )
    # v1 resampled into v2's frame must match v2's data (same content)
    interior = tuple(slice(6, -6) for _ in range(3))
    err = np.abs(out.data[interior] - data[interior])
    assert np.median(err) < 2.0, np.median(err)
