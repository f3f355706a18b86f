"""Run artifacts, format-compatible with the reference's outputs:
measures.csv (imageGroup.cxx:1475-1491), histograms[_linear].csv
(:850-885), transforms/<i>.json (:1458-1473), bbox.json stats record
(:152-155, 1493-1511), distances.txt (:1321-1351),
transformedLandmarks.json (:1284-1319), pairs.csv.gz (:924-986).
"""
from __future__ import annotations

import gzip
import json
import os

import numpy as np

from ..transforms.io import write_frog_json


def save_measures(reg, path):
    with open(path, "w") as f:
        f.write("Iteration, E, landmarkAv, landmarkMax, landmarkSTD\n")
        for i, m in enumerate(reg.measures):
            f.write(
                f"{i},{m.E:.9g},{m.landmark_av:.9g},{m.landmark_max:.9g},"
                f"{m.landmark_std:.9g}\n"
            )


def save_histograms(hist: np.ndarray, path):
    n = hist.shape[0]
    with open(path, "w") as f:
        f.write(",".join(f"image {i}" for i in range(n)) + "\n")
        for row in hist.T:
            f.write(",".join(str(int(v)) for v in row) + "\n")


def save_transforms(reg, out_dir):
    sub = os.path.join(out_dir, reg.config.transform_subdirectory)
    os.makedirs(sub, exist_ok=True)
    for i in range(reg.config.n_fixed, reg.arrays.n_images):
        chain = reg.chains[i]
        if chain is None:
            continue
        write_frog_json(
            chain,
            os.path.join(sub, f"{i}.json"),
            compact=not reg.config.single_file_transforms,
        )


def save_bbox(reg, path):
    with open(path, "w") as f:
        json.dump(reg.stats_record, f)


def save_landmark_distances(reg, path):
    if not reg.meta.landmarks:
        return
    xyz2 = np.asarray(reg.arrays.xyz2)
    with open(path, "w") as f:
        for name, entries in reg.meta.landmarks.items():
            if not entries:
                continue
            pos = np.stack([xyz2[img, pt] for img, pt in entries])
            center = pos.mean(axis=0)
            for (img, _), p in zip(entries, pos):
                f.write(f"{np.linalg.norm(p - center):.9g},{name},{img}\n")


def save_transformed_landmarks(reg, path):
    if not reg.meta.landmarks:
        return
    xyz2 = np.asarray(reg.arrays.xyz2)
    out = {}
    for name, entries in reg.meta.landmarks.items():
        out[name] = [
            {
                "image": int(img),
                "xyz": [float(v) for v in xyz2[img, pt]],
            }
            for img, pt in entries
        ]
    with open(path, "w") as f:
        json.dump(out, f)


def save_pairs_csv(reg, path):
    """All half-links with distance and owner-image inlier probability,
    sorted by distance (imageGroup.cxx:924-986)."""
    import jax.numpy as jnp

    from .stats import inlier_probability

    dist = np.asarray(reg._link_distances(reg.arrays))
    valid = np.asarray(reg._link_valid_flat())
    prob = np.asarray(
        inlier_probability(jnp.asarray(dist), reg.arrays.em[:, None, :])
    )
    p = reg.arrays.points_per_image
    k = reg.arrays.links_per_point
    # source point of flattened table slot l is row_src[l // K] (virtual
    # rows carry surplus links of high-degree points, state.py docstring)
    row_src = (
        reg.meta.row_src
        if getattr(reg.meta, "row_src", None) is not None
        else np.tile(np.arange(p, dtype=np.int32), (reg.arrays.n_images, 1))
    )
    src = np.repeat(row_src, k, axis=1)
    dst = np.asarray(reg.arrays.link_dst).reshape(reg.arrays.n_images, -1)
    rows = []
    for i in range(reg.arrays.n_images):
        v = valid[i]
        rows.append(
            np.stack(
                [
                    np.full(v.sum(), i, dtype=np.float32),
                    src[i][v].astype(np.float32),
                    (dst[i][v] // p).astype(np.float32),
                    (dst[i][v] % p).astype(np.float32),
                    dist[i][v],
                    prob[i][v],
                ],
                axis=1,
            )
        )
    allrows = np.concatenate(rows, axis=0)
    allrows = allrows[np.argsort(allrows[:, 4], kind="stable")]
    with gzip.open(path, "wt") as f:
        f.write(
            "\n".join(
                ",".join(f"{v:g}" for v in row) for row in allrows
            )
        )


def save_all(reg, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    save_measures(reg, os.path.join(out_dir, reg.config.measures_file))
    if hasattr(reg, "linear_histograms"):
        save_histograms(
            reg.linear_histograms, os.path.join(out_dir, "histograms_linear.csv")
        )
    if hasattr(reg, "final_histograms"):
        save_histograms(reg.final_histograms, os.path.join(out_dir, "histograms.csv"))
    save_transforms(reg, out_dir)
    save_bbox(reg, os.path.join(out_dir, "bbox.json"))
    save_landmark_distances(reg, os.path.join(out_dir, "distances.txt"))
    save_transformed_landmarks(
        reg, os.path.join(out_dir, "transformedLandmarks.json")
    )
    if reg.config.write_pairs:
        save_pairs_csv(reg, os.path.join(out_dir, "pairs.csv.gz"))
    save_error_maps(reg, out_dir)


def save_error_maps(reg, out_dir):
    """Per-image residual-displacement voxel maps — saveErrorMaps
    equivalent (imageGroup.cxx:475-567): on the final level's grid
    geometry, each keypoint's inlier-weighted mean displacement toward its
    linked points is binned into its containing cell; the written 4-channel
    NIfTI holds (mean dx, dy, dz, total weight).
    """
    import jax.numpy as jnp

    from ..io.nifti import write_nifti
    from ..io.volume import Volume
    from . import kernels

    geom = getattr(reg, "_last_level_geometry", None)
    if geom is None:
        return
    dims, origin, spacing = geom
    arrays = reg.arrays
    cfg = reg.config
    n = arrays.n_images

    # per-point weighted displacement sums (same weighting as the
    # deformable update)
    pA, diff, dist, w = kernels.link_pass(arrays)
    w2 = jnp.where(w < cfg.inlier_threshold, 0.0, w * w)
    s_disp = jnp.sum(w2[..., None] * diff, axis=2)  # (N, P, 3)
    s_weight = jnp.sum(w2, axis=2)
    cw = n * cfg.landmarks_constraint_weight
    hw2 = jnp.where(arrays.hard_valid, cw * cw, 0.0)
    hB = arrays.xyz2.reshape(-1, 3)[arrays.hard_dst]
    hdiff = hB - arrays.xyz2[:, :, None, :]
    s_disp = s_disp + jnp.sum(hw2[..., None] * hdiff, axis=2)
    s_weight = s_weight + jnp.sum(hw2, axis=2)
    sums = np.asarray(jnp.concatenate([s_disp, s_weight[..., None]], axis=-1))

    xyz = np.asarray(arrays.xyz)
    valid = np.asarray(arrays.point_valid)
    os.makedirs(os.path.join(out_dir, cfg.error_maps_subdirectory), exist_ok=True)
    for i in range(cfg.n_fixed, n):
        grid = np.zeros((*dims, 4), np.float32)
        sel = valid[i] & (sums[i, :, 3] > 0)
        cells = np.floor((xyz[i][sel] - origin) / spacing).astype(int)
        inb = np.all((cells >= 0) & (cells < np.asarray(dims)), axis=1)
        cells = cells[inb]
        vals = sums[i][sel][inb]
        np.add.at(grid, (cells[:, 0], cells[:, 1], cells[:, 2]), vals)
        weight = grid[..., 3:]
        grid[..., :3] = np.divide(
            grid[..., :3], weight, out=np.zeros_like(grid[..., :3]),
            where=weight > 0,
        )
        write_nifti(
            os.path.join(out_dir, cfg.error_maps_subdirectory, f"{i}.nii.gz"),
            Volume(grid, origin=np.asarray(origin), spacing=np.asarray(spacing)),
        )


def save_individual_histograms(reg, out_dir):
    """Per-image histogram<i>.csv files (imageGroup.cxx:887-897)."""
    hist = reg.final_histograms
    for i in range(hist.shape[0]):
        with open(os.path.join(out_dir, f"histogram{i}.csv"), "w") as f:
            for v in hist[i]:
                f.write(f"{int(v)}\n")
