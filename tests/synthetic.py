"""Synthetic groupwise registration fixtures.

Generates N images observing a common point cloud through known
ground-truth transforms, with noisy correspondences and planted outliers —
the controlled setting for verifying the optimizer recovers the group
geometry (the reference has no unit tests; this is the planted-truth
equivalent of its landmark-based empirical validation, SURVEY.md §4).
"""
import numpy as np

from frog_tpu.io.pairs import ImagePoints, PairGraph


def make_synthetic_group(
    seed=0,
    n_images=4,
    n_points=200,
    extent=100.0,
    translation_scale=15.0,
    scale_jitter=0.1,
    warp_amp=0.0,
    noise=0.5,
    outlier_fraction=0.1,
    match_fraction=0.8,
):
    """Returns (PairGraph, truth) where truth holds the common cloud and
    per-image ground-truth maps image->common.

    Image i's keypoints are the common cloud pushed through the inverse of
    a per-image similarity (+ optional smooth sinusoidal warp); matches are
    identity correspondences (subsampled), with a fraction replaced by
    random outliers.
    """
    rng = np.random.default_rng(seed)
    cloud = rng.uniform(0, extent, size=(n_points, 3)).astype(np.float32)

    images = []
    truths = []
    for i in range(n_images):
        t = rng.uniform(-translation_scale, translation_scale, 3)
        s = 1.0 + rng.uniform(-scale_jitter, scale_jitter, 3)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = warp_amp * rng.uniform(0.5, 1.0, 3)

        def fwd(p, t=t, s=s, phase=phase, amp=amp):
            # image -> common: warp then similarity
            q = p + amp * np.sin(2 * np.pi * p[:, [1, 2, 0]] / extent + phase)
            return q * s + t

        def inv(p, t=t, s=s, phase=phase, amp=amp):
            # fixed-point inverse of fwd (warp is small and smooth)
            q0 = (p - t) / s
            q = q0.copy()
            for _ in range(10):
                q = q0 - amp * np.sin(2 * np.pi * q[:, [1, 2, 0]] / extent + phase)
            return q

        pts = inv(cloud).astype(np.float32)
        images.append(
            ImagePoints(
                name=f"synthetic{i}",
                ref_translation=np.zeros(3),
                xyz=pts + rng.normal(scale=noise, size=pts.shape).astype(np.float32),
                other=np.stack(
                    [
                        np.full(n_points, 2.0, np.float32),
                        np.ones(n_points, np.float32),
                        rng.uniform(0, 1, n_points).astype(np.float32),
                    ],
                    axis=1,
                ),
            )
        )
        truths.append({"fwd": fwd, "inv": inv, "t": t, "s": s})

    matches = {}
    for i in range(n_images):
        for j in range(i + 1, n_images):
            k = int(n_points * match_fraction)
            ids = rng.choice(n_points, size=k, replace=False)
            m = np.stack([ids, ids], axis=1)
            n_out = int(k * outlier_fraction)
            if n_out:
                rows = rng.choice(k, size=n_out, replace=False)
                m[rows, 1] = rng.integers(0, n_points, size=n_out)
            matches[(i, j)] = m.astype(np.int64)

    return PairGraph(images=images, matches=matches), {
        "cloud": cloud,
        "images": truths,
    }


def landmark_dict(graph, truth, n_landmarks=8, seed=99, prefix="lm"):
    """Pick common-cloud points as landmarks, expressed in image coords."""
    rng = np.random.default_rng(seed)
    n_points = truth["cloud"].shape[0]
    ids = rng.choice(n_points, size=n_landmarks, replace=False)
    out = {}
    for k, pid in enumerate(ids):
        entries = []
        for i, t in enumerate(truth["images"]):
            entries.append((i, t["inv"](truth["cloud"][pid : pid + 1])[0]))
        out[f"{prefix}{k}"] = entries
    return out
