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


def make_synthetic_volumes(
    out_dir,
    n_images=20,
    shape=(192, 192, 192),
    spacing=2.0,
    warp_amp=3.0,
    shift_amp=8.0,
    seed=0,
    fmt="nii.gz",
    return_truth=False,
):
    """Write N CT-like synthetic volumes: one band-limited random texture
    observed through per-image smooth warps + translations (the volume
    analog of make_synthetic_group).  Returns the file list, or
    (files, truths) with ``return_truth`` where truths[i] holds the known
    per-image warp parameters (shift, phase, amp, shape, spacing) —
    volume i samples the texture at W_i(g) = g + shift + amp*sin(2*pi*
    g[perm]/shape + phase), so ground-truth correspondences across images
    are W_i^{-1}(q) for common texture coords q (see gt_correspondences).

    192^3 at 2 mm spacing gives a ~384 mm extent — reference-like bbox and
    deformable grid dims (imageGroup.h:52-82) at an extraction-bucket-sized
    voxel count.
    """
    import os

    from frog_tpu.io.nifti import write_nifti
    from frog_tpu.io.volume import Volume

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    nx, ny, nz = shape

    # band-limited texture via FFT lowpass (fast, no per-blob loops)
    noise = rng.normal(size=shape).astype(np.float32)
    f = np.fft.rfftn(noise)
    kx = np.fft.fftfreq(nx)[:, None, None]
    ky = np.fft.fftfreq(ny)[None, :, None]
    kz = np.fft.rfftfreq(nz)[None, None, :]
    k2 = kx * kx + ky * ky + kz * kz
    lp = np.exp(-k2 / (2 * 0.06**2)) + 0.25 * np.exp(-k2 / (2 * 0.15**2))
    base = np.fft.irfftn(f * lp, shape).astype(np.float32)
    base *= 400.0 / max(base.std(), 1e-9)

    g = np.stack(
        np.meshgrid(*(np.arange(s, dtype=np.float32) for s in shape),
                    indexing="ij"),
        axis=-1,
    )  # (X, Y, Z, 3) voxel coords
    files = []
    truths = []
    for i in range(n_images):
        path = os.path.join(out_dir, f"vol{i:02d}.{fmt}")
        files.append(path)
        # draw BEFORE the cache check so truths stay valid (and identical
        # to the freshly-generated volumes) when files already exist
        shift = rng.uniform(-shift_amp, shift_amp, 3).astype(np.float32)
        phase = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
        amp = (warp_amp * rng.uniform(0.5, 1.0, 3)).astype(np.float32)
        truths.append(
            {"shift": shift, "phase": phase, "amp": amp,
             "shape": np.asarray(shape), "spacing": float(spacing)}
        )
        if os.path.exists(path):
            continue
        coords = (
            g
            + shift
            + amp
            * np.sin(
                2 * np.pi * g[..., [1, 2, 0]] / np.asarray(shape) + phase
            )
        )
        try:
            from scipy.ndimage import map_coordinates

            data = map_coordinates(
                base, np.moveaxis(coords, -1, 0), order=1, mode="nearest"
            ).astype(np.float32)
        except ImportError:  # vectorized numpy trilinear fallback
            lo = np.floor(coords).astype(np.int64)
            fr = coords - lo
            data = np.zeros(shape, np.float32)
            flat = base.ravel()
            for dx in (0, 1):
                wx = fr[..., 0] if dx else 1.0 - fr[..., 0]
                cx = np.clip(lo[..., 0] + dx, 0, nx - 1)
                for dy in (0, 1):
                    wy = fr[..., 1] if dy else 1.0 - fr[..., 1]
                    cy = np.clip(lo[..., 1] + dy, 0, ny - 1)
                    for dz in (0, 1):
                        wz = fr[..., 2] if dz else 1.0 - fr[..., 2]
                        cz = np.clip(lo[..., 2] + dz, 0, nz - 1)
                        data += (wx * wy * wz) * flat[
                            (cx * ny + cy) * nz + cz
                        ]
        write_nifti(
            path,
            Volume(data, origin=(0.0, 0.0, 0.0), spacing=(spacing,) * 3),
        )
    return (files, truths) if return_truth else files


def gt_correspondences(truths, n_probes=100, margin=24, seed=123):
    """Ground-truth correspondence sets for make_synthetic_volumes output:
    sample ``n_probes`` common texture coords q, solve g_i = W_i^{-1}(q)
    per image by fixed-point iteration (the warp is small and smooth), and
    return world-mm positions (n_images, n_probes, 3).

    Each probe's row is one physical point seen in every image — the
    automated analog of the reference's manual landmark sets
    (imageGroup.cxx:1229-1282): after a perfect registration the
    transformed rows coincide across images.
    """
    shape = np.asarray(truths[0]["shape"], np.float64)
    spacing = float(truths[0]["spacing"])
    rng = np.random.default_rng(seed)
    q = rng.uniform(margin, shape - 1 - margin, size=(n_probes, 3))
    out = np.zeros((len(truths), n_probes, 3), np.float64)
    for i, t in enumerate(truths):
        shift = np.asarray(t["shift"], np.float64)
        phase = np.asarray(t["phase"], np.float64)
        amp = np.asarray(t["amp"], np.float64)
        g = q - shift
        for _ in range(25):
            g = q - shift - amp * np.sin(
                2 * np.pi * g[:, [1, 2, 0]] / shape + phase
            )
        out[i] = g * spacing
    return out.astype(np.float32)


def tre_stats(positions):
    """The paper's landmark metric over a (n_images, n_probes, 3) stack:
    per-probe mean distance to the cross-image centroid, averaged / maxed
    over probes (imageGroup.cxx:1229-1282).  Returns (mean, max) in mm."""
    centroid = positions.mean(axis=0, keepdims=True)
    d = np.linalg.norm(positions - centroid, axis=-1)  # (n_images, n_probes)
    per_probe = d.mean(axis=0)
    return float(per_probe.mean()), float(per_probe.max())
