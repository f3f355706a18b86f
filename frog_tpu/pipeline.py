"""Pipeline drivers — the FROG.py / run.sh / tools/register.py layer.

File-level contracts match the reference: keypoint files points<i>.csv.gz,
a volumes.txt list, pairs.bin, transforms/<i>.json, bbox.json, and the
average-image flow DummyVolumeGenerator -> VolumeTransform per image ->
AverageVolumes (FROG.py:98-129).
"""
from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from .io.keypoints import Keypoints, read_keypoints, write_keypoints
from .io.mhd import read_volume, write_volume
from .io.pairs import PairGraph, read_pairs, write_pairs
from .ops.matcher import MatchParams, match_graph
from .ops.surf3d import SurfParams, extract_keypoints
from .registration import GroupConfig, GroupRegistration
from .tools.atlas import average_volumes, dummy_volume
from .tools.resample import resample_volume
from .transforms.io import read_transform

VOLUME_EXTENSIONS = (".nii.gz", ".nii", ".mhd", ".mha")
KEYPOINT_EXTENSIONS = (".csv.gz",)


def find_inputs(path: str) -> list:
    """Input collection: directory scan or list file (FROG.py:131-148)."""
    exts = VOLUME_EXTENSIONS + KEYPOINT_EXTENSIONS
    files = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(exts):
                files.append(os.path.abspath(os.path.join(path, f)))
    else:
        base = os.path.dirname(path)
        with open(path) as fh:
            for line in fh.read().split("\n"):
                if line.startswith("#") or not line.strip():
                    continue
                if line.endswith(exts):
                    files.append(os.path.join(base, line.strip()))
    return files


def list_keypoint_files(path: str) -> list:
    """Keypoint files from a directory or list file.  Directory scans keep
    only files whose first line parses as a keypoint row (>= 7 numeric
    columns), so run artifacts (pairs.bin, measures.csv, ...) are skipped.
    """
    return parse_match_list(path)[0]


def parse_match_list(path: str):
    """Match input: directory scan or a list file whose rows are
    ``file[,tx,ty,tz]`` — the optional per-file rigid offset that the
    reference stores per image and writes into pairs.bin as refTranslation
    (match.cpp:454-493, 698-708).  Returns (files, rigids) where rigids is
    an (N, 3) float64 array, or None when no row carried an offset.
    """
    if os.path.isdir(path):
        out = []
        for f in sorted(os.listdir(path)):
            full = os.path.join(path, f)
            if f.endswith(".bin") and f != "pairs.bin":
                out.append(full)
            elif f.endswith((".csv", ".csv.gz")):
                if _looks_like_keypoints(full):
                    out.append(full)
        return out, None
    files = []
    rigids = []
    any_rigid = False
    base = os.path.dirname(path)
    with open(path) as fh:
        for line in fh:
            cells = [c.strip() for c in line.split(",")]
            cell = cells[0]
            if not cell or cell.startswith("#"):
                continue
            if cell.startswith("/"):
                files.append(cell)
            else:
                # relative names get the list file's directory prepended;
                # the reference also appends ".csv" (match.cpp:460-473)
                if not cell.endswith((".csv", ".csv.gz", ".bin")):
                    cell += ".csv"
                files.append(os.path.join(base, cell))
            t = np.zeros(3)
            try:
                for k in range(3):
                    t[k] = float(cells[1 + k])
                any_rigid = True
            except (IndexError, ValueError):
                pass
            rigids.append(t)
    return files, (np.asarray(rigids) if any_rigid else None)


def _looks_like_keypoints(path: str) -> bool:
    import gzip

    try:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            line = f.readline().strip().rstrip(",")
        cells = line.split(",")
        if len(cells) < 7:
            return False
        for c in cells:
            float(c)
        return True
    except (OSError, ValueError):
        return False


def extract_stage(
    files: list,
    surf: SurfParams,
    out_dir: str = ".",
    masks: list | None = None,
    skip_existing: bool = False,
    verbose: bool = True,
    devices: int | None = None,
) -> list:
    """Per-volume keypoint extraction with skip-existing
    (FROG.py:179-208).  Returns the keypoint file list.

    Host IO (volume read of the NEXT file, keypoint write of the PREVIOUS
    one) overlaps the current volume's device computation via a small
    thread pool — the device dispatch is asynchronous, so the host would
    otherwise idle during the fused extraction kernel.

    ``devices`` round-robins volumes over that many local devices — the
    TPU analog of the reference's per-image parallel extraction loop
    (run.sh:80-88; OpenMP-over-images, imageGroup.cxx:194): volume k is
    staged and dispatched on device k % D, with up to D extractions in
    flight, each keeping the existing double-buffered upload/readback
    overlap.  None/1 keeps the single-device path."""
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    devs = [None]
    if devices and devices > 1:
        import jax

        devs = jax.devices()[:devices]
    n_dev = len(devs)
    pool = ThreadPoolExecutor(max_workers=2 + min(n_dev - 1, 2))
    work = []  # (index-in-files, out path)
    keypoint_files = []
    for i, f in enumerate(files):
        if f.endswith(".csv.gz"):
            keypoint_files.append(f)
            continue
        out = os.path.join(out_dir, f"points{len(keypoint_files)}.csv.gz")
        keypoint_files.append(out)
        if skip_existing and os.path.exists(out):
            if verbose:
                print(f"{out} exists, skipping")
            continue
        work.append((i, f, out))

    reads = {}

    from .ops.surf3d.extract import (
        extract_keypoints_async,
        finalize_keypoints,
        stage_for_extract,
    )

    def _read(i, f, device):
        # read + clamp/pad + wire cast + device upload, all on this worker
        # thread: volume k+1's host prep (~0.2 s CPU for the f16 cast) and
        # tunnel transfer overlap volume k's detect/describe device time
        vol = read_volume(f)
        staged = stage_for_extract(vol, surf, device=device)
        mask = None
        if masks and i < len(masks) and masks[i]:
            mask = read_volume(masks[i])
        return staged, mask

    pending_write = None
    pending = []  # FIFO of (device results, out path, name, t_start)

    def finish(p):
        nonlocal pending_write
        dispatched, out, name, t0 = p
        kp = finalize_keypoints(*dispatched)
        if pending_write is not None:
            pending_write.result()
        pending_write = pool.submit(write_keypoints, out, kp)
        if verbose:
            print(
                f"extracted {len(kp)} keypoints from {name}"
                f" in {time.time() - t0:.1f}s -> {out}"
            )

    for k, (i, f, out) in enumerate(work):
        if (i, f) not in reads:
            reads[(i, f)] = pool.submit(_read, i, f, devs[k % n_dev])
        t0 = time.time()
        vol, mask = reads.pop((i, f)).result()
        # prefetch up to n_dev volumes ahead (each to its own device)
        for ahead in range(1, n_dev + 1):
            if k + ahead < len(work):
                ni, nf, _ = work[k + ahead]
                if (ni, nf) not in reads:
                    reads[(ni, nf)] = pool.submit(
                        _read, ni, nf, devs[(k + ahead) % n_dev]
                    )
        # dispatch volume k BEFORE paying earlier readbacks: device k%D
        # crunches k while the (slow, remote) result tunnel drains
        dispatched = extract_keypoints_async(vol, surf, mask=mask)
        pending.append((dispatched, out, os.path.basename(f), t0))
        while len(pending) > n_dev:
            finish(pending.pop(0))
    while pending:
        finish(pending.pop(0))
    if pending_write is not None:
        pending_write.result()
    pool.shutdown()
    return keypoint_files


def match_stage(
    keypoint_files: list,
    params: MatchParams,
    out_file: str = "pairs.bin",
    n_points: int | None = None,
    min_response: float = 0.0,
    zmin: float = -1e20,
    zmax: float = 1e20,
    target: int | None = None,
    transform_prefix: str | None = None,
    rigids: np.ndarray | None = None,
    max_files: int | None = None,
    pairs: list | None = None,
    skip_existing: bool = False,
    verbose: bool = True,
    write_points: bool = False,
    devices: int | None = None,
) -> PairGraph:
    """Load + prune keypoints, build the match graph, write pairs.bin
    (match/match.cpp main flow).  ``rigids`` are per-file offsets whose z
    component shifts the z-slab filter (match.cpp:538-546) and which are
    written to pairs.bin as refTranslation; ``max_files`` caps the file
    list (-n, match.cpp:498-500); ``write_points`` dumps the surviving
    (post-prune) keypoints to points<i>.csv (-p, match.cpp:600-605);
    ``devices`` shards the pair list over that many local devices
    in-process (the reference's all-cores pair loop, match.cpp:638-652)."""
    if max_files is not None and len(keypoint_files) > max_files:
        keypoint_files = keypoint_files[:max_files]
        if rigids is not None:
            rigids = rigids[:max_files]
    if skip_existing and os.path.exists(out_file):
        if verbose:
            print(f"{out_file} exists, skipping matching")
        return read_pairs(out_file)
    positions = None
    # Parallel reads (the native gzip/CSV codec releases the GIL, so a
    # small pool cuts the 20-file load ~3x on this 2-core host), with
    # pruning in the reader threads.  When the point budget is known
    # (-n, the reference's standard flow) each image's matcher fields are
    # ALSO staged to the device right away — the ~90 MB of uploads then
    # overlap the remaining reads instead of serializing after them.
    from concurrent.futures import ThreadPoolExecutor

    from .ops.matcher import _TILE, stage_keypoints_device

    pad_hint = None
    if n_points is not None and not transform_prefix:
        pad_hint = max(_TILE, -(-n_points // _TILE) * _TILE)

    def _load_one(idx):
        kp = read_keypoints(keypoint_files[idx])
        if zmin > -1e19 or zmax < 1e19:
            zt = float(rigids[idx][2]) if rigids is not None else 0.0
            z = kp.xyz[:, 2] + zt
            keep = (z >= zmin) & (z <= zmax)
            kp = kp.select(np.flatnonzero(keep))
        if n_points is not None or min_response > 0:
            kp = kp.top_by_response(n_points or len(kp), min_response)
        # without an explicit budget, round this image's own count up to
        # a tile: uniform point counts (the standard pipeline) then agree
        # on one pad and staging engages; ragged counts fall back
        pad = pad_hint
        if pad is None and not transform_prefix:
            pad = max(_TILE, -(-len(kp) // _TILE) * _TILE)
        rows = (
            stage_keypoints_device(kp, pad)
            if pad and len(kp) <= pad
            else None
        )
        return kp, rows

    with ThreadPoolExecutor(max_workers=4) as rpool:
        loaded = list(rpool.map(_load_one, range(len(keypoint_files))))
    kps = [kp for kp, _ in loaded]
    staged = [rows for _, rows in loaded]
    del loaded  # don't pin the speculative device buffers if staging bails
    if (
        not staged
        or any(r is None for r in staged)
        or len({r["desc"].shape[0] for r in staged}) > 1
    ):
        staged = None
    if write_points:
        for idx, kp in enumerate(kps):
            out = f"points{idx}.csv"
            write_keypoints(out, kp)
            if verbose:
                print(f" writing {out}")
    if transform_prefix:
        # -transformPrefix: pre-transform positions for the -anat gate
        # (match.cpp:516-525)
        import jax.numpy as jnp

        positions = []
        for idx, kp in enumerate(kps):
            chain = read_transform(f"{transform_prefix}{idx}.json")
            positions.append(np.asarray(chain(jnp.asarray(kp.xyz))))
    names = [os.path.basename(f) for f in keypoint_files]
    mesh = None
    if devices:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(devices)
    graph = match_graph(
        kps, params, names=names, target=target, positions=positions,
        ref_translations=rigids, pairs=pairs, progress=verbose, mesh=mesh,
        staged=staged,
    )
    if out_file:
        write_pairs(out_file, graph)
    if verbose:
        print(f"{graph.n_matches} matches -> {out_file}")
    return graph


def match_stage_distributed(
    keypoint_files: list,
    params: MatchParams,
    out_file: str = "pairs.bin",
    target: int | None = None,
    verbose: bool = True,
    **kwargs,
) -> PairGraph | None:
    """Multi-process matching: each jax.distributed process computes its
    slice of the pair list (the TPU-native analog of the reference's
    dynamic OpenMP schedule over pairs, match.cpp:638-652), writes
    ``<out>.part<pid>``, and process 0 merges after a barrier.

    Returns the merged graph on process 0, None elsewhere.
    """
    import jax

    from .parallel.distributed import (
        initialize,
        merge_pair_graphs,
        partition_pairs,
    )

    initialize()
    pid, nproc = jax.process_index(), jax.process_count()
    pairs = partition_pairs(len(keypoint_files), pid, nproc, target)
    part = f"{out_file}.part{pid}"
    match_stage(
        keypoint_files, params, out_file=part, target=target, pairs=pairs,
        verbose=verbose, **kwargs,
    )
    if nproc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("frog-tpu-match-parts")
    if pid != 0:
        return None
    graphs = [read_pairs(f"{out_file}.part{p}") for p in range(nproc)]
    merged = merge_pair_graphs(graphs)
    write_pairs(out_file, merged)
    if verbose:
        print(f"{merged.n_matches} matches ({nproc} processes) -> {out_file}")
    return merged


def load_landmark_dir(path: str, invert_xy: bool = True) -> dict:
    """Per-image landmark CSVs: sorted files, lines ``name,x,y,z``
    (imageGroup.cxx:1161-1206); x and y are negated by default."""
    out: dict = {}
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
    )
    for i, f in enumerate(files):
        with open(f) as fh:
            for line in fh:
                if line.startswith("#") or not line.strip():
                    continue
                parts = line.strip().split(",")
                if len(parts) < 4:
                    continue
                name = parts[0]
                xyz = [float(v) for v in parts[1:4]]
                if invert_xy:
                    xyz[0] = -xyz[0]
                    xyz[1] = -xyz[1]
                out.setdefault(name, []).append((i, np.asarray(xyz, np.float32)))
    return out


def register_stage(
    graph: PairGraph,
    config: GroupConfig,
    landmarks: dict | None = None,
    constraints: dict | None = None,
    fixed_transforms_dir: str | None = None,
    output_dir: str = ".",
    devices: int | None = None,
) -> GroupRegistration:
    fixed_chains = None
    if config.n_fixed and fixed_transforms_dir:
        fixed_chains = [
            read_transform(os.path.join(fixed_transforms_dir, f"{i}.json"))
            for i in range(config.n_fixed)
        ]
    mesh = None
    if devices:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(devices)
    reg = GroupRegistration(
        graph,
        config,
        landmarks=landmarks,
        constraint_landmarks=constraints,
        fixed_chains=fixed_chains,
        output_dir=output_dir,
        mesh=mesh,
    )
    reg.run()
    reg.save_outputs(output_dir)
    return reg


def average_stage(
    files: list,
    spacing: float,
    transforms_dir: str = "transforms",
    out_dir: str = ".",
    bbox_file: str = "bbox.json",
    verbose: bool = True,
):
    """Common-space mean/stdev atlas (FROG.py:98-129, transform.sh)."""
    ref = dummy_volume(os.path.join(out_dir, bbox_file), spacing)
    write_volume(os.path.join(out_dir, "dummy.mhd"), ref)
    transformed = []
    for i, f in enumerate(files):
        chain = read_transform(os.path.join(out_dir, transforms_dir, f"{i}.json"))
        vol = read_volume(f)
        out = resample_volume(vol, ref, chain=chain, inverse=True)
        name = os.path.join(out_dir, f"transformed{i}.nii.gz")
        write_volume(name, out)
        transformed.append(name)
        if verbose:
            print(f"resampled {os.path.basename(f)} -> {name}")
    mean, std = average_volumes(transformed)
    write_volume(os.path.join(out_dir, "average.nii.gz"), mean)
    write_volume(os.path.join(out_dir, "stdev.nii.gz"), std)
    return mean, std


def run_pipeline(
    input_path: str,
    output_dir: str | None = None,
    surf: SurfParams = SurfParams(),
    match_params: MatchParams = MatchParams(max_distance=1e10, second_ratio=1.0),
    config: GroupConfig = GroupConfig(),
    landmarks_path: str | None = None,
    constraints_path: str | None = None,
    invert_landmarks: bool = True,
    masks_path: str | None = None,
    average_spacing: float | None = None,
    skip_existing: bool = False,
    limit: int | None = None,
    verbose: bool = True,
    devices: int | None = None,
):
    """Full pipeline: extract -> match -> register [-> average]
    (FROG.py main flow).  ``devices`` spreads ALL THREE stages over that
    many local devices (extraction round-robins volumes, matching shards
    pair chunks, registration shards the image axis)."""
    files = find_inputs(input_path)
    if limit:
        files = files[:limit]
    if verbose:
        print(f"{len(files)} input files")
    out_dir = output_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    masks = find_inputs(masks_path) if masks_path else None

    t0 = time.time()
    from .ops.matcher import warm_matcher

    # overlap the matcher compiles with the extraction device work
    warm_matcher(surf.n_points, match_params.scale_ratio)
    keypoint_files = extract_stage(
        files, surf, out_dir, masks=masks, skip_existing=skip_existing,
        verbose=verbose, devices=devices,
    )
    with open(os.path.join(out_dir, "volumes.txt"), "w") as f:
        f.write("\n".join(keypoint_files))
    t1 = time.time()
    graph = match_stage(
        keypoint_files,
        match_params,
        out_file=os.path.join(out_dir, "pairs.bin"),
        n_points=surf.n_points,
        skip_existing=skip_existing,
        verbose=verbose,
        devices=devices,
    )
    t2 = time.time()
    landmarks = (
        load_landmark_dir(landmarks_path, invert_landmarks)
        if landmarks_path
        else None
    )
    constraints = (
        load_landmark_dir(constraints_path, invert_landmarks)
        if constraints_path
        else None
    )
    reg = register_stage(
        graph, config, landmarks=landmarks, constraints=constraints,
        output_dir=out_dir, devices=devices,
    )
    t3 = time.time()
    if verbose:
        print(
            f"timings: extract {t1 - t0:.1f}s, match {t2 - t1:.1f}s,"
            f" register {t3 - t2:.1f}s"
        )
    if average_spacing:
        volume_files = [f for f in files if not f.endswith(".csv.gz")]
        average_stage(volume_files, average_spacing, out_dir=out_dir, verbose=verbose)
    return reg


def register_one(
    volume: str,
    group_dir: str,
    surf: SurfParams = SurfParams(),
    match_params: MatchParams = MatchParams(max_distance=1e10, second_ratio=1.0),
    config: GroupConfig | None = None,
    output_dir: str | None = None,
    verbose: bool = True,
):
    """Register one new volume against a frozen group
    (tools/register.py:55-95)."""
    group_points = sorted(
        os.path.join(group_dir, f)
        for f in os.listdir(group_dir)
        if f.startswith("points") and f.endswith(".csv.gz")
    )
    n_fixed = len(group_points)
    out_dir = output_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    new_points = extract_stage([volume], surf, out_dir, verbose=verbose)
    all_points = group_points + new_points
    graph = match_stage(
        all_points,
        match_params,
        out_file=os.path.join(out_dir, "pairs.bin"),
        n_points=surf.n_points,
        target=n_fixed,
        verbose=verbose,
    )
    cfg = config or GroupConfig()
    cfg = dataclasses.replace(
        cfg, n_fixed=n_fixed, single_file_transforms=True
    )
    return register_stage(
        graph,
        cfg,
        fixed_transforms_dir=os.path.join(group_dir, "transforms"),
        output_dir=out_dir,
    )
