"""frog-tpu command-line interface.

Subcommands mirror the reference's executables and drivers:

  run          full pipeline (FROG.py / run.sh)
  extract      3D-SURF keypoints for one volume (surf3d)
  match        all-pairs descriptor matching -> pairs.bin (match)
  register     groupwise optimization from pairs.bin (frog)
  register-one register a new volume vs a frozen group (tools/register.py)
  transform    resample a volume through a transform (VolumeTransform)
  average      mean/stdev atlas over volumes (AverageVolumes)
  dummy        common-space sampling grid from bbox.json (DummyVolumeGenerator)
  check        diffeomorphism check (CheckDiffeomorphism)
  mesh         transform a mesh (MeshTransform)
  points       transform a point (PointsTransform)
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="frog-tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    # ---- run (FROG.py:15-52)
    run = sub.add_parser("run", help="full pipeline")
    run.add_argument("input")
    run.add_argument("-o", dest="output", default=None)
    run.add_argument("-se", "--skip-existing", action="store_true")
    run.add_argument("-limit", type=int, default=None)
    run.add_argument("-j", dest="single_json", action="store_true")
    run.add_argument("-dl", dest="deformable_levels", type=int, default=None)
    run.add_argument("-di", dest="deformable_iterations", type=int, default=None)
    run.add_argument("-g", dest="grid_spacing", type=float, default=None)
    run.add_argument("-li", dest="linear_iterations", type=int, default=None)
    run.add_argument("-lanchor", nargs=3, type=float, default=None)
    run.add_argument("-l", dest="landmarks", default=None)
    run.add_argument("-lc", dest="constraints", default=None)
    run.add_argument("-il", dest="invert_landmarks", type=int, default=1)
    run.add_argument("-wp", dest="write_pairs", action="store_true")
    run.add_argument("-md", dest="match_distance", type=float, default=1e10)
    run.add_argument("-d2", dest="ratio", type=float, default=1.0)
    run.add_argument("-m", dest="masks", default=None)
    run.add_argument("-cmin", type=float, default=None)
    run.add_argument("-cmax", type=float, default=None)
    run.add_argument("-p", dest="n_points", type=int, default=20000)
    run.add_argument("-pad", type=float, default=0.0)
    run.add_argument("-s", dest="spacing", type=float, default=0.75)
    run.add_argument("-t", dest="threshold", type=float, default=0.0)
    run.add_argument("-a", dest="average_spacing", type=float, default=None)
    run.add_argument("-devices", type=int, default=None,
                     help="use N local devices end-to-end: extraction"
                          " round-robins volumes, matching shards pair"
                          " chunks, registration shards the image axis")

    # ---- extract (surf3d CLI, frog.json:352-428)
    ex = sub.add_parser("extract", help="3D-SURF keypoints")
    ex.add_argument("volume")
    ex.add_argument("-o", dest="output", default="points")
    ex.add_argument("-s", dest="spacing", type=float, default=0.75)
    ex.add_argument("-t", dest="threshold", type=float, default=0.0)
    ex.add_argument("-n", dest="n_points", type=int, default=20000)
    ex.add_argument("-m", dest="mask", default=None)
    ex.add_argument("-cmin", type=float, default=None)
    ex.add_argument("-cmax", type=float, default=None)
    ex.add_argument("-pad", type=float, default=0.0)
    ex.add_argument("-csv", action="store_true")
    ex.add_argument("-bin", action="store_true")
    ex.add_argument("-json", action="store_true",
                    help="write keypoints as JSON (frog.json:354)")

    # ---- match (match.cpp:347-431)
    ma = sub.add_parser("match", help="all-pairs matching")
    ma.add_argument("input", help="point file list or directory")
    ma.add_argument("-o", dest="output", default="pairs.bin")
    ma.add_argument("-n", dest="max_files", type=int, default=None,
                    help="cap the file list (match.cpp:498-500)")
    ma.add_argument("-nt", dest="n_threads", type=int, default=None,
                    help="host thread cap (the reference's OpenMP -nt)")
    ma.add_argument("-d", dest="distance", type=float, default=0.22)
    ma.add_argument("-d2", dest="ratio", type=float, default=1.0)
    ma.add_argument("-np", dest="n_points", type=int, default=None)
    ma.add_argument("-sp", dest="min_response", type=float, default=0.0)
    ma.add_argument("-zmin", type=float, default=-1e20)
    ma.add_argument("-zmax", type=float, default=1e20)
    ma.add_argument("-anat", type=float, default=0.0)
    ma.add_argument("-p", dest="write_points", action="store_true",
                    help="write pruned keypoints to points<i>.csv "
                         "(match.cpp:600-605)")
    ma.add_argument("-sym", action="store_true")
    ma.add_argument("-all", dest="match_all", action="store_true")
    ma.add_argument("-targ", dest="target", type=int, default=None)
    ma.add_argument("-transformPrefix", dest="transform_prefix", default=None)
    ma.add_argument("-dist", dest="distributed", action="store_true",
                    help="multi-process pair partitioning via"
                         " jax.distributed (set JAX_COORDINATOR_ADDRESS /"
                         " JAX_NUM_PROCESSES / JAX_PROCESS_ID)")
    ma.add_argument("-devices", type=int, default=None,
                    help="shard the pair list over N local devices"
                         " in-process (match.cpp:638-652)")

    # ---- register (frog.cxx:13-66)
    re = sub.add_parser("register", help="groupwise optimizer")
    re.add_argument("pairs")
    re.add_argument("-dlinear", type=int, default=0)
    re.add_argument("-dstats", type=int, default=0)
    re.add_argument("-lanchor", nargs=3, type=float, default=[0.5, 0.5, 0.5])
    re.add_argument("-la", dest="linear_alpha", type=float, default=0.5)
    re.add_argument("-li", dest="linear_iterations", type=int, default=50)
    re.add_argument("-s", dest="use_scale", type=int, default=1)
    re.add_argument("-da", dest="deformable_alpha", type=float, default=0.02)
    re.add_argument("-di", dest="deformable_iterations", type=int, default=200)
    re.add_argument("-dl", dest="deformable_levels", type=int, default=3)
    re.add_argument("-g", dest="grid_spacing", type=float, default=100.0)
    re.add_argument("-gd", dest="guarantee", type=int, default=1)
    re.add_argument("-gm", dest="max_ratio", type=float, default=0.4)
    re.add_argument("-emi", dest="em_iterations", type=int, default=10000)
    re.add_argument("-si", dest="stat_interval", type=int, default=10)
    re.add_argument("-se", dest="em_epsilon", type=float, default=1e-6)
    re.add_argument("-ss", dest="em_max_samples", type=int, default=10000,
                    help="stats maximal sample size (frog.cxx:40, default"
                         " 10000 as the reference); 0 = full-sample EM")
    re.add_argument("-ssm", dest="em_sampling", default="stride",
                    choices=["stride", "reservoir"],
                    help="EM subsampling mode: deterministic stride or the"
                         " reference's random reservoir (stats.h:36-76)")
    re.add_argument("-t", dest="inlier_threshold", type=float, default=0.5)
    re.add_argument("-fi", dest="n_fixed", type=int, default=0)
    re.add_argument("-fd", dest="fixed_dir", default=None)
    re.add_argument("-r", dest="use_ransac", type=int, default=1)
    re.add_argument("-ri", dest="ransac_iterations", type=int, default=5000)
    re.add_argument("-rs", dest="ransac_max_scale", type=float, default=10.0)
    re.add_argument("-rid", dest="ransac_distance", type=float, default=50.0)
    re.add_argument("-l", dest="landmarks", default=None)
    re.add_argument("-lc", dest="constraints", default=None)
    re.add_argument("-il", dest="invert_landmarks", type=int, default=1)
    re.add_argument("-lcw", dest="constraint_weight", type=float, default=50.0)
    re.add_argument("-mf", dest="measures_file", default="measures.csv")
    re.add_argument("-wp", dest="write_pairs", type=int, default=0)
    re.add_argument("-j", dest="single_json", action="store_true")
    re.add_argument("-ts", dest="transform_subdir", default="transforms")
    re.add_argument("-o", dest="output", default=".")
    re.add_argument("-devices", "-nt", dest="devices", type=int, default=None,
                    help="shard the image axis over this many devices"
                         " (the analog of the reference's -nt thread count,"
                         " frog.cxx:143-145)")

    # ---- register-one (tools/register.py)
    ro = sub.add_parser("register-one", help="register vs frozen group")
    ro.add_argument("volume")
    ro.add_argument("group_dir")
    ro.add_argument("-o", dest="output", default=".")
    ro.add_argument("-s", dest="spacing", type=float, default=0.75)
    ro.add_argument("-n", dest="n_points", type=int, default=20000)

    # ---- transform (VolumeTransform.cxx:26-76)
    tr = sub.add_parser("transform", help="resample volume through transform")
    tr.add_argument("source")
    tr.add_argument("reference")
    tr.add_argument("-t", dest="transform", default=None)
    tr.add_argument("-ti", dest="transform_inverse", default=None)
    tr.add_argument("-i", dest="interpolation", type=int, default=1)
    tr.add_argument("-b", dest="background", type=float, default=None)
    tr.add_argument("-o", dest="output", default="output.mhd")
    tr.add_argument("-rx", dest="reverse_x", type=int, default=0)

    # ---- average (AverageVolumes.cxx)
    av = sub.add_parser("average", help="mean/stdev atlas")
    av.add_argument("volumes", nargs="+")
    av.add_argument("-o", dest="output", default=".")

    # ---- dummy (DummyVolumeGenerator.cxx)
    du = sub.add_parser("dummy", help="common-space grid volume")
    du.add_argument("bbox")
    du.add_argument("spacing", type=float)
    du.add_argument("-o", dest="output", default="dummy.mhd")

    # ---- check (CheckDiffeomorphism.cxx)
    ch = sub.add_parser("check", help="diffeomorphism check")
    ch.add_argument("image")
    ch.add_argument("transform")
    ch.add_argument("spacing", nargs="?", type=float, default=None)

    # ---- mesh (MeshTransform.cxx)
    me = sub.add_parser("mesh", help="transform a mesh")
    me.add_argument("mesh")
    me.add_argument("output")
    me.add_argument("-t", dest="transform", default=None)
    me.add_argument("-ti", dest="transform_inverse", default=None)

    # ---- points (PointsTransform.cxx)
    po = sub.add_parser("points", help="transform a point")
    po.add_argument("-p", nargs=3, type=float, required=True)
    po.add_argument("-t", dest="transform", default=None)
    po.add_argument("-ti", dest="transform_inverse", default=None)

    # ---- rigid (js/lib/LSRegistration.js) and stochastic (J4)
    ri = sub.add_parser("rigid", help="rigid groupwise (Laplacian solver)")
    ri.add_argument("input", help="keypoint files dir or list")
    ri.add_argument("-o", dest="output", default="registration.json")
    ri.add_argument("-stochastic", action="store_true")
    ri.add_argument("-batch", type=int, default=50)
    ri.add_argument("-iterations", type=int, default=200)
    ri.add_argument("-d", dest="distance", type=float, default=0.3)

    # ---- flip (tools/flip_tool.py): RAS reorientation
    fl = sub.add_parser("flip", help="reorient a volume to RAS")
    fl.add_argument("input")
    fl.add_argument("output")
    fl.add_argument("-threshold", type=float, default=None)

    # ---- trim (tools/trimTransform.py)
    tm = sub.add_parser("trim", help="keep first n transform chain entries")
    tm.add_argument("input")
    tm.add_argument("n", type=int)
    tm.add_argument("-o", dest="output", default="output.json")

    # ---- QA volumes (tools/checkerBoard.py, grid.py, labelContour.py)
    qa = sub.add_parser("qa", help="QA volumes: checkerboard/grid/contour")
    qa.add_argument("kind", choices=["checkerboard", "grid", "contour"])
    qa.add_argument("input")
    qa.add_argument("-o", dest="output", default="output.nii.gz")

    # ---- view (js/pointsViewer.js functional core)
    vw = sub.add_parser("view", help="self-contained HTML group viewer")
    vw.add_argument("run_dir", help="run directory with pairs.bin + transforms/")
    vw.add_argument("-o", dest="output", default=None)
    vw.add_argument("-n", dest="max_points", type=int, default=5000)

    # ---- merge (mergePairs desk action: union two match graphs)
    mg = sub.add_parser("merge", help="merge pairs.bin match graphs")
    mg.add_argument("output")
    mg.add_argument("inputs", nargs="+")

    # ---- serve (the interactive L5 apps, js/*.js + js/lib/FROG.js)
    sv = sub.add_parser("serve", help="web app server (interactive UIs)")
    sv.add_argument("root", help="data root containing volumes")
    sv.add_argument("-p", dest="port", type=int, default=8080)
    sv.add_argument("-w", dest="work_dir", default=None,
                    help="job output directory (default <root>/frog_jobs)")

    # ---- register2 (tools/register2volumes.py)
    r2 = sub.add_parser("register2", help="pairwise registration of 2 volumes")
    r2.add_argument("volume1")
    r2.add_argument("volume2")
    r2.add_argument("-o", dest="output", default="registered.nii.gz")
    r2.add_argument("-d", dest="workdir", default=".")
    r2.add_argument("-s", dest="spacing", type=float, default=0.75)
    r2.add_argument("-p", dest="n_points", type=int, default=20000)
    r2.add_argument("-li", dest="linear_iterations", type=int, default=50)
    r2.add_argument("-dl", dest="deformable_levels", type=int, default=3)
    r2.add_argument("-di", dest="deformable_iterations", type=int, default=200)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    cmd = args.command

    # Persistent compilation cache across CLI invocations: explicit
    # config, because this container's sitecustomize imports jax before
    # user code so the env-var route never engages (utils/cache.py).
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if getattr(args, "n_threads", None):
        # -nt analog: cap XLA's CPU host threads (omp_set_num_threads,
        # frog.cxx:143-145 / match.cpp:501).  Must be APPENDED to XLA_FLAGS
        # (not setdefault — this container always defines it) and set before
        # anything imports jax; every frog_tpu import below is lazy for
        # exactly this reason.
        if "jax" in sys.modules:
            print(
                "warning: -nt ignored (jax already initialized)",
                file=sys.stderr,
            )
        else:
            flags = os.environ.get("XLA_FLAGS", "")
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_cpu_multi_thread_eigen=false "
                f"intra_op_parallelism_threads={args.n_threads}"
            ).strip()

    if cmd == "run":
        from .ops.matcher import MatchParams
        from .ops.surf3d import SurfParams
        from .pipeline import run_pipeline
        from .registration import GroupConfig

        cfg = GroupConfig(single_file_transforms=args.single_json,
                          write_pairs=args.write_pairs)
        import dataclasses

        overrides = {}
        for name in (
            "deformable_levels",
            "deformable_iterations",
            "linear_iterations",
        ):
            v = getattr(args, name)
            if v is not None:
                overrides[name] = v
        if args.grid_spacing is not None:
            overrides["initial_grid_size"] = args.grid_spacing
        if args.lanchor is not None:
            overrides["linear_anchor"] = tuple(args.lanchor)
        cfg = dataclasses.replace(cfg, **overrides)
        run_pipeline(
            args.input,
            output_dir=args.output,
            surf=SurfParams(
                spacing=args.spacing,
                threshold=args.threshold,
                n_points=args.n_points,
                cmin=args.cmin,
                cmax=args.cmax,
                pad=args.pad,
            ),
            match_params=MatchParams(
                max_distance=args.match_distance, second_ratio=args.ratio
            ),
            config=cfg,
            landmarks_path=args.landmarks,
            constraints_path=args.constraints,
            invert_landmarks=bool(args.invert_landmarks),
            masks_path=args.masks,
            average_spacing=args.average_spacing,
            skip_existing=args.skip_existing,
            limit=args.limit,
            devices=args.devices,
        )
    elif cmd == "extract":
        from .io.keypoints import write_keypoints
        from .io.mhd import read_volume
        from .ops.surf3d import SurfParams, extract_keypoints

        vol = read_volume(args.volume)
        mask = read_volume(args.mask) if args.mask else None
        kp = extract_keypoints(
            vol,
            SurfParams(
                spacing=args.spacing,
                threshold=args.threshold,
                n_points=args.n_points,
                cmin=args.cmin,
                cmax=args.cmax,
                pad=args.pad,
            ),
            mask=mask,
        )
        suffix = (".bin" if args.bin else ".json" if args.json
                  else ".csv" if args.csv else ".csv.gz")
        out = args.output + suffix
        write_keypoints(out, kp)
        print(f"{len(kp)} keypoints -> {out}")
    elif cmd == "match":
        from .ops.matcher import MatchParams
        from .pipeline import match_stage, parse_match_list

        files, rigids = parse_match_list(args.input)
        stage = match_stage
        if args.distributed:
            from .pipeline import match_stage_distributed

            stage = match_stage_distributed
        stage(
            files,
            MatchParams(
                max_distance=args.distance,
                second_ratio=args.ratio,
                anat_distance=args.anat,
                symmetric=args.sym,
                match_all=args.match_all,
            ),
            out_file=args.output,
            n_points=args.n_points,
            min_response=args.min_response,
            zmin=args.zmin,
            zmax=args.zmax,
            target=args.target,
            transform_prefix=args.transform_prefix,
            rigids=rigids,
            max_files=args.max_files,
            write_points=args.write_points,
            devices=args.devices,
        )
    elif cmd == "register":
        from .io.pairs import read_pairs
        from .pipeline import load_landmark_dir, register_stage
        from .registration import GroupConfig

        cfg = GroupConfig(
            linear_iterations=args.linear_iterations,
            linear_alpha=args.linear_alpha,
            use_scale=bool(args.use_scale),
            linear_anchor=tuple(args.lanchor),
            deformable_levels=args.deformable_levels,
            deformable_iterations=args.deformable_iterations,
            deformable_alpha=args.deformable_alpha,
            initial_grid_size=args.grid_spacing,
            guarantee_diffeomorphism=bool(args.guarantee),
            max_displacement_ratio=args.max_ratio,
            em_max_iterations=args.em_iterations,
            stat_interval=args.stat_interval,
            em_epsilon=args.em_epsilon,
            em_max_samples=args.em_max_samples or None,
            em_sampling=args.em_sampling,
            display_linear=bool(args.dlinear),
            display_stats=bool(args.dstats),
            inlier_threshold=args.inlier_threshold,
            n_fixed=args.n_fixed,
            use_ransac=bool(args.use_ransac),
            ransac_iterations=args.ransac_iterations,
            ransac_max_scale=args.ransac_max_scale,
            ransac_inlier_distance=args.ransac_distance,
            landmarks_constraint_weight=args.constraint_weight,
            measures_file=args.measures_file,
            write_pairs=bool(args.write_pairs),
            single_file_transforms=args.single_json,
            transform_subdirectory=args.transform_subdir,
        )
        graph = read_pairs(args.pairs)
        landmarks = (
            load_landmark_dir(args.landmarks, bool(args.invert_landmarks))
            if args.landmarks
            else None
        )
        constraints = (
            load_landmark_dir(args.constraints, bool(args.invert_landmarks))
            if args.constraints
            else None
        )
        register_stage(
            graph,
            cfg,
            landmarks=landmarks,
            constraints=constraints,
            fixed_transforms_dir=args.fixed_dir,
            output_dir=args.output,
            devices=args.devices,
        )
    elif cmd == "register-one":
        from .ops.surf3d import SurfParams
        from .pipeline import register_one

        register_one(
            args.volume,
            args.group_dir,
            surf=SurfParams(spacing=args.spacing, n_points=args.n_points),
            output_dir=args.output,
        )
    elif cmd == "transform":
        from .io.mhd import read_volume, write_volume
        from .tools.resample import resample_volume
        from .transforms.io import read_transform

        chain = None
        inverse = True
        if args.transform:
            chain = read_transform(args.transform)
            inverse = True
        elif args.transform_inverse:
            chain = read_transform(args.transform_inverse)
            inverse = False
        src = read_volume(args.source)
        ref = read_volume(args.reference)
        out = resample_volume(
            src,
            ref,
            chain=chain,
            inverse=inverse,
            interpolation="nearest" if args.interpolation == 0 else "linear",
            background=args.background,
            flip_x=bool(args.reverse_x),
        )
        write_volume(args.output, out)
        print(f"written {args.output}")
    elif cmd == "average":
        from .io.mhd import write_volume
        from .tools.atlas import average_volumes

        mean, std = average_volumes(args.volumes)
        write_volume(os.path.join(args.output, "average.nii.gz"), mean)
        write_volume(os.path.join(args.output, "stdev.nii.gz"), std)
        print("written average.nii.gz, stdev.nii.gz")
    elif cmd == "dummy":
        from .io.mhd import write_volume
        from .tools.atlas import dummy_volume

        vol = dummy_volume(args.bbox, args.spacing)
        write_volume(args.output, vol)
        print(f"written {args.output} dims {vol.shape}")
    elif cmd == "check":
        from .io.mhd import read_volume
        from .tools.diffeo import check_diffeomorphism
        from .transforms.io import read_transform

        chain = read_transform(args.transform)
        grid = read_volume(args.image)
        n_neg, total = check_diffeomorphism(chain, grid, spacing=args.spacing)
        print(
            f"{n_neg} negative jacobian determinant values"
            f" ({100.0 * n_neg / total:.3g}%)"
        )
        return 1 if n_neg > 0 else 0
    elif cmd == "mesh":
        # NB: for mesh/point tools -t applies the chain directly and -ti
        # inverts it (MeshTransform.cxx:42-50) — the opposite of the volume
        # resampler, whose reslice map is output->input.
        from .tools.meshpoints import transform_mesh_file
        from .transforms.io import read_transform

        if args.transform:
            chain, inverse = read_transform(args.transform), False
        else:
            chain, inverse = read_transform(args.transform_inverse), True
        transform_mesh_file(chain, args.mesh, args.output, inverse=inverse)
        print(f"written {args.output}")
    elif cmd == "points":
        import numpy as np

        from .tools.meshpoints import transform_points
        from .transforms.io import read_transform

        if args.transform:
            chain, inverse = read_transform(args.transform), False
        else:
            chain, inverse = read_transform(args.transform_inverse), True
        out = transform_points(chain, np.asarray([args.p]), inverse=inverse)
        print(f"{out[0, 0]:.6g} {out[0, 1]:.6g} {out[0, 2]:.6g}")
    elif cmd == "rigid":
        import json

        from .io.keypoints import read_keypoints
        from .rigid import (
            Match3DParams,
            RigidGroupParams,
            StochasticParams,
            rigid_groupwise,
            stochastic_rigid,
        )

        from .pipeline import list_keypoint_files

        files = list_keypoint_files(args.input)
        kps = [read_keypoints(f) for f in files]
        group = RigidGroupParams(match=Match3DParams(matching_distance=args.distance))
        if args.stochastic:
            result = stochastic_rigid(
                kps,
                StochasticParams(
                    batch_size=args.batch,
                    max_iterations=args.iterations,
                    group=group,
                ),
                verbose=True,
            )
            record = {
                "positions": result["positions"].ravel().tolist(),
                "outliers": result["outliers"].tolist(),
            }
        else:
            result = rigid_groupwise(kps, group, verbose=True)
            record = {
                "positions": result["positions"].ravel().tolist(),
                "valences": result["valences"].tolist(),
                "numberOfEdges": result["numberOfEdges"],
            }
        with open(args.output, "w") as fh:
            json.dump(record, fh)
        print(f"written {args.output}")
    elif cmd == "flip":
        import numpy as np

        from .io.mhd import read_volume, write_volume

        vol = read_volume(args.input, reorient_to_ras=True)
        if args.threshold is not None:
            vol.data = np.where(vol.data < args.threshold, 0, vol.data)
        write_volume(args.output, vol)
        print(f"written {args.output} (RAS)")
    elif cmd == "trim":
        from .tools.qa import trim_transform

        trim_transform(args.input, args.n, args.output)
        print(f"written {args.output}")
    elif cmd == "qa":
        from .io.mhd import read_volume, write_volume
        from .tools.qa import checkerboard_volume, grid_volume, label_contour

        vol = read_volume(args.input)
        if args.kind == "checkerboard":
            out = checkerboard_volume(vol)
        elif args.kind == "grid":
            out = grid_volume(vol)
        else:
            out = label_contour(vol)
        write_volume(args.output, out)
        print(f"written {args.output}")
    elif cmd == "view":
        from .tools.viewer import export_group_viewer

        out = export_group_viewer(
            args.run_dir, output=args.output, max_points=args.max_points
        )
        print(f"written {out}")
    elif cmd == "merge":
        from .io.pairs import merge_pairs, read_pairs, write_pairs

        g = read_pairs(args.inputs[0])
        for path in args.inputs[1:]:
            g = merge_pairs(g, read_pairs(path))
        write_pairs(args.output, g)
        print(f"{g.n_matches} matches -> {args.output}")
    elif cmd == "serve":
        from .tools.server import serve

        httpd, _ = serve(args.root, port=args.port, work_dir=args.work_dir)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
    elif cmd == "register2":
        from .ops.surf3d import SurfParams
        from .registration import GroupConfig
        from .tools.qa import register_two_volumes

        register_two_volumes(
            args.volume1,
            args.volume2,
            output=args.output,
            out_dir=args.workdir,
            surf=SurfParams(spacing=args.spacing, n_points=args.n_points),
            config=GroupConfig(
                linear_iterations=args.linear_iterations,
                deformable_levels=args.deformable_levels,
                deformable_iterations=args.deformable_iterations,
            ),
        )
        print(f"written {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
