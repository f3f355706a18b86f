"""Groupwise registration orchestrator — the reference's ImageGroup::run
(registration/imageGroup.cxx:31-157) re-built around jitted array kernels.

Host side: configuration, the transform-chain bookkeeping (chain length
changes when the diffeomorphism guard stacks a fresh grid), measure/record
output.  Device side: every per-iteration computation (EM, linear update,
deformable update, point transforms) as fixed-shape jitted kernels over the
padded ``GroupArrays``.
"""
from __future__ import annotations

import dataclasses
import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.pairs import PairGraph
from ..transforms.affine import Affine
from ..transforms.bspline import BSpline, grid_from_bbox
from ..transforms.chain import TransformChain
from . import kernels
from .state import build_group_state, GroupArrays, GroupMeta
from .stats import estimate_mixture

__all__ = ["GroupConfig", "GroupRegistration"]


@dataclasses.dataclass
class GroupConfig:
    """Mirrors the reference defaults (imageGroup.h:52-82, stats.cxx:10-12)."""

    linear_iterations: int = 50
    linear_alpha: float = 0.5
    use_scale: bool = True
    linear_anchor: tuple = (0.5, 0.5, 0.5)
    deformable_levels: int = 3
    deformable_iterations: int = 200
    deformable_alpha: float = 0.02
    initial_grid_size: float = 100.0
    bbox_margin: float = 0.1
    stat_interval: int = 10
    inlier_threshold: float = 0.5
    guarantee_diffeomorphism: bool = True
    max_displacement_ratio: float = 0.4
    landmarks_constraint_weight: float = 50.0
    n_fixed: int = 0
    use_ransac: bool = True
    ransac_iterations: int = 5000
    ransac_inlier_distance: float = 50.0
    ransac_max_scale: float = 10.0
    em_max_iterations: int = 10000
    em_epsilon: float = 1e-6
    # Per-image EM sample cap: the reference's Stats::maxSize defaults to
    # 10000 (stats.cxx:10, -ss frog.cxx:40); None = full-sample EM (no
    # reference equivalent — strictly more statistics work).
    em_max_samples: int | None = 10000
    max_grids_per_level: int = 50
    checkpoint_path: str | None = None
    checkpoint_interval: int = 1  # in completed chunks
    transform_subdirectory: str = "transforms"
    error_maps_subdirectory: str = "errorMaps"
    measures_file: str = "measures.csv"
    single_file_transforms: bool = False
    write_pairs: bool = False
    verbose: bool = True
    # Fire background compiles of every stage executable at predicted
    # shapes when the run starts (utils/aot.py): the serial inline chain
    # of ~20 s remote-service compiles collapses to roughly one.
    aot_warm: bool = True
    # -dlinear / -dstats debug prints (imageGroup.cxx:47-48,60-62,95).
    # The reference prints every iteration; here stages are single fused
    # dispatches, so these fire at every chunk boundary (where the arrays
    # are on host anyway) instead of per iteration.
    display_linear: bool = False
    display_stats: bool = False
    # EM subsampling mode when em_max_samples is set: "stride" (default,
    # deterministic) or "reservoir" (reproduces the reference's random
    # acceptance sampling, stats.h:36-76)
    em_sampling: str = "stride"
    # Force the link-table row width (state.py virtual rows); None picks
    # the gather-tile-minimizing width automatically.
    links_per_row: int | None = None
    # Static device-histogram width (bin = 1 unit, stats.cxx:121-131);
    # distances beyond the last bin clip into it, the host trims trailing
    # zero columns so the CSV output matches the reference's dynamic width.
    histogram_bins: int = 2048


@dataclasses.dataclass
class Measure:
    E: float
    landmark_av: float = 0.0
    landmark_max: float = 0.0
    landmark_std: float = 0.0


class GroupRegistration:
    def __init__(
        self,
        graph: PairGraph,
        config: GroupConfig | None = None,
        landmarks: dict | None = None,
        constraint_landmarks: dict | None = None,
        fixed_chains: list | None = None,
        output_dir: str = ".",
        mesh=None,
    ):
        self.config = config or GroupConfig()
        self.output_dir = output_dir
        self.mesh = mesh
        self.arrays, self.meta = build_group_state(
            graph,
            n_fixed=self.config.n_fixed,
            landmarks=landmarks,
            constraint_landmarks=constraint_landmarks,
            links_per_row=self.config.links_per_row,
        )
        self.n_real = self.arrays.n_images
        if mesh is not None:
            from ..parallel.mesh import pad_group, shard_group_arrays

            n_dev = mesh.devices.size
            if self.arrays.n_images % n_dev:
                # pad the image axis with empty (non-movable) images so it
                # shards evenly; n_real keeps the hubless-mean divisor and
                # every output loop on the true count
                self.arrays, _ = pad_group(self.arrays, n_dev)
                self.meta.movable = np.concatenate(
                    [
                        self.meta.movable,
                        np.zeros(self.arrays.n_images - self.n_real, bool),
                    ]
                )
            self.arrays = shard_group_arrays(self.arrays, mesh)
        self.movable = jnp.asarray(self.meta.movable)
        self._lm_device = self._build_landmark_indices()
        self._last_report = None
        self.measures: list[Measure] = []
        self.stats_record: dict = {}
        # Host-side chains (one per image); fixed images keep their loaded
        # chain, movable ones are built up during the run.
        n = self.arrays.n_images
        self.chains: list[TransformChain | None] = [None] * n
        if fixed_chains:
            for i, c in enumerate(fixed_chains):
                self.chains[i] = c
        if self.config.n_fixed:
            self._apply_fixed_chains(fixed_chains)

    # ------------------------------------------------------------------ setup

    def _apply_fixed_chains(self, fixed_chains):
        """Bake fixed images' saved transforms into xyz
        (imageGroup.cxx:1419-1456)."""
        xyz = np.array(self.meta.xyz_host)
        if xyz.shape[0] < self.arrays.n_images:  # mesh-padded image axis
            pad = np.zeros(
                (self.arrays.n_images - xyz.shape[0], *xyz.shape[1:]), xyz.dtype
            )
            xyz = np.concatenate([xyz, pad], axis=0)
        for i in range(self.config.n_fixed):
            chain = self.chains[i]
            if chain is None:
                chain = TransformChain(transforms=(Affine(matrix=jnp.eye(4)),))
                self.chains[i] = chain
            pts = jnp.asarray(xyz[i])
            xyz[i] = np.asarray(chain(pts))
        self.meta.xyz_host = xyz
        self.arrays = dataclasses.replace(
            self.arrays, xyz=jnp.asarray(xyz), xyz2=jnp.asarray(xyz)
        )

    def _setup_linear_transforms(self):
        """Anchor-alignment translation init (imageGroup.cxx:806-848).

        Works off the host mirror of the initial coordinates — no device
        readback (a remote-TPU round trip) for a host-side loop."""
        xyz = self.meta.xyz_host
        valid = self.meta.point_valid_host
        n = self.arrays.n_images
        anchors = np.zeros((n, 3))
        c = np.asarray(self.config.linear_anchor)
        for i in range(self.n_real):
            pts = xyz[i][valid[i]]
            lo, hi = pts.min(0), pts.max(0)
            anchors[i] = (1 - c) * lo + c * hi
        # The reference averages the anchors of the first
        # (N - n_fixed) images (imageGroup.cxx:822-824): with no fixed
        # images this is everyone; in fixed mode those are exactly the
        # already-registered images, i.e. the target space.
        n_ref = self.n_real - self.config.n_fixed
        avg = anchors[:n_ref].mean(axis=0)
        affine = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        for i in range(self.config.n_fixed, self.n_real):
            affine[i, :3, 3] = avg - anchors[i]
        self._affine_host = affine  # host mirror for shape prediction
        self.arrays = dataclasses.replace(self.arrays, affine=jnp.asarray(affine))

    # ------------------------------------------------------------ device steps

    @staticmethod
    @jax.jit
    def _transform_affine(arrays: GroupArrays) -> GroupArrays:
        xyz2 = kernels.transform_points_affine(arrays.affine, arrays.xyz)
        return dataclasses.replace(arrays, xyz2=xyz2)

    @staticmethod
    @jax.jit
    def _link_distances(arrays: GroupArrays):
        _, _, dist = kernels.link_geometry(arrays)
        return dist.reshape(arrays.n_images, -1)

    def _link_valid_flat(self):
        return self.arrays.link_valid.reshape(self.arrays.n_images, -1)

    def _em_stride(self) -> int:
        """Static subsampling stride approximating the reference's 10k
        reservoir (stats.h:36-76) when ``em_max_samples`` is set."""
        cap = self.config.em_max_samples
        if self.config.em_sampling == "reservoir":
            return 1
        n_links = (
            self.arrays.link_dst.shape[1] * self.arrays.link_dst.shape[2]
        )
        if cap and n_links > cap:
            return -(-n_links // cap)
        return 1

    def _em_reservoir(self) -> int:
        """Cap for the reference-parity random acceptance sampling mode
        (stats.h:58-76); 0 disables it."""
        cfg = self.config
        if cfg.em_sampling == "reservoir" and cfg.em_max_samples:
            return int(cfg.em_max_samples)
        return 0

    def _update_stats(self):
        """EM re-estimation over current link distances
        (imageGroup.cxx:569-598) as a standalone dispatch — used outside
        the fused stage scans (RANSAC path); inside stages the same math
        runs on-device via kernels.em_reestimate.
        """
        cap = self._em_reservoir()
        if cap:
            em = jax.jit(kernels.em_reestimate, static_argnums=(3, 5, 6))(
                self.arrays,
                self.arrays.xyz2,
                self.arrays.em,
                self.config.em_max_iterations,
                self.config.em_epsilon,
                1,
                cap,
            )
            self.arrays = dataclasses.replace(self.arrays, em=em)
            return
        dist = self._link_distances(self.arrays)
        valid = self._link_valid_flat()
        stride = self._em_stride()
        if stride > 1:
            dist = dist[:, ::stride]
            valid = valid[:, ::stride]
        em = estimate_mixture(
            dist,
            valid,
            self.arrays.em,
            max_iterations=self.config.em_max_iterations,
            epsilon=self.config.em_epsilon,
        )
        self.arrays = dataclasses.replace(self.arrays, em=em)

    # ------------------------------------------------------------- measurement

    def _build_landmark_indices(self):
        """Device-side landmark index arrays for in-scan stat computation."""
        if not self.meta.landmarks:
            return None
        p = self.arrays.points_per_image
        flat = []
        seg = []
        for g, (name, entries) in enumerate(sorted(self.meta.landmarks.items())):
            for img, pt in entries:
                flat.append(img * p + pt)
                seg.append(g)
        if not flat:
            return None
        return (
            jnp.asarray(flat, jnp.int32),
            jnp.asarray(seg, jnp.int32),
            len(self.meta.landmarks),
        )

    def _record_chunk(self, measures):
        """Record per-iteration measures from a chunk's packed (K, 5)
        device output [E, ok, lm_mean, lm_max, lm_std] — ONE device->host
        transfer per stage chunk."""
        measures = np.asarray(measures)
        es = measures[:, 0]
        stats = measures[:, 2:5]
        n = int(measures[:, 1].sum())
        for k in range(n):
            e = float(es[k])
            if np.isnan(e):
                raise FloatingPointError(
                    "energy is NaN (imageGroup.cxx:1233-1236)"
                )
            m = Measure(E=e)
            if self._lm_device is not None:
                m.landmark_av = float(stats[k, 0])
                m.landmark_max = float(stats[k, 1])
                m.landmark_std = float(stats[k, 2])
            self.measures.append(m)
        if self.config.verbose and n:
            m = self.measures[-1]
            msg = f"E = {m.E:.6g}"
            if self._lm_device is not None:
                msg += (
                    f", landmarks: max={m.landmark_max:.4g}"
                    f", average={m.landmark_av:.4g}, stdev={m.landmark_std:.4g}"
                )
            print(msg)
        return n

    def _landmark_stats(self):
        if not self.meta.landmarks:
            return None
        xyz2 = np.asarray(self.arrays.xyz2)
        dists = []
        for name, entries in self.meta.landmarks.items():
            if not entries:
                continue
            pos = np.stack([xyz2[img, pt] for img, pt in entries])
            center = pos.mean(axis=0)
            dists.extend(np.linalg.norm(pos - center, axis=1).tolist())
        if not dists:
            return None
        d = np.asarray(dists)
        return float(d.mean()), float(d.max()), float(d.std())

    def _record_measure(self, e: float):
        if np.isnan(e):
            raise FloatingPointError("energy is NaN (imageGroup.cxx:1233-1236)")
        m = Measure(E=float(e))
        ls = self._landmark_stats()
        if ls:
            m.landmark_av, m.landmark_max, m.landmark_std = ls
        self.measures.append(m)
        if self.config.verbose:
            msg = f"E = {m.E:.6g}"
            if ls:
                msg += (
                    f", landmarks: max={m.landmark_max:.4g}"
                    f", average={m.landmark_av:.4g}, stdev={m.landmark_std:.4g}"
                )
            print(msg)

    def _display_debug(self):
        if self.config.display_stats:
            self.display_stats()
        if self.config.display_linear:
            self.display_linear_transforms()

    def display_linear_transforms(self):
        """-dlinear: per-image translation and scale
        (imageGroup.cxx:600-627)."""
        affine = np.asarray(self.arrays.affine)
        for i in range(self.config.n_fixed, self.n_real):
            t = affine[i, :3, 3]
            s = np.diagonal(affine[i])[:3]
            print(f"Image {i}, translation={t[0]:g} {t[1]:g} {t[2]:g}")
            print(f"scale={s[0]:g} {s[1]:g} {s[2]:g}")

    def display_stats(self):
        """-dstats: per-image EM parameters + sample moments
        (imageGroup.cxx:899-906, stats.cxx:72-93)."""
        dist = np.asarray(self._link_distances(self.arrays))
        valid = np.asarray(self._link_valid_flat())
        em = np.asarray(self.arrays.em)
        for i in range(self.n_real):
            d = dist[i][valid[i]]
            n = len(d)
            mx = float(d.max()) if n else 0.0
            mean = float(d.mean()) if n else 0.0
            std = float(d.std()) if n else 0.0
            print(
                f"c1={em[i, 0]:g},c2={em[i, 1]:g},r={em[i, 2]:g},"
                f"nSamples={n},max={mx:g},mean={mean:g},stdev={std:g}"
            )

    # ------------------------------------------------------------ state report

    def _refresh_report(self):
        """One dispatch + ONE device->host transfer for everything the
        host needs between stages: movable/global bounding boxes, inlier
        census, EM parameters, distance histograms.  The fused stage
        scans return this same vector with their measures (ONE readback),
        so an explicit dispatch is only needed when the state changed
        outside a stage (RANSAC, resume, standalone queries)."""
        cfg = self.config
        vec = np.asarray(
            _jit_state_report(
                self.arrays,
                self.movable,
                jnp.float32(cfg.inlier_threshold),
                cfg.histogram_bins,
            )
        )
        return self._parse_report(vec)

    def _parse_report(self, vec):
        n = self.arrays.n_images
        b = self.config.histogram_bins
        census = vec[12 : 12 + 3 * n].reshape(n, 3)
        em = vec[12 + 3 * n : 12 + 6 * n].reshape(n, 3)
        hist = vec[12 + 6 * n :].reshape(n, b)
        # trim trailing all-zero bins to match the reference's dynamic width
        nz = np.nonzero(hist.any(axis=0))[0]
        hist = hist[:, : (nz[-1] + 1)] if nz.size else hist[:, :1]
        self._last_report = {
            "bbox_mov": (vec[0:3].astype(np.float64), vec[3:6].astype(np.float64)),
            "bbox_all": (vec[6:9].astype(np.float64), vec[9:12].astype(np.float64)),
            "census": census.astype(np.int64),
            "em": em,
            "hist": hist.astype(np.int64),
        }
        return self._last_report

    def count_inliers(self):
        """Inlier/outlier census + per-image stats record
        (imageGroup.cxx:988-1060).  Counting runs on device; the numbers
        arrive with the packed state report."""
        report = self._last_report or self._refresh_report()
        census = report["census"]
        em_np = report["em"]
        images = []
        n_pairs = n_in = n_out = 0
        for i in range(self.n_real):
            if i >= self.config.n_fixed:
                pairs_i, inl, out = (int(v) for v in census[i])
                n_pairs += pairs_i
                n_in += inl
                n_out += out
            else:
                pairs_i = inl = out = 0
            images.append(
                {
                    "points": int(self.meta.n_points[i]),
                    "pairs": pairs_i,
                    "inliers": inl,
                    "outliers": out,
                    "EMStats": {
                        "c1": float(em_np[i, 0]),
                        "c2": float(em_np[i, 1]),
                        "ratio": float(em_np[i, 2]),
                    },
                }
            )
        self.stats_record["images"] = images
        self.stats_record["halfPairs"] = n_pairs
        self.stats_record["inliers"] = n_in
        self.stats_record["outliers"] = n_out
        self.stats_record["outlierRatio"] = n_out / max(n_pairs, 1)
        if self.config.verbose:
            print(
                f"Stats: {n_pairs} half pairs, {n_in} inliers, {n_out} outliers"
                f" ({100.0 * n_out / max(n_pairs, 1):.2f}% outliers)"
            )

    # ------------------------------------------------------------------- run

    def run(self, resume_from: str | None = None):
        if resume_from:
            from .checkpoint import restore_registration

            meta, coeffs = restore_registration(self, resume_from)
            if meta.get("linear_histograms") is not None:
                self.linear_histograms = np.asarray(meta["linear_histograms"])
            if meta["stage"] == "linear":
                self._run_linear(it0=int(meta["it"]))
                self._after_linear()
                self._run_deformable()
            else:
                self.grids_per_level = [int(v) for v in meta.get("done_levels", [])]
                level = int(meta["level"])
                n = self._run_level(
                    level,
                    coeffs0=coeffs,
                    it0=int(meta["it"]),
                    alpha0=float(meta["alpha"]),
                    n_grids0=int(meta["n_grids"]),
                    n_diffeo0=int(meta["n_diffeo"]),
                )
                self.grids_per_level.append(n)
                for lvl in range(level + 1, self.config.deformable_levels):
                    self.grids_per_level.append(self._run_level(lvl))
            return self._finish()
        return self._run_fresh()

    def _warm_stages(self):
        """Background-compile the linear stage, the state report, and
        every deformable level's basis/stage/apply executables at
        PREDICTED shapes (utils/aot.py) — stage scans take a dynamic
        ``n_live``, so warming with ``n_live=0`` compiles the exact
        executable while executing nothing.  Grid dims are predicted from
        the anchor-aligned host bbox; a level whose true post-linear dims
        differ simply compiles inline as before (prediction is only a
        cold-start optimization, never a correctness input)."""
        cfg = self.config
        if jax.default_backend() == "cpu":
            return  # warming targets the remote-compile TPU path
        from ..transforms.bspline import grid_from_bbox
        from ..utils import aot

        lm = self._lm_device
        if cfg.linear_iterations and not (cfg.use_ransac and cfg.n_fixed):
            aot.warm(
                _jit_linear_stage,
                self.arrays, self.movable, jnp.float32(cfg.linear_alpha),
                cfg.use_scale, cfg.linear_iterations, jnp.int32(0),
                jnp.int32(0), cfg.stat_interval, cfg.em_max_iterations,
                cfg.em_epsilon, self._em_stride(), lm, self._em_reservoir(),
                cfg.inlier_threshold, cfg.histogram_bins,
            )
        aot.warm(
            _jit_state_report,
            self.arrays, self.movable, jnp.float32(cfg.inlier_threshold),
            cfg.histogram_bins,
        )
        if not cfg.deformable_levels:
            return
        # predicted post-linear bbox: anchor-aligned host coordinates
        xyz = self.meta.xyz_host
        valid = self.meta.point_valid_host
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for i in range(cfg.n_fixed, self.n_real):
            pts = xyz[i][valid[i]] + self._affine_host[i, :3, 3]
            lo = np.minimum(lo, pts.min(0))
            hi = np.maximum(hi, pts.max(0))
        n = self.arrays.n_images
        constraint_weight = self.n_real * cfg.landmarks_constraint_weight
        subtract_mean = cfg.n_fixed == 0

        def warm_level(level):
            size = cfg.initial_grid_size / (2.0**level)
            dims, origin, spacing = grid_from_bbox(
                lo, hi, size, margin=cfg.bbox_margin
            )
            origin_d = jnp.asarray(origin, jnp.float32)
            spacing_d = jnp.asarray(spacing, jnp.float32)
            basis = _jit_basis(origin_d, spacing_d, dims, self.arrays.xyz)
            coeffs = jnp.zeros((n, *dims, 3), jnp.float32)
            _jit_apply_sep(coeffs, basis, self.arrays.xyz)
            return _jit_deformable_stage(
                self.arrays, self.movable, coeffs, basis,
                jnp.asarray(cfg.max_displacement_ratio * np.asarray(spacing),
                            jnp.float32),
                jnp.float32(cfg.deformable_alpha), cfg.inlier_threshold,
                constraint_weight, subtract_mean,
                cfg.guarantee_diffeomorphism, cfg.deformable_iterations,
                jnp.int32(0), jnp.int32(0), cfg.stat_interval,
                cfg.em_max_iterations, cfg.em_epsilon, self._em_stride(),
                lm, self._em_reservoir(), self.n_real,
                self.meta.has_constraints, cfg.histogram_bins,
            )

        for level in range(cfg.deformable_levels):
            aot.warm(
                warm_level,
                level,
                # the closure captures shapes: key them explicitly so a
                # repeat registration skips the warm-up execution but a
                # different graph/config still warms
                key=(
                    "warm_level", level, tuple(self.arrays.xyz.shape),
                    tuple(self.arrays.link_dst.shape),
                    cfg.initial_grid_size, cfg.bbox_margin,
                    cfg.deformable_iterations, cfg.stat_interval,
                    cfg.guarantee_diffeomorphism, cfg.histogram_bins,
                    self._em_stride(), self._em_reservoir(),
                    tuple(np.round(lo, 3)), tuple(np.round(hi, 3)),
                ),
            )

    def _run_fresh(self):
        cfg = self.config
        self._setup_linear_transforms()
        if cfg.aot_warm:
            self._warm_stages()
        self.arrays = self._transform_affine(self.arrays)

        if cfg.use_ransac and cfg.n_fixed:
            from .ransac import ransac_register_images

            self.arrays, ransac_stats = ransac_register_images(
                self.arrays, self.meta, cfg
            )
            self.stats_record["RANSAC"] = ransac_stats
            self.arrays = self._transform_affine(self.arrays)
            self._update_stats()
        else:
            if cfg.verbose:
                print("Linear registration")
            self._run_linear()

        self._after_linear()
        self._run_deformable()
        return self._finish()

    def _run_linear(self, it0: int = 0):
        """The whole linear stage is ONE device dispatch (EM included) —
        on a remote TPU every host<->device sync costs a network RTT."""
        cfg = self.config
        total = cfg.linear_iterations
        if it0 >= total:
            return
        affine, xyz2, em, packed = _jit_linear_stage(
            self.arrays,
            self.movable,
            jnp.float32(cfg.linear_alpha),
            cfg.use_scale,
            total,
            jnp.int32(it0),
            jnp.int32(total - it0),
            cfg.stat_interval,
            cfg.em_max_iterations,
            cfg.em_epsilon,
            self._em_stride(),
            self._lm_device,
            self._em_reservoir(),
            cfg.inlier_threshold,
            cfg.histogram_bins,
        )
        self.arrays = dataclasses.replace(
            self.arrays, affine=affine, xyz2=xyz2, em=em
        )
        vec = np.asarray(packed)
        self._record_chunk(vec[: total * 5].reshape(total, 5))
        self._parse_report(vec[total * 5:])
        self._display_debug()
        self._maybe_checkpoint("linear", it=total)

    def _after_linear(self):
        # Bake the linear stage and snapshot the chains.
        cfg = self.config
        self._bake()
        for i in range(cfg.n_fixed, self.n_real):
            self.chains[i] = TransformChain(
                transforms=(Affine(matrix=self.arrays.affine[i]),)
            )
        if self._last_report is None:  # RANSAC path: no fused report yet
            self._refresh_report()
        self.linear_histograms = self._last_report["hist"]

    def _run_deformable(self):
        cfg = self.config
        self.grids_per_level = []
        if cfg.deformable_levels:
            if cfg.verbose:
                print("Deformable registration")
            self.count_inliers()
            for level in range(cfg.deformable_levels):
                self.grids_per_level.append(self._run_level(level))

    def _finish(self):
        if self.config.deformable_levels:
            self.count_inliers()
        self.final_histograms = self._last_report["hist"]
        if "images" not in self.stats_record:
            self.count_inliers()
        self.stats_record["bbox"] = self._bbox_record()
        return self

    def _maybe_checkpoint(self, stage: str, coeffs=None, **progress):
        cfg = self.config
        if not cfg.checkpoint_path:
            return
        self._chunk_counter = getattr(self, "_chunk_counter", 0) + 1
        if self._chunk_counter % cfg.checkpoint_interval:
            return
        from .checkpoint import save_checkpoint

        if hasattr(self, "linear_histograms"):
            progress["linear_histograms"] = self.linear_histograms
        progress["done_levels"] = getattr(self, "grids_per_level", [])
        save_checkpoint(self, cfg.checkpoint_path, stage, coeffs=coeffs, **progress)

    def _run_level(
        self,
        level: int,
        coeffs0=None,
        it0: int = 0,
        alpha0: float | None = None,
        n_grids0: int = 1,
        n_diffeo0: int = 0,
    ) -> int:
        """One deformable level with the stacked-grid diffeomorphism
        guarantee (imageGroup.cxx:78-128).  The optional arguments restart
        the level mid-way from a checkpoint."""
        cfg = self.config
        n = self.arrays.n_images
        size = cfg.initial_grid_size / (2.0**level)
        report = self._last_report or self._refresh_report()
        lo, hi = report["bbox_mov"]
        dims, origin, spacing = grid_from_bbox(lo, hi, size, margin=cfg.bbox_margin)
        if cfg.verbose:
            print(
                f"Level {level + 1}/{cfg.deformable_levels}: grid dims {dims},"
                f" spacing {np.round(spacing, 3).tolist()}"
            )
        coeffs = (
            jnp.zeros((n, *dims, 3), jnp.float32) if coeffs0 is None else coeffs0
        )
        origin_d = jnp.asarray(origin, jnp.float32)
        spacing_d = jnp.asarray(spacing, jnp.float32)
        limit = jnp.asarray(
            cfg.max_displacement_ratio * np.asarray(spacing), jnp.float32
        )
        constraint_weight = self.n_real * cfg.landmarks_constraint_weight
        subtract_mean = cfg.n_fixed == 0
        alpha = cfg.deformable_alpha if alpha0 is None else alpha0
        n_grids = n_grids0
        n_diffeo_iters = n_diffeo0

        # The separable B-spline basis depends only on the *baked*
        # positions: computed once per grid instantiation, reused by every
        # iteration's scatter and transform (TPU: pure matmuls after this).
        basis = _jit_basis(origin_d, spacing_d, dims, self.arrays.xyz)
        if coeffs0 is None:
            # xyz2 = xyz under the fresh zero grid.
            self.arrays = dataclasses.replace(self.arrays, xyz2=self.arrays.xyz)
        else:
            self.arrays = dataclasses.replace(
                self.arrays,
                xyz2=_jit_apply_sep(coeffs, basis, self.arrays.xyz),
            )

        total = cfg.deformable_iterations
        it = it0
        while it < total:
            # One dispatch runs the remaining level (EM in-scan); a guard
            # trip short-circuits the rest of the scan, and the relaunch
            # with a fresh grid reuses the same executable (static n_steps,
            # dynamic it0/n_live).
            new_coeffs, xyz2, em, packed = _jit_deformable_stage(
                self.arrays,
                self.movable,
                coeffs,
                basis,
                limit,
                jnp.float32(alpha),
                cfg.inlier_threshold,
                constraint_weight,
                subtract_mean,
                cfg.guarantee_diffeomorphism,
                total,
                jnp.int32(it),
                jnp.int32(total - it),
                cfg.stat_interval,
                cfg.em_max_iterations,
                cfg.em_epsilon,
                self._em_stride(),
                self._lm_device,
                self._em_reservoir(),
                self.n_real,
                self.meta.has_constraints,
                cfg.histogram_bins,
            )
            vec = np.asarray(packed)
            n_done = self._record_chunk(vec[: total * 5].reshape(total, 5))
            self._parse_report(vec[total * 5:])
            self._display_debug()
            coeffs = new_coeffs
            self.arrays = dataclasses.replace(self.arrays, xyz2=xyz2, em=em)
            it += n_done
            n_diffeo_iters += n_done
            if it < total:
                # An iteration tripped the guard: bake the grid as-is,
                # stack a fresh one, retry (imageGroup.cxx:97-115).
                if n_diffeo_iters == 0:
                    alpha /= 2
                    if cfg.verbose:
                        print(f"Halving alpha. New value: {alpha}")
                if cfg.verbose:
                    print("Diffeomorphism not guaranteed: stacking a new grid")
                if n_grids >= cfg.max_grids_per_level:
                    raise RuntimeError(
                        f"level {level}: exceeded {cfg.max_grids_per_level} grids"
                    )
                n_grids += 1
                self._freeze_grid(coeffs, origin, spacing)
                self._bake_bspline(coeffs, basis)
                basis = _jit_basis(origin_d, spacing_d, dims, self.arrays.xyz)
                coeffs = jnp.zeros((n, *dims, 3), jnp.float32)
                self.arrays = dataclasses.replace(
                    self.arrays, xyz2=self.arrays.xyz
                )
                n_diffeo_iters = 0
            self._maybe_checkpoint(
                "deformable",
                coeffs=coeffs,
                it=it,
                level=level,
                alpha=alpha,
                n_grids=n_grids,
                n_diffeo=n_diffeo_iters,
            )

        self._freeze_grid(coeffs, origin, spacing)
        self._bake_bspline(coeffs, basis)
        if self.config.verbose:
            print(f"Number of grids for this level: {n_grids}")
        self._last_level_geometry = (dims, origin, spacing)
        return n_grids

    # --------------------------------------------------------------- plumbing

    def _movable_bbox(self):
        report = self._last_report or self._refresh_report()
        return report["bbox_mov"]

    def _bbox_record(self):
        report = self._last_report or self._refresh_report()
        lo, hi = report["bbox_all"]
        return [list(map(float, lo)), list(map(float, hi))]

    def _bake(self):
        self.arrays = dataclasses.replace(self.arrays, xyz=self.arrays.xyz2)

    def _bake_bspline(self, coeffs, basis):
        xyz2 = _jit_apply_sep(coeffs, basis, self.arrays.xyz)
        self.arrays = dataclasses.replace(self.arrays, xyz=xyz2, xyz2=xyz2)

    def _freeze_grid(self, coeffs, origin, spacing):
        """Append the current grid's coefficients to every movable image's
        chain.  The per-image coefficient slices stay on device — output
        writers pull them at save time, outside the optimization loop."""
        origin_d = jnp.asarray(origin, jnp.float32)
        spacing_d = jnp.asarray(spacing, jnp.float32)
        for i in range(self.config.n_fixed, self.n_real):
            grid = BSpline(
                coeffs=coeffs[i], origin=origin_d, spacing=spacing_d
            )
            self.chains[i] = self.chains[i].append(grid)

    # ---------------------------------------------------------------- outputs

    def save_outputs(self, out_dir: str | None = None):
        from .outputs import save_all

        save_all(self, out_dir or self.output_dir)
        return self


@partial(jax.jit, static_argnames=("use_scale",))
def _jit_linear_update(arrays, movable, alpha, use_scale):
    return kernels.linear_update(arrays, movable, alpha, use_scale)


_jit_census = jax.jit(kernels.inlier_census)


@partial(
    jax.jit,
    static_argnames=(
        "use_scale",
        "n_steps",
        "stat_interval",
        "em_iters",
        "em_epsilon",
        "em_stride",
        "lm_n",
        "em_reservoir",
        "report_bins",
    ),
)
def _jit_linear_stage_impl(
    arrays,
    movable,
    alpha,
    use_scale,
    n_steps,
    it0,
    n_live,
    stat_interval,
    em_iters,
    em_epsilon,
    em_stride,
    lm_flat,
    lm_seg,
    lm_n,
    em_reservoir,
    inlier_threshold,
    report_bins,
):
    lm = None if lm_flat is None else (lm_flat, lm_seg, lm_n)
    return kernels.linear_stage(
        arrays,
        movable,
        alpha,
        use_scale,
        n_steps,
        it0,
        n_live,
        stat_interval,
        em_iters,
        em_epsilon,
        em_stride,
        lm,
        em_reservoir,
        inlier_threshold,
        report_bins,
    )


def _jit_linear_stage(
    arrays,
    movable,
    alpha,
    use_scale,
    n_steps,
    it0,
    n_live,
    stat_interval,
    em_iters,
    em_epsilon,
    em_stride,
    lm,
    em_reservoir=0,
    inlier_threshold=0.5,
    report_bins=0,
):
    lm_flat, lm_seg, lm_n = (None, None, 0) if lm is None else lm
    return _jit_linear_stage_impl(
        arrays,
        movable,
        alpha,
        use_scale,
        n_steps,
        it0,
        n_live,
        stat_interval,
        em_iters,
        em_epsilon,
        em_stride,
        lm_flat,
        lm_seg,
        lm_n,
        em_reservoir,
        jnp.float32(inlier_threshold),
        report_bins,
    )


@partial(
    jax.jit,
    static_argnames=(
        "subtract_mean",
        "guarantee",
        "n_steps",
        "stat_interval",
        "em_iters",
        "em_epsilon",
        "em_stride",
        "lm_n",
        "em_reservoir",
        "n_real",
        "has_constraints",
        "report_bins",
    ),
)
def _jit_deformable_stage_impl(
    arrays,
    movable,
    coeffs,
    basis,
    limit,
    alpha,
    inlier_threshold,
    constraint_weight,
    subtract_mean,
    guarantee,
    n_steps,
    it0,
    n_live,
    stat_interval,
    em_iters,
    em_epsilon,
    em_stride,
    lm_flat,
    lm_seg,
    lm_n,
    em_reservoir,
    n_real,
    has_constraints,
    report_bins,
):
    lm = None if lm_flat is None else (lm_flat, lm_seg, lm_n)
    return kernels.deformable_stage(
        arrays,
        movable,
        coeffs,
        basis,
        limit,
        alpha,
        inlier_threshold,
        constraint_weight,
        subtract_mean,
        guarantee,
        n_steps,
        it0,
        n_live,
        stat_interval,
        em_iters,
        em_epsilon,
        em_stride,
        lm,
        em_reservoir,
        n_real,
        has_constraints,
        report_bins,
    )


def _jit_deformable_stage(
    arrays,
    movable,
    coeffs,
    basis,
    limit,
    alpha,
    inlier_threshold,
    constraint_weight,
    subtract_mean,
    guarantee,
    n_steps,
    it0,
    n_live,
    stat_interval,
    em_iters,
    em_epsilon,
    em_stride,
    lm,
    em_reservoir=0,
    n_real=None,
    has_constraints=True,
    report_bins=0,
):
    lm_flat, lm_seg, lm_n = (None, None, 0) if lm is None else lm
    return _jit_deformable_stage_impl(
        arrays,
        movable,
        coeffs,
        basis,
        limit,
        alpha,
        inlier_threshold,
        constraint_weight,
        subtract_mean,
        guarantee,
        n_steps,
        it0,
        n_live,
        stat_interval,
        em_iters,
        em_epsilon,
        em_stride,
        lm_flat,
        lm_seg,
        lm_n,
        em_reservoir,
        n_real,
        has_constraints,
        report_bins,
    )


@partial(jax.jit, static_argnames=("n_bins",))
def _jit_state_report(arrays, movable, inlier_threshold, n_bins):
    return kernels.state_report(arrays, movable, inlier_threshold, n_bins)


@partial(jax.jit, static_argnames=("dims",))
def _jit_basis(origin, spacing, dims, xyz):
    return kernels.bspline_basis(origin, spacing, dims, xyz)


_jit_apply_sep = jax.jit(kernels.bspline_apply_sep)


@partial(jax.jit, static_argnames=("subtract_mean",))
def _jit_deformable_update(
    arrays,
    movable,
    coeffs,
    basis,
    limit,
    alpha,
    inlier_threshold,
    constraint_weight,
    subtract_mean,
):
    return kernels.deformable_update(
        arrays,
        movable,
        coeffs,
        basis,
        limit,
        alpha,
        inlier_threshold,
        constraint_weight,
        subtract_mean,
    )
