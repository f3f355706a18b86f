"""Local web app server — the interactive L5 layer.

The reference ships four three.js registration apps on top of a desk
client/server action framework (js/groupwiseDeformableRegistration.js,
js/groupwiseRigidRegistration.js, js/pairwiseRigidRegistration.js,
js/stochasticRigidRegistration.js) and a browser API object
(js/lib/FROG.js:8-305) whose progress events are literally the server
binaries' stdout lines. The TPU-native equivalent keeps that exact
contract with none of the desk machinery: a stdlib HTTP server runs the
existing jax pipeline in job threads, routes each job's stdout lines to
a Server-Sent-Events stream (the same lines the reference apps parse:
"Image i, translation=...", "E = ...", "match3d (i,j): ..."), and serves
self-contained HTML apps plus a browser `FROG` API (webapp/frog.js) with
the reference's method and event surface.

Run with `frog-tpu serve <data-root>` and open http://localhost:<port>/.
"""
from __future__ import annotations

import dataclasses
import io
import json
import os
import struct
import sys
import threading
import time
import traceback
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["FrogServer", "serve"]

_WEBAPP_DIR = os.path.join(os.path.dirname(__file__), "webapp")
_VOLUME_EXT = (".nii.gz", ".nii", ".mhd")


# --------------------------------------------------------------- stdout tee

class _ThreadRouter(io.TextIOBase):
    """sys.stdout replacement that routes writes by thread: job threads
    registered in `sinks` get their lines captured (the reference's
    desk-action `listener` hook on child stdout), everything else passes
    through to the real stdout."""

    def __init__(self, real):
        self.real = real
        self.sinks = {}  # thread ident -> callable(line)
        self._bufs = {}

    def write(self, s):
        sink = self.sinks.get(threading.get_ident())
        if sink is None:
            return self.real.write(s)
        buf = self._bufs.setdefault(threading.get_ident(), "") + s
        *lines, rest = buf.split("\n")
        self._bufs[threading.get_ident()] = rest
        for line in lines:
            sink(line)
        return len(s)

    def flush(self):
        self.real.flush()


_router = None
_router_lock = threading.Lock()


def _install_router():
    """(Re-)install the router as sys.stdout.  Re-checked on every job
    start because test harnesses (pytest capture) swap sys.stdout out
    underneath long-lived servers; re-wrapping the current stream keeps
    the job sinks working regardless."""
    global _router
    with _router_lock:
        if _router is None:
            _router = _ThreadRouter(sys.stdout)
        if sys.stdout is not _router:
            _router.real = sys.stdout
            sys.stdout = _router
    return _router


# ------------------------------------------------------------------- jobs

class Job:
    def __init__(self, job_id: str, kind: str, params: dict, work_dir: str):
        self.id = job_id
        self.kind = kind
        self.params = params
        self.dir = work_dir
        self.status = "running"
        self.result = None
        self.error = None
        self.channel = "log"
        self.events = []  # list of dicts, replayed to late SSE clients
        self.cond = threading.Condition()

    def emit(self, type_: str, **kw):
        evt = {"type": type_, "channel": self.channel, **kw}
        with self.cond:
            self.events.append(evt)
            self.cond.notify_all()

    def line(self, text: str):
        self.emit("line", text=text)

    def finish(self, result=None, error=None):
        with self.cond:
            self.status = "error" if error else "done"
            self.result = result
            self.error = error
            self.events.append(
                {"type": "error", "message": error}
                if error
                else {"type": "done", "result": result}
            )
            self.cond.notify_all()


class JobManager:
    """Runs jobs sequentially on worker threads (one device — concurrent
    jax jobs would just contend), streaming their stdout into the job's
    event buffer."""

    def __init__(self, work_root: str):
        self.work_root = work_root
        self.jobs: dict[str, Job] = {}
        self._n = 0
        self._lock = threading.Lock()
        self._run_lock = threading.Lock()

    def start(self, kind: str, params: dict, runner) -> Job:
        with self._lock:
            self._n += 1
            job_id = f"{self._n:04d}-{kind}"
        work = os.path.join(self.work_root, job_id)
        os.makedirs(work, exist_ok=True)
        job = Job(job_id, kind, params, work)
        self.jobs[job_id] = job
        router = _install_router()

        def main():
            router.sinks[threading.get_ident()] = job.line
            try:
                with self._run_lock:
                    result = runner(job)
                job.finish(result=result)
            except Exception:
                job.finish(error=traceback.format_exc())
            finally:
                router.sinks.pop(threading.get_ident(), None)

        threading.Thread(target=main, daemon=True, name=f"job-{job_id}").start()
        return job


# ------------------------------------------------------------ job runners

def _surf_params(p: dict):
    from ..pipeline import SurfParams

    kw = {}
    if p.get("numberOfPoints"):
        kw["n_points"] = int(p["numberOfPoints"])
    if p.get("spacing"):
        kw["spacing"] = float(p["spacing"])
    if p.get("threshold") is not None:
        kw["threshold"] = float(p["threshold"])
    # the reference's RAW extraction mode (SURF3D action with type: 1,
    # FROG.js:64-69)
    if p.get("type") == 1 or p.get("descriptor") == "raw":
        kw["descriptor"] = "raw"
    return SurfParams(**kw)


def _extract_keypoints(job: Job, files: list[str]):
    """Shared extraction step for the rigid-family jobs."""
    from ..io.keypoints import read_keypoints
    from ..pipeline import extract_stage

    job.channel = "log"
    kp_files = extract_stage(
        files, _surf_params(job.params), job.dir, verbose=True
    )
    for i, _ in enumerate(kp_files):
        job.line(f"SURF3D keypoints: {i + 1}/{len(files)} done")
    return [read_keypoints(f) for f in kp_files]


def run_deformable(job: Job, files: list[str]):
    """FROG.DeformableGroupwiseRegistration.execute (js/lib/FROG.js:39-204):
    one extract -> match round per enabled extractor (SURF and/or RAW,
    FROG.js:62-157), graphs merged (mergePairs, :162-171), then register,
    with per-stage progress channels."""
    from ..io.pairs import merge_pairs, write_pairs
    from ..ops.matcher import MatchParams, warm_matcher
    from ..pipeline import extract_stage, match_stage, register_stage
    from ..registration.group import GroupConfig

    p = job.params
    extractors = p.get("extractors")
    if not extractors:
        extractors = []
        if p.get("useRAW"):
            extractors.append({**(p.get("RAWParams") or {}), "type": 1})
        if p.get("useSURF", True) or not extractors:
            extractors.append({})
    mp = MatchParams(
        max_distance=float(p.get("distance", 1e10)),
        second_ratio=float(p.get("distanceToSecond", 1.0)),
    )
    cfg = GroupConfig(
        linear_iterations=int(p.get("linearIterations", 50)),
        deformable_levels=int(p.get("deformableLevels", 3)),
        deformable_iterations=int(p.get("deformableIterations", 200)),
        initial_grid_size=float(p.get("initialGridSize", 100.0)),
        display_linear=True,
        verbose=True,
    )
    graph = kp_files = None
    for idx, ep in enumerate(extractors):
        surf = _surf_params({**p, **ep})
        sub = job.dir if len(extractors) == 1 else os.path.join(
            job.dir, f"ext{idx}")
        job.channel = "log"
        warm_matcher(surf.n_points, mp.scale_ratio)
        kpf = extract_stage(files, surf, sub, verbose=True)
        if kp_files is None:
            kp_files = kpf
        job.channel = "matchLog"
        g = match_stage(
            kpf,
            mp,
            out_file=os.path.join(sub, "pairs.bin"),
            n_points=surf.n_points,
            verbose=True,
        )
        graph = g if graph is None else merge_pairs(graph, g)
    if len(extractors) > 1:
        write_pairs(os.path.join(job.dir, "pairs.bin"), graph)
    job.channel = "registrationLog"
    reg = register_stage(graph, cfg, output_dir=job.dir)
    job.channel = "log"
    affine = np.asarray(reg.arrays.affine)
    n = len(files)
    result = {
        "outputDirectory": job.id,
        "volumes": [
            {
                "volume": files[i],
                "transform": f"{job.id}/transforms/{i}.json",
                "points": os.path.relpath(kp_files[i], job.dir),
                "translation": [float(v) for v in affine[i, :3, 3]],
                "scale": [float(v) for v in np.diagonal(affine[i])[:3]],
            }
            for i in range(n)
        ],
        "measures": [float(m.E) for m in reg.measures],
    }
    if p.get("computeAverage"):
        job.channel = "log"
        job.line("Transforming images.")
        run_average(job, files, float(p.get("averageSpacing", 5.0)))
        result["averageVolume"] = f"{job.id}/average.nii.gz"
    return result


def run_average(job: Job, files: list[str], spacing: float):
    """FROG.CommonSpaceMeanImage.execute (js/lib/FROG.js:215-305)."""
    from ..pipeline import average_stage

    average_stage(files, spacing, out_dir=job.dir, verbose=True)
    rel = os.path.basename(job.dir)  # job dir name under the work root
    return {
        "averageVolume": f"{rel}/average.nii.gz",
        "transformedVolumes": [
            f"{rel}/transformed{i}.nii.gz" for i in range(len(files))
        ],
    }


def run_rigid(job: Job, files: list[str]):
    """LSRegistration / FROG.computeRigidGroupwiseRegistration: all-pairs
    match3d + iterated Laplacian solve (js/lib/LSRegistration.js)."""
    from ..rigid.groupwise import RigidGroupParams, rigid_groupwise

    kps = _extract_keypoints(job, files)
    p = job.params
    kw = {}
    if p.get("edgeRemovalRatio"):
        kw["edge_removal_ratio"] = float(p["edgeRemovalRatio"])
    if p.get("finalEdgesRatio"):
        kw["final_edges_ratio"] = float(p["finalEdgesRatio"])
    job.channel = "registrationLog"
    out = rigid_groupwise(kps, RigidGroupParams(**kw), verbose=True)
    flat = []
    for row in np.asarray(out["positions"]):
        flat.extend([float(v) for v in row])
    return {
        "positions": flat,
        "valences": [int(v) for v in out["valences"]],
        "numberOfEdges": int(out["numberOfEdges"]),
        "volumes": files,
    }


def run_stochastic(job: Job, files: list[str]):
    """stochasticRigidRegistration.js: minibatch rigid scheme."""
    from ..rigid.groupwise import StochasticParams, stochastic_rigid

    kps = _extract_keypoints(job, files)
    p = job.params
    kw = {}
    for js_name, py_name, cast in (
        ("batchSize", "batch_size", int),
        ("maxIterations", "max_iterations", int),
        ("learningRate", "learning_rate", float),
        ("outlierRatio", "outlier_ratio", float),
    ):
        if p.get(js_name) is not None:
            kw[py_name] = cast(p[js_name])
    job.channel = "registrationLog"
    out = stochastic_rigid(kps, StochasticParams(**kw), verbose=True)
    return {
        "positions": [float(v) for v in np.asarray(out["positions"]).ravel()],
        "outliers": [int(v) for v in np.asarray(out["outliers"])],
        "volumes": files,
    }


def run_pairwise(job: Job, files: list[str]):
    """pairwiseRigidRegistration.js: SURF3D x2 + MATCH3D (RANSAC)."""
    from ..rigid.match3d import Match3DParams, match3d

    kps = _extract_keypoints(job, files[:2])
    p = job.params
    kw = {}
    if p.get("RansacDist"):
        kw["ransac_distance"] = float(p["RansacDist"])
    if p.get("MatchingDist"):
        kw["matching_distance"] = float(p["MatchingDist"])
    if p.get("MatchingDist2"):
        kw["matching_second_ratio"] = float(p["MatchingDist2"])
    job.channel = "registrationLog"
    rec = match3d(kps[0], kps[1], Match3DParams(**kw))
    job.line(
        f"match3d (0,1): {rec['inliers']} inliers / {rec['matches']} matches"
    )
    return {
        "translation": rec["translation"],
        "scale": rec["scale"],
        "inliers": rec["inliers"],
        "matches": rec["matches"],
        "fail": bool(rec["fail"]),
        "volumes": files[:2],
    }


_RUNNERS = {
    "deformable": run_deformable,
    "rigid": run_rigid,
    "stochastic": run_stochastic,
    "pairwise": run_pairwise,
    "average": None,  # dispatched specially: runs in the source job's dir
}


# ------------------------------------------------------------ PNG encoder

def _png_gray(img: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG (no external deps)."""
    h, w = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------- the server

class FrogServer:
    def __init__(self, root: str, work_dir: str | None = None):
        self.root = os.path.abspath(root)
        self.work = os.path.abspath(work_dir or os.path.join(root, "frog_jobs"))
        os.makedirs(self.work, exist_ok=True)
        self.jobs = JobManager(self.work)
        self._slice_cache = {}

    # -- path safety: only serve files under the data root or work dir
    def resolve(self, rel: str) -> str:
        for base in (self.root, self.work):
            p = os.path.abspath(os.path.join(base, rel))
            if p.startswith(base + os.sep) or p == base:
                if os.path.exists(p):
                    return p
        raise FileNotFoundError(rel)

    def list_volumes(self, sub: str = "") -> list[str]:
        base = self.resolve(sub) if sub else self.root
        out = []
        for dirpath, dirs, names in os.walk(base):
            # never offer job outputs (coefficient/transformed volumes)
            # as registration inputs
            dirs[:] = [
                d for d in dirs
                if os.path.abspath(os.path.join(dirpath, d)) != self.work
            ]
            for n in sorted(names):
                if n.lower().endswith(_VOLUME_EXT):
                    out.append(
                        os.path.relpath(os.path.join(dirpath, n), self.root)
                    )
        return sorted(out)

    def volume_files(self, params: dict) -> list[str]:
        files = params.get("files") or self.list_volumes()
        return [self.resolve(f) for f in files]

    def slice_png(self, rel: str, max_size: int = 192) -> bytes:
        key = (rel, max_size)
        if key in self._slice_cache:
            return self._slice_cache[key]
        from ..io import read_volume

        vol = read_volume(self.resolve(rel))
        data = np.asarray(vol.data)
        sl = data[:, :, data.shape[2] // 2]
        step = max(1, int(np.ceil(max(sl.shape) / max_size)))
        sl = sl[::step, ::step].astype(np.float32)
        lo, hi = np.percentile(sl, [1.0, 99.0])
        sl = np.clip((sl - lo) / max(hi - lo, 1e-6), 0, 1)
        png = _png_gray((sl.T[::-1] * 255).astype(np.uint8))
        self._slice_cache[key] = png
        return png

    def volume_info(self, rel: str) -> dict:
        from ..io import read_volume

        vol = read_volume(self.resolve(rel))
        return {
            "shape": [int(s) for s in vol.data.shape[:3]],
            "spacing": [float(s) for s in np.asarray(vol.spacing)],
            "origin": [float(s) for s in np.asarray(vol.origin)],
        }

    def points_json(self, rel: str, max_points: int = 3000) -> dict:
        from ..io.keypoints import read_keypoints

        kp = read_keypoints(self.resolve(rel))
        xyz = np.asarray(kp.xyz, np.float32)
        step = max(1, -(-xyz.shape[0] // max_points))
        xyz = xyz[::step]
        return {"count": int(xyz.shape[0]), "xyz": xyz.ravel().tolist()}

    def start_job(self, kind: str, params: dict) -> Job:
        if kind == "average":
            # CommonSpaceMeanImage: resample through an earlier
            # registration job's transforms, in that job's directory
            # (FROG.js:215-305 reads registration.outputDirectory).
            src = self.jobs.jobs[params["registration"]]
            files = self.volume_files(
                {"files": params.get("files")
                 or [v["volume"] for v in src.result["volumes"]]}
            ) if src.result else self.volume_files(params)
            spacing = float(params.get("spacing", 5.0))

            def go(job):
                job.dir = src.dir  # transforms/bbox.json live there
                return run_average(job, files, spacing)

            job = self.jobs.start(kind, params, go)
            return job

        runner = _RUNNERS[kind]
        files = self.volume_files(params)

        def go(job):
            return runner(job, files)

        return self.jobs.start(kind, params, go)

    def make_viewer(self, job_id: str) -> str:
        from .viewer import export_group_viewer

        job = self.jobs.jobs[job_id]
        out = os.path.join(job.dir, "view.html")
        if not os.path.exists(out):
            export_group_viewer(job.dir)
        return out


def _make_handler(server: FrogServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json", extra=()):
            if isinstance(body, str):
                body = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code=200):
            self._send(code, json.dumps(obj))

        # ---------------------------------------------------------- GET
        def do_GET(self):
            try:
                self._get()
            except FileNotFoundError as e:
                self._json({"error": f"not found: {e}"}, 404)
            except (BrokenPipeError, ConnectionResetError):
                pass
            except Exception:
                self._json({"error": traceback.format_exc()}, 500)

        def _get(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            path = url.path

            if path in ("/", "/index.html"):
                return self._static("index.html")
            if path.startswith("/app/"):
                return self._static(os.path.basename(path))
            if path.startswith("/static/"):
                return self._static(os.path.basename(path))

            if path == "/api/volumes":
                return self._json({"volumes": server.list_volumes(q.get("dir", ""))})
            if path == "/api/volinfo":
                return self._json(server.volume_info(q["file"]))
            if path == "/api/slice":
                png = server.slice_png(q["file"], int(q.get("max", 192)))
                return self._send(200, png, "image/png")
            if path == "/api/points":
                return self._json(
                    server.points_json(q["file"], int(q.get("max", 3000)))
                )
            if path == "/api/jobs":
                return self._json(
                    {
                        "jobs": [
                            {"id": j.id, "kind": j.kind, "status": j.status}
                            for j in server.jobs.jobs.values()
                        ]
                    }
                )

            if path.startswith("/api/jobs/"):
                parts = path.split("/")
                job = server.jobs.jobs.get(parts[3])
                if job is None:
                    raise FileNotFoundError(parts[3])
                if len(parts) == 4:
                    return self._json(
                        {
                            "id": job.id,
                            "kind": job.kind,
                            "status": job.status,
                            "result": job.result,
                            "error": job.error,
                        }
                    )
                if parts[4] == "events":
                    return self._sse(job)
                raise FileNotFoundError(path)

            if path == "/api/view":
                html = server.make_viewer(q["job"])
                with open(html, "rb") as f:
                    return self._send(200, f.read(), "text/html")

            raise FileNotFoundError(path)

        def _static(self, name):
            p = os.path.join(_WEBAPP_DIR, name)
            if not os.path.abspath(p).startswith(_WEBAPP_DIR) or not os.path.exists(p):
                raise FileNotFoundError(name)
            ctype = {
                ".html": "text/html",
                ".js": "text/javascript",
                ".css": "text/css",
            }.get(os.path.splitext(name)[1], "application/octet-stream")
            with open(p, "rb") as f:
                self._send(200, f.read(), ctype)

        def _sse(self, job: Job):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            # no Content-Length and no chunking: the stream's end is the
            # connection close, so keep-alive must be off
            self.send_header("Connection", "close")
            self.close_connection = True
            self.end_headers()
            sent = 0
            try:
                while True:
                    with job.cond:
                        while sent >= len(job.events):
                            if job.status != "running":
                                return
                            job.cond.wait(timeout=30)
                        batch = job.events[sent:]
                        sent = len(job.events)
                    for evt in batch:
                        payload = json.dumps(evt)
                        self.wfile.write(f"data: {payload}\n\n".encode())
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                return

        # --------------------------------------------------------- POST
        def do_POST(self):
            try:
                url = urlparse(self.path)
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if url.path == "/api/jobs":
                    kind = body.get("kind")
                    if kind not in _RUNNERS:
                        return self._json({"error": f"unknown kind {kind}"}, 400)
                    job = server.start_job(kind, body.get("params", {}))
                    return self._json({"id": job.id}, 201)
                raise FileNotFoundError(url.path)
            except FileNotFoundError as e:
                self._json({"error": f"not found: {e}"}, 404)
            except Exception:
                self._json({"error": traceback.format_exc()}, 500)

    return Handler


def serve(root: str, port: int = 8080, work_dir: str | None = None,
          verbose: bool = True):
    """Start the app server; returns (httpd, FrogServer). Call
    httpd.serve_forever() (or spin it in a thread for tests)."""
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()  # server restarts reuse prior executables
    fs = FrogServer(root, work_dir)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(fs))
    httpd.daemon_threads = True
    if verbose:
        print(f"frog-tpu serve: http://127.0.0.1:{httpd.server_port}/"
              f" (root {fs.root})")
    return httpd, fs
