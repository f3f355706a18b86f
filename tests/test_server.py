"""The interactive app server (tools/server.py): job API, SSE progress
streams, static apps, slice/points endpoints — driven over real HTTP the
way the browser FROG API (webapp/frog.js) does."""
import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

from frog_tpu.io.mhd import write_volume
from frog_tpu.io.volume import Volume
from frog_tpu.tools.server import serve


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("webroot")
    rng = np.random.default_rng(0)
    shape = (40, 40, 40)
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    data = np.zeros(shape, np.float32)
    for c in rng.uniform(8, 32, (20, 3)):
        r2 = np.sum((g - c) ** 2, -1)
        data += np.float32(rng.uniform(40, 100)) * np.exp(
            -r2 / (2 * rng.uniform(1.5, 3.0) ** 2)
        ).astype(np.float32)
    shifts = [np.zeros(3), np.array([3.0, -2.0, 1.0]), np.array([-2.0, 4.0, -1.0])]
    for i, s in enumerate(shifts):
        write_volume(
            str(root / f"vol{i}.nii.gz"), Volume(data, origin=s, spacing=np.ones(3))
        )
    httpd, fs = serve(str(root), port=0, verbose=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}", fs, shifts
    httpd.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read()


def _get_json(url):
    status, _, body = _get(url)
    assert status == 200, body
    return json.loads(body)


def _post_json(url, obj):
    req = urllib.request.Request(
        url,
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _follow(base, job_id, timeout=600):
    """Read the SSE stream to completion; returns (events, result)."""
    events = []
    req = urllib.request.Request(f"{base}/api/jobs/{job_id}/events")
    deadline = time.time() + timeout
    with urllib.request.urlopen(req, timeout=timeout) as r:
        buf = b""
        while time.time() < deadline:
            chunk = r.read1(65536)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                frame, buf = buf.split(b"\n\n", 1)
                for line in frame.split(b"\n"):
                    if line.startswith(b"data: "):
                        events.append(json.loads(line[6:]))
                if events and events[-1]["type"] in ("done", "error"):
                    return events, events[-1]
    raise TimeoutError(f"job {job_id} did not finish: {events[-3:]}")


def test_static_and_volume_endpoints(server):
    base, fs, _ = server
    status, ctype, body = _get(base + "/")
    assert status == 200 and "text/html" in ctype and b"deformable" in body
    for app in ("deformable", "rigid", "pairwise", "stochastic"):
        status, _, body = _get(f"{base}/app/{app}.html")
        assert status == 200 and b"FROG." in body
    # the browser API + renderer ship with the same surface the
    # reference exposes (js/lib/FROG.js)
    status, _, body = _get(base + "/static/frog.js")
    assert b"computeRigidGroupwiseRegistration" in body
    assert b"DeformableGroupwiseRegistration" in body
    assert b"CommonSpaceMeanImage" in body

    vols = _get_json(base + "/api/volumes")["volumes"]
    assert len(vols) == 3 and all(v.endswith(".nii.gz") for v in vols)

    info = _get_json(f"{base}/api/volinfo?file={vols[0]}")
    assert info["shape"] == [40, 40, 40]

    status, ctype, body = _get(f"{base}/api/slice?file={vols[0]}")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"

    # path traversal is refused
    status, _, _ = _get(f"{base}/api/volinfo?file=../../etc/passwd")
    assert status == 404


def test_pairwise_job_recovers_shift(server):
    base, fs, shifts = server
    status, body = _post_json(
        base + "/api/jobs",
        {
            "kind": "pairwise",
            "params": {
                "files": ["vol0.nii.gz", "vol1.nii.gz"],
                "numberOfPoints": 300,
                "spacing": 1.0,
                "RansacDist": 10.0,
            },
        },
    )
    assert status == 201
    job_id = body["id"]
    events, last = _follow(base, job_id)
    assert last["type"] == "done", last
    rec = last["result"]
    assert rec["inliers"] > 10 and not rec["fail"]
    # volumes are identical up to an origin shift: the recovered
    # translation must be ~(origin1 - origin0)
    want = shifts[1] - shifts[0]
    np.testing.assert_allclose(rec["translation"], want, atol=1.0)
    assert abs(rec["scale"] - 1.0) < 0.05
    # the extracted clouds are fetchable for display
    pts = _get_json(f"{base}/api/points?file={job_id}/points0.csv.gz&max=500")
    assert pts["count"] > 0 and len(pts["xyz"]) == 3 * pts["count"]


def test_deformable_job_streams_and_registers(server):
    base, fs, shifts = server
    status, body = _post_json(
        base + "/api/jobs",
        {
            "kind": "deformable",
            "params": {
                "numberOfPoints": 200,
                "spacing": 1.0,
                "linearIterations": 15,
                "deformableLevels": 1,
                "deformableIterations": 10,
                "initialGridSize": 40.0,
            },
        },
    )
    assert status == 201
    job_id = body["id"]
    events, last = _follow(base, job_id)
    assert last["type"] == "done", last

    channels = {e.get("channel") for e in events if e["type"] == "line"}
    assert {"log", "matchLog", "registrationLog"} <= channels
    reg_lines = [
        e["text"] for e in events
        if e["type"] == "line" and e.get("channel") == "registrationLog"
    ]
    # the lines the reference app parses for its live display
    assert any(l.startswith("E = ") for l in reg_lines)
    assert any("translation=" in l for l in reg_lines)
    assert any(l.startswith("scale=") for l in reg_lines)

    result = last["result"]
    assert len(result["volumes"]) == 3
    assert result["measures"][-1] < result["measures"][0]
    # recovered translations must undo the origin shifts (common space)
    t = np.asarray([v["translation"] for v in result["volumes"]])
    rel = t - t[0]
    want = -(np.asarray(shifts) - shifts[0])
    np.testing.assert_allclose(rel, want, atol=1.0)
    for v in result["volumes"]:
        assert os.path.exists(os.path.join(fs.work, v["transform"]))

    # job status endpoint agrees
    job = _get_json(f"{base}/api/jobs/{job_id}")
    assert job["status"] == "done" and job["result"]["volumes"]

    # the residual viewer renders from the job dir
    status, ctype, body = _get(f"{base}/api/view?job={job_id}")
    assert status == 200 and b"frog-tpu group" in body

    # CommonSpaceMeanImage on top of the registration job
    status, body = _post_json(
        base + "/api/jobs",
        {"kind": "average", "params": {"registration": job_id, "spacing": 4.0}},
    )
    assert status == 201
    _, last = _follow(base, body["id"])
    assert last["type"] == "done", last
    avg = last["result"]["averageVolume"]
    status, ctype, _ = _get(f"{base}/api/slice?file={avg}")
    assert status == 200 and ctype == "image/png"


def test_rigid_and_stochastic_jobs(server):
    base, fs, shifts = server
    params = {"numberOfPoints": 300, "spacing": 1.0, "RansacDist": 10.0}
    status, body = _post_json(
        base + "/api/jobs", {"kind": "rigid", "params": dict(params)}
    )
    assert status == 201
    events, last = _follow(base, body["id"])
    assert last["type"] == "done", last
    pos = np.asarray(last["result"]["positions"]).reshape(3, 4)
    # Laplacian-solved positions reproduce the origin shifts (up to a
    # global translation): each volume lands at its world offset
    rel = pos[:, :3] - pos[0, :3]
    want = np.asarray(shifts) - shifts[0]
    np.testing.assert_allclose(rel, want, atol=1.5)

    status, body = _post_json(
        base + "/api/jobs",
        {
            "kind": "stochastic",
            "params": {**params, "batchSize": 3, "maxIterations": 5},
        },
    )
    assert status == 201
    events, last = _follow(base, body["id"])
    assert last["type"] == "done", last
    assert len(last["result"]["positions"]) == 9


def test_deformable_dual_extractor_merges(server):
    """useSURF + useRAW: two extract->match rounds whose graphs merge
    (FROG.js:62-171 + the mergePairs action)."""
    base, fs, shifts = server
    status, body = _post_json(
        base + "/api/jobs",
        {
            "kind": "deformable",
            "params": {
                "numberOfPoints": 150,
                "spacing": 1.0,
                "linearIterations": 10,
                "deformableLevels": 0,
                "useSURF": True,
                "useRAW": True,
                "RAWParams": {"numberOfPoints": 100},
            },
        },
    )
    assert status == 201
    events, last = _follow(base, body["id"])
    assert last["type"] == "done", last
    job_dir = os.path.join(fs.work, body["id"])
    # per-extractor rounds + the merged graph on disk
    assert os.path.isdir(os.path.join(job_dir, "ext0"))
    assert os.path.isdir(os.path.join(job_dir, "ext1"))
    from frog_tpu.io.pairs import read_pairs
    merged = read_pairs(os.path.join(job_dir, "pairs.bin"))
    g0 = read_pairs(os.path.join(job_dir, "ext0", "pairs.bin"))
    g1 = read_pairs(os.path.join(job_dir, "ext1", "pairs.bin"))
    assert merged.n_matches == g0.n_matches + g1.n_matches
    assert merged.n_matches > g1.n_matches > 0
    result = last["result"]
    assert result["measures"][-1] < result["measures"][0]
