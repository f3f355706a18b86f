"""3D-SURF keypoint extraction pipeline — the surf3d binary's equivalent.

CLI-facing options mirror the reference (frog.json:352-428, FROG.py:
196-207): isotropic spacing, detector threshold, top-n selection, mask
volume, intensity clamping, mirror padding.

Pipeline (all jitted device work between load and the final top-k copy):
resample -> clamp/pad -> scale-stack Hessian responses -> non-max
suppression -> threshold + top-n by response -> sub-voxel refinement ->
integral-volume descriptors.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...io.keypoints import Keypoints
from ...io.volume import Volume
from .descriptor import descriptors, integral_volume
from .detector import detect, non_max_mask, scale_stack_sizes
from .resample import clamp, mirror_pad, resample_isotropic, trilinear_sample

__all__ = ["SurfParams", "extract_keypoints"]


@dataclasses.dataclass(frozen=True)
class SurfParams:
    spacing: float = 0.75  # -s (params.sh:12)
    threshold: float = 0.0  # -t
    n_points: int = 20000  # -n
    cmin: float | None = None
    cmax: float | None = None
    pad: float = 0.0
    n_octaves: int = 3
    subvoxel: bool = True
    descriptor: str = "surf"  # "surf" (48-float) or "raw" (-type 1)
    raw_radius: int = 2  # -r: raw subvolume radius in sigma-spaced samples
    # wire dtype of the volume upload ("float32" | "float16"): f16 halves
    # the host->device transfer — measured ~0.55 s of the ~1.6 s
    # per-volume chain at reference scale — at ~5e-5 relative intensity
    # error (keypoint agreement 0.9999, descriptor cosine 1.0000 on the
    # bench volumes); int8/int16 volumes always ship losslessly as-is
    transfer_dtype: str = "float16"
    # exact full-sort top-k instead of the TPU partial-reduction one
    # (recall 0.999); non-TPU backends are always exact
    exact_topk: bool = False


from functools import partial


@partial(jax.jit, static_argnames=("lobes", "use_mask"))
def _detect_responses(
    data,  # (X, Y, Z) f32 isotropic volume, already on device
    mask_vals,  # (X, Y, Z) bool or None
    extent,  # (3,) i32 true (unpadded) dims; peaks beyond are dropped
    lobes: tuple,
    threshold: float,
    use_mask: bool,
):
    """First detector half: scale-stack Hessian responses + NMS + border/
    mask gating.  Returns (responses, laps, peaks) — device-resident, so
    the split costs one HBM round-trip of the scale stack (~1 ms at bench
    scale) and nothing over the host tunnel.

    The detector is split THREE ways (responses | top-k | descriptors)
    because compile time through the remote-compile service is super-
    linear in program size: the fused whole measured 88 s to compile
    where the halves measure ~11 s EACH, and the top-k/descriptor halves
    pre-warm on aot threads (extract_keypoints_async) so a cold start
    pays ~max of the compiles instead of their fused blow-up."""
    responses, laps = detect(data, lobes)
    laps = laps.astype(jnp.int8)
    peaks = non_max_mask(responses, threshold)
    for ax in range(3):
        idx = jax.lax.broadcasted_iota(jnp.int32, peaks.shape, ax + 1)
        peaks = peaks & (idx < extent[ax])
    if use_mask:
        peaks = peaks & (mask_vals > 0)[None]
    return responses, laps, peaks


@partial(
    jax.jit,
    static_argnames=("lobes", "n_points", "subvoxel", "exact_topk"),
)
def _detect_topk(
    responses,  # (S, X, Y, Z) f32 scale-stack responses
    laps,  # (S, X, Y, Z) i8 laplacian signs
    peaks,  # (S, X, Y, Z) bool NMS survivors
    lobes: tuple,
    n_points: int,
    subvoxel: bool,
    exact_topk: bool = False,
):
    """Second detector half: top-k by response, sub-voxel refinement —
    packed into the (k, 7) header.

    Only O(n_points) outputs cross back to the host — essential when the
    device is remote-attached (host<->device bandwidth is the bottleneck,
    not compute).  The volume is bucket-padded to shared shapes so one
    compile serves many volumes."""
    flat_resp = jnp.where(peaks, responses, -jnp.inf).reshape(-1)
    k = min(n_points, flat_resp.shape[0])
    if exact_topk or flat_resp.shape[0] % 16 or flat_resp.shape[0] // 16 <= k:
        top_vals, top_idx = jax.lax.top_k(flat_resp, k)
    else:
        # Strided top-2 block reduction before the top-k: approx_max_k at
        # k=20k over 50M candidates can only halve the input before its
        # recall bound bites, so it SORTS ~28M floats (~90 ms).  NMS
        # leaves only ~35k finite candidates, so reduce 16x first: view
        # the flat array as (16, n/16) — block members are n/16 apart,
        # fully decorrelated from the (s,x,y,z) layout — and keep the
        # top-2 of each block.  Loss requires >=3 of the true top-k in
        # one 16-block: expected ~0.1 events at bench scale (measured
        # overlap vs exact top_k: 1.0000).  approx_max_k then sorts 16x
        # less.  Non-TPU backends and tiny inputs take the exact op.
        blocks = jnp.where(peaks, responses, -jnp.inf).reshape(16, -1)
        ncol = blocks.shape[1]
        a1 = jnp.argmax(blocks, axis=0)
        m1 = jnp.max(blocks, axis=0)
        masked = jnp.where(
            jnp.arange(16)[:, None] == a1[None, :], -jnp.inf, blocks
        )
        a2 = jnp.argmax(masked, axis=0)
        m2 = jnp.max(masked, axis=0)
        vals = jnp.concatenate([m1, m2])
        rows = jnp.concatenate([a1, a2]).astype(jnp.int32)
        top_vals, bi = jax.lax.approx_max_k(vals, k, recall_target=0.999)
        top_idx = rows[bi] * ncol + bi % ncol
    valid = jnp.isfinite(top_vals)
    top_idx = jnp.where(valid, top_idx, 0)

    s_shape = responses.shape  # (S, X, Y, Z)
    sx = s_shape[1] * s_shape[2] * s_shape[3]
    s_idx = top_idx // sx
    rem = top_idx % sx
    vx = rem // (s_shape[2] * s_shape[3])
    rem = rem % (s_shape[2] * s_shape[3])
    vy = rem // s_shape[3]
    vz = rem % s_shape[3]

    lap_top = laps.reshape(-1)[top_idx].astype(jnp.float32)
    sigma_vox = 1.2 * (3.0 * jnp.asarray(lobes, jnp.float32)[s_idx]) / 9.0

    pos = jnp.stack([vx, vy, vz], axis=1).astype(jnp.float32)
    if subvoxel:
        flat = responses.reshape(-1)
        f_c = flat[top_idx]
        strides = (sx, s_shape[2] * s_shape[3], s_shape[3], 1)
        offsets = []
        coords = (vx, vy, vz)
        for ax in range(3):
            stride = strides[ax + 1]
            n_ax = s_shape[ax + 1]
            c = coords[ax]
            ok = (c > 0) & (c < n_ax - 1)
            f_lo = flat[jnp.maximum(top_idx - stride, 0)]
            f_hi = flat[jnp.minimum(top_idx + stride, flat.shape[0] - 1)]
            denom = f_lo - 2 * f_c + f_hi
            off = jnp.where(
                jnp.abs(denom) > 1e-12, 0.5 * (f_lo - f_hi) / denom, 0.0
            )
            offsets.append(jnp.where(ok, jnp.clip(off, -0.5, 0.5), 0.0))
        pos = pos + jnp.stack(offsets, axis=1)

    # Pack the scalar outputs into ONE f32 array: the remote device->host
    # tunnel pays an RTT per transfer, so 6 readbacks become 2.
    header = jnp.concatenate(
        [
            pos,
            sigma_vox[:, None],
            lap_top[:, None],
            top_vals[:, None],
            valid[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    return header, s_idx


@partial(jax.jit, static_argnames=("lobes", "descriptor", "raw_radius"))
def _describe_device(data, header, s_idx, lobes, descriptor, raw_radius):
    """Raw-subvolume descriptor executable (surf3d -type 1).  The default
    surf descriptor takes the split _describe_table/_describe_gather path
    below instead (halved cold-compile time)."""
    pos = header[:, 0:3]
    sigma_vox = header[:, 3]
    if descriptor == "raw":
        return _raw_descriptor_samples(data, pos, sigma_vox, raw_radius)
    from .descriptor import descriptors_dense

    desc = descriptors_dense(data, pos, sigma_vox, s_idx, lobes)
    return desc.astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("lobes",))
def _describe_table(data, lobes):
    """Volume-only descriptor half: dense per-scale Haar table.  Depends
    only on the volume, so it dispatches right after the resample and its
    compile overlaps the detector halves' (see _detect_responses on why
    the pipeline is split into small programs)."""
    from .descriptor import dense_haar_table

    return dense_haar_table(data, lobes)


@partial(jax.jit, static_argnames=("lobes", "shape"))
def _describe_gather(table, header, s_idx, lobes, shape):
    """Keypoint descriptor half: 3 table reads per Haar sample + pooling.
    Ships bf16 — descriptors are normalized sums of hundreds of Haar
    samples already computed from bf16 volumes; the 0.4% quantization is
    below the matching-power noise floor
    (tests/test_descriptor_metrics.py)."""
    from .descriptor import descriptors_from_table

    desc = descriptors_from_table(
        table, shape, header[:, 0:3], header[:, 3], s_idx, lobes
    )
    return desc.astype(jnp.bfloat16)


def extract_keypoints(
    vol: Volume,
    params: SurfParams = SurfParams(),
    mask: Volume | None = None,
) -> Keypoints:
    return finalize_keypoints(*extract_keypoints_async(vol, params, mask))


def stage_for_extract(vol: Volume, params: SurfParams = SurfParams(),
                      device=None):
    """Host prep (clamp, pad, wire cast) + async device upload of a volume
    for :func:`extract_keypoints_async`.  Run this on an IO worker thread
    for volume k+1 while volume k computes: the f16 cast (~0.2 s host CPU)
    and the tunnel transfer then overlap device work instead of
    serializing with it (pipeline.extract_stage does exactly that).
    ``device`` pins the upload for the round-robin multi-device path."""
    from .resample import stage_volume

    vol = clamp(vol, params.cmin, params.cmax)
    if params.pad > 0:
        vol = mirror_pad(vol, params.pad)
    return stage_volume(vol, np.dtype(params.transfer_dtype), device=device)


def extract_keypoints_async(
    vol,
    params: SurfParams = SurfParams(),
    mask: Volume | None = None,
):
    """Dispatch the device extraction and return (device results,
    iso_origin, params) WITHOUT waiting: the caller can dispatch the next
    volume (or overlap host IO) before paying the device->host readback in
    ``finalize_keypoints`` — on a remote-attached TPU the readback tunnel
    and the device compute overlap.

    ``vol`` is a Volume or a StagedVolume from :func:`stage_for_extract`
    (whose clamp/pad/upload already happened, off the critical path)."""
    from .resample import StagedVolume, resample_to_device

    if not isinstance(vol, StagedVolume):
        vol = stage_for_extract(vol, params)

    # Resample + bucket-pad (mirror content) in ONE device pass: one
    # volume upload, one compile per (in, out) shape pair, no volume
    # readback (resample_to_device).
    data, extent, iso_origin = resample_to_device(vol, params.spacing)
    iso_spacing = np.full(3, float(params.spacing))

    mask_vals = None
    if mask is not None:
        # sample the mask on the isotropic grid; keep voxels with mask > 0
        # (pinned to the volume's device: the round-robin multi-device
        # path commits each volume to its own device)
        mdata = jax.device_put(
            np.asarray(mask.data, np.float32), getattr(data, "device", None)
        )
        grids = [
            (iso_origin[k] + iso_spacing[k] * np.arange(data.shape[k])
             - mask.origin[k]) / mask.spacing[k]
            for k in range(3)
        ]
        cx, cy, cz = jnp.meshgrid(
            *[jnp.asarray(g, jnp.float32) for g in grids], indexing="ij"
        )
        mask_vals = trilinear_sample(mdata, jnp.stack([cx, cy, cz], axis=-1)) > 0

    lobes = tuple(scale_stack_sizes(params.n_octaves))
    futs = _warm_extract_kernels(data, params, lobes)

    def _join(name):
        # The warm threads compile the downstream executables while the
        # response-stack compile blocks inline; JOIN each warm before its
        # inline call — calling into a still-compiling signature would
        # start a DUPLICATE compile (jit does not dedupe in-flight
        # compiles across threads) and saturate the remote service.
        f = futs.get(name)
        if f is not None:
            f.result()

    responses, laps, peaks = _detect_responses(
        data,
        mask_vals if mask_vals is not None else jnp.zeros((1, 1, 1), bool),
        jnp.asarray(extent, jnp.int32),
        lobes,
        params.threshold,
        mask_vals is not None,
    )
    _join("topk")
    header, s_idx = _detect_topk(
        responses,
        laps,
        peaks,
        lobes,
        params.n_points,
        params.subvoxel,
        params.exact_topk,
    )
    if params.descriptor == "raw":
        _join("raw")
        desc = _describe_device(
            data, header, s_idx, lobes, params.descriptor, params.raw_radius
        )
    else:
        _join("table")
        table = _describe_table(data, lobes)
        _join("gather")
        desc = _describe_gather(
            table, header, s_idx, lobes, tuple(data.shape)
        )
    return (header, desc), iso_origin, params


_extract_warm_futures: dict = {}


def _warm_extract_kernels(data, params: SurfParams, lobes: tuple) -> dict:
    """Fire the top-k and descriptor executables' compiles on aot threads
    (with throwaway inputs on the already-uploaded volume) so they proceed
    IN PARALLEL with the response-stack compile the caller is about to
    block on: a cold start pays ~max(compile times) instead of their sum
    (and far less than the fused single program's compile — see
    _detect_responses).

    Returns {stage-name: Future} for the caller to JOIN before each
    inline call (see extract_keypoints_async._join).  One warm set per
    (signature, device placement): jit caches committed-to-device-k
    calls separately from uncommitted ones, so the round-robin
    multi-device path warms PER DEVICE with dummies committed exactly
    like the real inputs — otherwise the warm compiles never match the
    inline calls and every device pays its compiles serially inline
    while the warm threads build never-used duplicates."""
    # Committed arrays (the -devices path pins each volume's upload) put
    # their placement in the jit cache key; mirror it on the dummies.
    committed = bool(getattr(data, "committed", False)) or bool(
        getattr(data, "_committed", False)
    )
    dev = getattr(data, "device", None) if committed else None
    key = (data.shape, params.n_points, params.descriptor, params.raw_radius,
           params.subvoxel, params.exact_topk, lobes, dev)
    cached = _extract_warm_futures.get(key)
    if cached is not None:
        return cached
    from ...utils import aot

    futs: dict = {}
    _extract_warm_futures[key] = futs

    def _dummy(shape, dtype):
        z = jnp.zeros(shape, dtype)
        if dev is not None:
            z = jax.device_put(z, dev)
        return z

    k = min(params.n_points, int(np.prod(data.shape)) * len(lobes))
    s_shape = (len(lobes),) + tuple(data.shape)
    futs["topk"] = aot.warm(
        _detect_topk,
        _dummy(s_shape, jnp.float32),
        _dummy(s_shape, jnp.int8),
        _dummy(s_shape, bool),
        lobes,
        params.n_points,
        params.subvoxel,
        params.exact_topk,
        key=("warm_topk",) + key,
    )
    if params.descriptor == "raw":
        futs["raw"] = aot.warm(
            _describe_device,
            data,
            _dummy((k, 7), jnp.float32),
            _dummy((k,), jnp.int32),
            lobes,
            params.descriptor,
            params.raw_radius,
            key=("warm_raw",) + key,
        )
    else:
        from .descriptor import haar_table_sizes

        uniq, _ = haar_table_sizes(lobes)
        n_rows = len(uniq) * int(np.prod(data.shape))
        futs["table"] = aot.warm(
            _describe_table, data, lobes, key=("warm_table",) + key
        )
        futs["gather"] = aot.warm(
            _describe_gather,
            _dummy((n_rows, 3), jnp.bfloat16),
            _dummy((k, 7), jnp.float32),
            _dummy((k,), jnp.int32),
            lobes,
            tuple(data.shape),
            key=("warm_gather",) + key,
        )
    # aot.warm returns None when warming is disabled (FROG_AOT=0) or the
    # signature was already warmed elsewhere; _join treats None as
    # nothing-to-wait-for
    return futs


def finalize_keypoints(device_results, iso_origin, params) -> Keypoints:
    """Pay the device->host readback and build the Keypoints record."""
    header, desc = device_results
    header = np.asarray(header)
    keep = header[:, 6] > 0  # validity flag (see _extract_device packing)
    header = header[keep]
    pos = header[:, 0:3]
    iso_spacing = np.full(3, float(params.spacing))
    xyz = iso_origin[None, :] + pos * iso_spacing[None, :]
    return Keypoints(
        xyz=xyz.astype(np.float32),
        scale=(header[:, 3] * params.spacing).astype(np.float32),
        laplacian=header[:, 4].astype(np.float32),
        response=header[:, 5].astype(np.float32),
        desc=np.asarray(desc).astype(np.float32)[keep],
    )


def _subvoxel_offsets(responses, s_idx, vx, vy, vz):
    """Per-axis quadratic peak interpolation: offset = -b / (2a) from the
    1D parabola through the three samples along each axis."""
    shape = responses.shape[1:]
    out = np.zeros((len(s_idx), 3), np.float32)
    coords = [vx, vy, vz]
    for ax in range(3):
        c = coords[ax]
        ok = (c > 0) & (c < shape[ax] - 1)
        lo = np.clip(c - 1, 0, shape[ax] - 1)
        hi = np.clip(c + 1, 0, shape[ax] - 1)
        idx = [s_idx, vx.copy(), vy.copy(), vz.copy()]
        idx[1 + ax] = lo
        f_lo = responses[tuple(idx)]
        idx[1 + ax] = hi
        f_hi = responses[tuple(idx)]
        f_c = responses[s_idx, vx, vy, vz]
        denom = f_lo - 2 * f_c + f_hi
        offset = np.where(
            np.abs(denom) > 1e-12, 0.5 * (f_lo - f_hi) / denom, 0.0
        )
        out[:, ax] = np.where(ok, np.clip(offset, -0.5, 0.5), 0.0)
    return out


def _raw_descriptor_samples(data, positions, sigmas, radius: int):
    """Raw-subvolume descriptor (surf3d -type 1, frog.json:352-428): a
    (2r+1)^3 cube of trilinear samples spaced by the keypoint's sigma,
    zero-mean unit-norm so L2 matching behaves like correlation.
    Traceable (used inside the fused extraction jit)."""
    r = radius
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(offs, offs, offs, indexing="ij"), -1).reshape(-1, 3)
    coords = positions[:, None, :] + sigmas[:, None, None] * grid[None]
    vals = trilinear_sample(data, coords)  # (K, M)
    vals = vals - jnp.mean(vals, axis=1, keepdims=True)
    norm = jnp.sqrt(jnp.sum(vals * vals, axis=1, keepdims=True))
    return vals / jnp.maximum(norm, 1e-12)
