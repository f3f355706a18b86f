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


def extract_keypoints(
    vol: Volume,
    params: SurfParams = SurfParams(),
    mask: Volume | None = None,
) -> Keypoints:
    vol = clamp(vol, params.cmin, params.cmax)
    if params.pad > 0:
        vol = mirror_pad(vol, params.pad)
    iso = resample_isotropic(vol, params.spacing)
    data = jnp.asarray(iso.data, jnp.float32)

    lobes = tuple(scale_stack_sizes(params.n_octaves))
    responses, laps = detect(data, lobes)
    peaks = non_max_mask(responses, params.threshold)

    if mask is not None:
        # sample the mask on the isotropic grid; keep voxels with mask > 0
        mdata = jnp.asarray(mask.data, jnp.float32)
        dims = iso.shape
        grids = [
            (iso.origin[k] + iso.spacing[k] * np.arange(dims[k]) - mask.origin[k])
            / mask.spacing[k]
            for k in range(3)
        ]
        cx, cy, cz = jnp.meshgrid(
            *[jnp.asarray(g, jnp.float32) for g in grids], indexing="ij"
        )
        mvals = trilinear_sample(mdata, jnp.stack([cx, cy, cz], axis=-1))
        peaks = peaks & (mvals[None] > 0)

    flat_resp = jnp.where(peaks, responses, -jnp.inf).reshape(-1)
    k = min(params.n_points, flat_resp.shape[0])
    top_vals, top_idx = jax.lax.top_k(flat_resp, k)
    valid = np.asarray(jnp.isfinite(top_vals))
    top_idx = np.asarray(top_idx)[valid]
    top_vals = np.asarray(top_vals)[valid]

    shape = responses.shape
    sxyz = np.unravel_index(top_idx, shape)
    s_idx, vx, vy, vz = (np.asarray(a) for a in sxyz)

    # Scale in voxels: sigma = 1.2 * L / 9, L = 3 * lobe.
    lobes_np = np.asarray(lobes)
    sigma_vox = 1.2 * (3.0 * lobes_np[s_idx]) / 9.0

    pos = np.stack([vx, vy, vz], axis=1).astype(np.float32)
    if params.subvoxel and len(top_idx):
        pos = pos + _subvoxel_offsets(
            np.asarray(responses), s_idx, vx, vy, vz
        )

    lap_np = np.asarray(laps)[s_idx, vx, vy, vz]

    if len(top_idx):
        if params.descriptor == "raw":
            desc = np.asarray(
                _raw_descriptors(
                    data,
                    jnp.asarray(pos, jnp.float32),
                    jnp.asarray(sigma_vox, jnp.float32),
                    params.raw_radius,
                )
            )
        else:
            integral = integral_volume(data)
            desc = np.asarray(
                descriptors(
                    integral,
                    jnp.asarray(pos, jnp.float32),
                    jnp.asarray(sigma_vox, jnp.float32),
                )
            )
    else:
        ncols = 48 if params.descriptor != "raw" else (2 * params.raw_radius + 1) ** 3
        desc = np.zeros((0, ncols), np.float32)

    xyz = iso.origin[None, :] + pos * iso.spacing[None, :]
    return Keypoints(
        xyz=xyz.astype(np.float32),
        scale=(sigma_vox * params.spacing).astype(np.float32),
        laplacian=lap_np.astype(np.float32),
        response=top_vals.astype(np.float32),
        desc=desc.astype(np.float32),
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


def _raw_descriptors(data, positions, sigmas, radius: int):
    """Raw-subvolume descriptor (surf3d -type 1, frog.json:352-428): a
    (2r+1)^3 cube of trilinear samples spaced by the keypoint's sigma,
    zero-mean unit-norm so L2 matching behaves like correlation."""
    import jax
    import jax.numpy as jnp

    from .resample import trilinear_sample

    r = radius
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(offs, offs, offs, indexing="ij"), -1).reshape(-1, 3)

    @jax.jit
    def sample(pos, sig):
        coords = pos[:, None, :] + sig[:, None, None] * grid[None]
        vals = trilinear_sample(data, coords)  # (K, M)
        vals = vals - jnp.mean(vals, axis=1, keepdims=True)
        norm = jnp.sqrt(jnp.sum(vals * vals, axis=1, keepdims=True))
        return vals / jnp.maximum(norm, 1e-12)

    return sample(positions, sigmas)
