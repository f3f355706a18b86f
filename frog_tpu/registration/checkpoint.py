"""Mid-optimization checkpoint/resume.

The reference's restartability is file-level only (stage outputs are the
checkpoints, SURVEY.md §5); frog itself cannot resume mid-run.  Here the
optimizer state — stage, iteration counters, per-image affine, current
grid coefficients, EM parameters, baked coordinates, frozen chains and
recorded measures — serializes to a single .npz + per-image transform
JSONs, written every ``checkpoint_interval`` completed chunks and
restorable into a fresh GroupRegistration built from the same pairs.bin.
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "restore_registration"]


def save_checkpoint(reg, path: str, stage: str, **progress) -> None:
    import jax.numpy as jnp  # noqa: F401

    os.makedirs(path, exist_ok=True)
    state = {
        "xyz": np.asarray(reg.arrays.xyz),
        "xyz2": np.asarray(reg.arrays.xyz2),
        "em": np.asarray(reg.arrays.em),
        "affine": np.asarray(reg.arrays.affine),
    }
    if "coeffs" in progress and progress["coeffs"] is not None:
        state["coeffs"] = np.asarray(progress.pop("coeffs"))
    np.savez_compressed(os.path.join(path, "state.npz"), **state)

    from ..transforms.io import write_frog_json

    chains_dir = os.path.join(path, "chains")
    os.makedirs(chains_dir, exist_ok=True)
    chain_lengths = {}
    for i, chain in enumerate(reg.chains):
        if chain is None:
            continue
        write_frog_json(chain, os.path.join(chains_dir, f"{i}.json"), compact=True)
        chain_lengths[str(i)] = len(chain)

    meta = {
        "stage": stage,
        "measures": [dataclasses.asdict(m) for m in reg.measures],
        "stats_record": _jsonable(reg.stats_record),
        "chains": chain_lengths,
        **{k: _jsonable(v) for k, v in progress.items()},
    }
    with open(os.path.join(path, "checkpoint.json"), "w") as f:
        json.dump(meta, f)


def _jsonable(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def load_checkpoint(path: str):
    with open(os.path.join(path, "checkpoint.json")) as f:
        meta = json.load(f)
    state = dict(np.load(os.path.join(path, "state.npz")))
    return meta, state


def restore_registration(reg, path: str):
    """Restore a checkpoint into a freshly-built GroupRegistration (same
    pairs.bin / config).  Returns (meta, coeffs-or-None)."""
    import jax.numpy as jnp

    from ..transforms.io import read_transform
    from .group import Measure

    meta, state = load_checkpoint(path)
    reg.arrays = dataclasses.replace(
        reg.arrays,
        xyz=jnp.asarray(state["xyz"]),
        xyz2=jnp.asarray(state["xyz2"]),
        em=jnp.asarray(state["em"]),
        affine=jnp.asarray(state["affine"]),
    )
    reg.measures = [Measure(**m) for m in meta["measures"]]
    reg.stats_record = meta.get("stats_record", {})
    chains_dir = os.path.join(path, "chains")
    for key in meta.get("chains", {}):
        i = int(key)
        reg.chains[i] = read_transform(os.path.join(chains_dir, f"{i}.json"))
    coeffs = state.get("coeffs")
    return meta, (jnp.asarray(coeffs) if coeffs is not None else None)
