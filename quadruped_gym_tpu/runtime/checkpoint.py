"""Checkpoint / resume for solver state, policies and metrics.

The reference persists a policy zip + a plain-text step counter each
iteration (``train_quadruped.py:114-141``). Here any pytree (MPC carries,
PPO train state, estimator carries) checkpoints to a single numpy ``.npz``
plus a JSON treedef sidecar — dependency-free, atomic (write-then-rename),
and sufficient for single-controller training at this scale. (Orbax would
buy async / multi-host sharded checkpointing; not used — every array in
these train states is replicated and small.)
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree: Any, step: Optional[int] = None) -> None:
    """Save a pytree. Directory layout: <path>/state.npz + meta.json.

    Atomic: both files are written to temporaries and renamed into place
    (state first, meta last), so a crash mid-save can never leave a
    restore-able meta.json pointing at a torn state.npz — crash resume
    (rl/train.py) always sees the last complete checkpoint."""
    os.makedirs(path, exist_ok=True)
    leaves, _ = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    # np.savez appends ".npz" to names without it — keep the suffix last
    tmp_state = os.path.join(path, ".state.tmp.npz")
    np.savez(tmp_state, **arrays)
    os.replace(tmp_state, os.path.join(path, "state.npz"))
    meta = {"num_leaves": len(leaves), "step": step}
    tmp_meta = os.path.join(path, ".meta.json.tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(path, "meta.json"))


def restore(path: str, example_tree: Any):
    """Restore into the structure of example_tree. Returns (tree, step)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "state.npz"))
    leaves, treedef = _flatten(example_tree)
    assert meta["num_leaves"] == len(leaves), "checkpoint/structure mismatch"
    new_leaves = [
        np.asarray(data[f"leaf_{i}"], dtype=np.asarray(l).dtype)
        for i, l in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta.get("step")


def exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "meta.json"))
