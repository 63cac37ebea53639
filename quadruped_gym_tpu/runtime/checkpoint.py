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


_ORBAX_MARKERS = (
    "_CHECKPOINT_METADATA", "checkpoint", "manifest.ocdbt", "_METADATA", "d",
)


def _looks_like_orbax(path: str) -> bool:
    if not os.path.isdir(path) or os.path.exists(os.path.join(path, "state.npz")):
        return False
    entries = set(os.listdir(path))
    if entries & set(_ORBAX_MARKERS):
        return True
    # orbax CheckpointManager layout: numbered step dirs containing the above
    return any(
        e.isdigit()
        and os.path.isdir(os.path.join(path, e))
        and set(os.listdir(os.path.join(path, e))) & set(_ORBAX_MARKERS)
        for e in entries
    )


def save(path: str, tree: Any, step: Optional[int] = None) -> None:
    """Save a pytree. Directory layout: <path>/state.npz + meta.json.

    Atomic: both files are written to temporaries and renamed into place
    (state first, meta last), so a crash mid-save can never leave a
    restore-able meta.json pointing at a torn state.npz — crash resume
    (rl/train.py) always sees the last complete checkpoint. The step is
    stored inside the npz itself, so even a crash between the two renames
    cannot pair step-N meta with step-N+1 state (restore trusts the npz)."""
    os.makedirs(path, exist_ok=True)
    leaves, _ = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if step is not None:
        arrays["__step__"] = np.asarray(int(step), dtype=np.int64)
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
    if _looks_like_orbax(path):
        raise ValueError(
            f"{path!r} looks like an Orbax checkpoint (round-1 format). This "
            "restore reads the npz+meta layout only — re-save with "
            "checkpoint.save(), or restore with orbax.checkpoint directly."
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "state.npz"))
    leaves, treedef = _flatten(example_tree)
    assert meta["num_leaves"] == len(leaves), "checkpoint/structure mismatch"
    # read dtype from the leaf WITHOUT materializing it: np.asarray on a
    # device array is a device->host transfer of every example leaf (the
    # example is typically a freshly-initialized on-device train state),
    # and large D2H pulls through the axon tunnel have been observed to
    # hang indefinitely at restore time
    new_leaves = [
        np.asarray(data[f"leaf_{i}"], dtype=getattr(l, "dtype", None)
                   or np.asarray(l).dtype)
        for i, l in enumerate(leaves)
    ]
    # the npz-embedded step is authoritative (written atomically with the
    # leaves); meta.json's copy is a fallback for older checkpoints
    step = int(data["__step__"]) if "__step__" in data else meta.get("step")
    return jax.tree_util.tree_unflatten(treedef, new_leaves), step


def exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "meta.json"))
