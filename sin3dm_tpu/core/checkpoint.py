"""Checkpoint IO: param pytrees as npz + json metadata.

Keeps the reference's file-name contracts at the CLI surface
(AE `ckpt_final.pth` — `src/encoding/model.py:141-157`; diffusion
`ema_{rate}_{step:06d}.pt` + `opt{step:06d}.pt` —
`src/diffusion/train_util.py:258-281`) while using a simple, torch-free
container: a compressed npz of leaves keyed by their pytree path, with a
structure fingerprint for integrity.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path: str, tree: Any, meta: Optional[Dict] = None) -> None:
    """Save a pytree of arrays. `meta` (json-serializable) rides along."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for i, (kp, leaf) in enumerate(flat):
        arrays[f"{i:05d}|{_path_str(kp)}"] = np.asarray(leaf)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    if meta is not None:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    # write through a file object: np.savez would otherwise append ".npz",
    # breaking the reference file-name contract (ema_*.pt, ckpt_final.pth).
    # tmp + atomic rename: a crash/preemption mid-write must not corrupt
    # the checkpoint being replaced (ckpt_latest.pth is the ONLY resume
    # point of a preempted AE run)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, like: Any):
    """Load leaves into the structure of `like` (a same-shaped pytree,
    e.g. freshly-initialized params). Returns (tree, meta)."""
    data = np.load(path, allow_pickle=False)
    meta = None
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode())
    keys = sorted(k for k in data.files if k != "__meta__")
    leaves_ref, treedef = jax.tree_util.tree_flatten(like)
    if len(keys) != len(leaves_ref):
        raise ValueError(
            f"checkpoint has {len(keys)} leaves, expected {len(leaves_ref)}")
    loaded = []
    flat_paths = [
        _path_str(kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(like)[0]]
    for k, ref_leaf, ref_path in zip(keys, leaves_ref, flat_paths):
        stored_path = k.split("|", 1)[1]
        if stored_path != ref_path:
            raise ValueError(
                f"checkpoint structure mismatch: {stored_path} != {ref_path}")
        a = data[k]
        if tuple(a.shape) != tuple(np.shape(ref_leaf)):
            raise ValueError(
                f"shape mismatch at {stored_path}: "
                f"{a.shape} vs {np.shape(ref_leaf)}")
        loaded.append(jax.numpy.asarray(a))
    return jax.tree_util.tree_unflatten(treedef, loaded), meta


def peek_paths(path: str):
    """Stored leaf paths in a checkpoint (no array data loaded)."""
    data = np.load(path, allow_pickle=False)
    return [k.split("|", 1)[1] for k in sorted(data.files)
            if k != "__meta__"]


def load_subtree(path: str, like: Any, prefix: str):
    """Load only the leaves whose stored path starts with `prefix + '/'`
    into the structure of `like`.

    Lets a combined checkpoint (e.g. AE `ckpt_final.pth` holding
    params + optimizer state + step, mirroring the reference's
    net/optimizer/scheduler bundle, `src/encoding/model.py:141-157`) be
    partially loaded by consumers that only need one component (decode
    paths need params only).  Returns (tree, meta).
    """
    data = np.load(path, allow_pickle=False)
    meta = None
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode())
    want = prefix + "/"
    keys = sorted(k for k in data.files
                  if k != "__meta__" and k.split("|", 1)[1].startswith(want))
    leaves_ref, treedef = jax.tree_util.tree_flatten(like)
    if len(keys) != len(leaves_ref):
        raise ValueError(
            f"checkpoint has {len(keys)} leaves under '{prefix}/', "
            f"expected {len(leaves_ref)}")
    flat_paths = [
        _path_str(kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(like)[0]]
    loaded = []
    for k, ref_leaf, ref_path in zip(keys, leaves_ref, flat_paths):
        stored_path = k.split("|", 1)[1][len(want):]
        if stored_path != ref_path:
            raise ValueError(
                f"checkpoint structure mismatch under '{prefix}/': "
                f"{stored_path} != {ref_path}")
        a = data[k]
        if tuple(a.shape) != tuple(np.shape(ref_leaf)):
            raise ValueError(
                f"shape mismatch at {prefix}/{stored_path}: "
                f"{a.shape} vs {np.shape(ref_leaf)}")
        loaded.append(jax.numpy.asarray(a))
    return jax.tree_util.tree_unflatten(treedef, loaded), meta


def save_meta_json(path: str, meta: Dict) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)


def load_meta_json(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)
