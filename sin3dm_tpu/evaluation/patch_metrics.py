"""Patch-based geometry metrics: LP-IoU, LP-F-score, Div.

Re-implements `/root/reference/evaluation/patch_utils.py` TPU-natively:
patch extraction and the O(N_gen x N_ref) pairwise patch comparison (the
reference's hot loop, `patch_utils.py:46-122`) are jitted batched matmuls
over {0,1} patch vectors — intersection counts become one big
int-matmul on the MXU instead of a python loop.

Definitions (parity with the reference):
* voxel grids are max-pooled down to 128^3 when larger
  (`patch_utils.py:8-27`),
* patches are 11^3 windows on a stride-5 lattice whose 3^3 center block is
  mixed-occupancy (`patch_utils.py:60-79`),
* LP-IoU: mean over gen patches of max IoU against ref patches; LP-F-score
  likewise with F1 over occupancy (`patch_utils.py:82-122`),
* Div: mean pairwise (1 - IoU) between generated voxel grids
  (`patch_utils.py:30-43, 169-181`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 11
STRIDE = 5
CENTER = 3


def pool_to(grid: np.ndarray, target: int = 128) -> np.ndarray:
    """Adaptive max-pool a boolean grid down to <= target per axis."""
    g = np.asarray(grid).astype(bool)
    for axis in range(3):
        n = g.shape[axis]
        if n > target:
            k = int(np.ceil(n / target))
            pad = (-n) % k
            if pad:
                padding = [(0, 0)] * 3
                padding[axis] = (0, pad)
                g = np.pad(g, padding)
            shape = list(g.shape)
            shape[axis] = g.shape[axis] // k
            shape.insert(axis + 1, k)
            g = g.reshape(shape).max(axis=axis + 1)
    return g


def load_voxel_npz(path: str, key: str = "vox_grid") -> np.ndarray:
    return pool_to(np.load(path)[key])


def load_sdf_npz_as_voxel(path: str, key: str = "sdf_grid") -> np.ndarray:
    return pool_to(np.load(path)[key] < 0)


def extract_patches(grid: np.ndarray) -> np.ndarray:
    """[N_patches, 11^3] uint8 — only near-surface (mixed-center) patches.

    Matches `patch_utils.py:46-74` exactly: the volume is zero-PADDED by
    patch//2 on every side before the stride-5 unfold (so the lattice
    includes boundary patches hanging off the original volume), and the
    center block is the 3^3 window at offset patch//2-1."""
    pad = PATCH // 2
    g = np.pad(np.asarray(grid).astype(np.uint8),
               [(pad, pad)] * 3)
    X, Y, Z = g.shape
    xs = range(0, X - PATCH + 1, STRIDE)
    ys = range(0, Y - PATCH + 1, STRIDE)
    zs = range(0, Z - PATCH + 1, STRIDE)
    patches = []
    c0 = PATCH // 2 - 1
    for i in xs:
        for j in ys:
            for k in zs:
                p = g[i:i + PATCH, j:j + PATCH, k:k + PATCH]
                c = p[c0:c0 + CENTER, c0:c0 + CENTER, c0:c0 + CENTER]
                s = int(c.sum())
                if 0 < s < CENTER ** 3:
                    patches.append(p.reshape(-1))
    if not patches:
        return np.zeros((0, PATCH ** 3), np.uint8)
    return np.stack(patches)


@jax.jit
def _pairwise_max_scores(gen: jax.Array, ref: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
    """gen [G, P], ref [R, P] float32 in {0,1} ->
    (max IoU per gen patch [G], max F-score per gen patch [G])."""
    inter = gen @ ref.T                                   # [G, R]
    gsum = gen.sum(axis=1, keepdims=True)                 # [G, 1]
    rsum = ref.sum(axis=1, keepdims=True).T               # [1, R]
    union = gsum + rsum - inter
    iou = inter / jnp.maximum(union, 1.0)
    precision = inter / jnp.maximum(gsum, 1.0)
    recall = inter / jnp.maximum(rsum, 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-8)
    return iou.max(axis=1), f1.max(axis=1)


LP_THRESHOLD = 0.95  # percent variant: fraction of patches scoring above


def lp_score_arrays(gen_grid: np.ndarray, ref_patches: np.ndarray,
                    chunk: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Per-gen-patch (max IoU, max F-score) arrays vs reference patches."""
    gp = extract_patches(gen_grid)
    if len(gp) == 0 or len(ref_patches) == 0:
        return np.zeros(0), np.zeros(0)
    ref = jnp.asarray(ref_patches, jnp.float32)
    ious, fs = [], []
    for i in range(0, len(gp), chunk):
        g = jnp.asarray(gp[i:i + chunk], jnp.float32)
        iou, f1 = _pairwise_max_scores(g, ref)
        ious.append(np.asarray(iou))
        fs.append(np.asarray(f1))
    return np.concatenate(ious), np.concatenate(fs)


def lp_scores(gen_grid: np.ndarray, ref_patches: np.ndarray,
              chunk: int = 4096) -> Tuple[float, float]:
    """(LP-IoU, LP-F-score) of one generated grid vs reference patches
    — the reference's "avg" variant (mean over gen patches of the max
    score, `patch_utils.py:95,119`)."""
    ious, fs = lp_score_arrays(gen_grid, ref_patches, chunk)
    if len(ious) == 0:
        return 0.0, 0.0
    return float(ious.mean()), float(fs.mean())


def eval_lp(gen_grids: Sequence[np.ndarray],
            ref_grid: np.ndarray) -> Tuple[float, float]:
    """Mean LP-IoU / LP-F-score (avg variant) over generated grids
    (`patch_utils.py:125`)."""
    ref_patches = extract_patches(ref_grid)
    ious, fs = [], []
    for g in gen_grids:
        i, f = lp_scores(g, ref_patches)
        ious.append(i)
        fs.append(f)
    return float(np.mean(ious)), float(np.mean(fs))


def eval_lp_full(gen_grids: Sequence[np.ndarray], ref_grid: np.ndarray
                 ) -> dict:
    """All four reference LP metrics (`patch_utils.py:163-166`):
    avg (mean of per-patch max score) and percent (fraction of patches
    with score > 0.95) for both IoU and F-score."""
    ref_patches = extract_patches(ref_grid)
    iou_avg, iou_pct, f_avg, f_pct = [], [], [], []
    for g in gen_grids:
        ious, fs = lp_score_arrays(g, ref_patches)
        if len(ious) == 0:
            iou_avg.append(0.0); iou_pct.append(0.0)
            f_avg.append(0.0); f_pct.append(0.0)
            continue
        iou_avg.append(float(ious.mean()))
        iou_pct.append(float((ious > LP_THRESHOLD).mean()))
        f_avg.append(float(fs.mean()))
        f_pct.append(float((fs > LP_THRESHOLD).mean()))
    return {"LP-IOU-avg": float(np.mean(iou_avg)),
            "LP-IOU-percent": float(np.mean(iou_pct)),
            "LP-F-score-avg": float(np.mean(f_avg)),
            "LP-F-score-percent": float(np.mean(f_pct))}


def grid_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Whole-grid IoU; grids are aligned (same source AABB) and
    size-matched by zero-padding to the larger extent."""
    shape = np.maximum(a.shape, b.shape)
    pa = np.zeros(shape, bool)
    pb = np.zeros(shape, bool)
    pa[:a.shape[0], :a.shape[1], :a.shape[2]] = a
    pb[:b.shape[0], :b.shape[1], :b.shape[2]] = b
    inter = np.logical_and(pa, pb).sum()
    union = np.logical_or(pa, pb).sum()
    return float(inter) / max(float(union), 1.0)


def eval_div(gen_grids: Sequence[np.ndarray]) -> float:
    """Mean pairwise (1 - IoU) among generated grids
    (`patch_utils.py:30-43`)."""
    n = len(gen_grids)
    if n < 2:
        return 0.0
    vals = []
    for i in range(n):
        for j in range(i + 1, n):
            vals.append(1.0 - grid_iou(gen_grids[i], gen_grids[j]))
    return float(np.mean(vals))
