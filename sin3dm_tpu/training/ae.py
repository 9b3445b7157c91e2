"""Shape-autoencoder trainer — TPU-native counterpart of the reference
`ShapeAutoEncoder` (`/root/reference/src/encoding/model.py:15-516`).

The whole iteration — random point-batch gather, full-volume encode,
triplane decode, weighted-L1 SDF + masked texture losses, split-lr AdamW +
exponential decay — is ONE jitted function.  The reference re-runs the
dense Conv3d encode every step (`model.py:189` -> `networks.py:222`); we
keep those gradient semantics but XLA fuses the whole step.

Data-parallel: with a mesh, the 65k-point batch shards over 'data'
(SURVEY.md §2.3); the volume and params stay replicated.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import checkpoint as ckpt
from ..core.triplane import Triplane
from ..models import autoencoder as ae


@dataclass
class AETrainerConfig:
    enc_batch_size: int = 65536
    enc_n_iters: int = 25000
    enc_lr: float = 5e-3
    enc_lr_decay: float = 0.1          # final lr ratio (`model.py:131`)
    enc_lr_split: float = 0.2          # geo-params lr multiplier
    vol_ratio: float = 0.1             # fraction of grid points per batch
    tex_threshold_ratio: float = 0.999
    tex_weight: float = 1.0
    sdf_loss: str = "weightedl1"       # l1 | weightedl1
    tex_loss: str = "l1"               # l1 | l2 | huber
    sdf_renorm: bool = False
    fm_reso: int = 128
    # fuse K iterations per dispatch (lax.scan) — amortizes host launch
    # latency; the dataset is device-resident so nothing needs the host
    steps_per_call: int = 1
    # texture-bake point wire format (SIN3DM_TEXEL_WIRE env overrides):
    #   "runs" (default): per-row position spans expanded ON DEVICE
    #       (geometry.cpp geo_rasterize_uv_runs), compact pack — u16
    #       starts + f16 normalized steps, 16 B/run (~1.5 B/texel),
    #   "runs32": same spans shipped fp32 (28 B/run, positions exact),
    #   "u16": AABB-relative uint16 points (<=1-LSB texel flips vs fp32),
    #   "f32": dense fp32 points (bit-exact legacy wire).
    texel_wire: str = "runs"


class AEData(NamedTuple):
    """Device-resident training data (loaded from the mesh-sampler npz,
    schema at `data/mesh_sampler.py:218-222`)."""
    input_grid: jax.Array        # [1, X, Y, Z, 1+Ct] (sdf first)
    pts_grid: jax.Array          # [Ng, 3]
    sdf_grid: jax.Array          # [Ng, 1] clamped to +-threshold
    pts_near_surf: jax.Array     # [Ns, 3]
    sdf_near_surf: jax.Array     # [Ns, 1]
    tex_grid: Optional[jax.Array]
    tex_near_surf: Optional[jax.Array]
    pts_on_surf: Optional[jax.Array]
    tex_on_surf: Optional[jax.Array]
    aabb: jax.Array              # [6]


class TexelRuns(NamedTuple):
    """Run-length texel wire payload (`geometry/native.py
    rasterize_uv_runs`): [n, 7] float32 rows of (start xyz, step xyz,
    length), sorted/trimmed to row-major masked order."""
    runs: np.ndarray


SHUFFLE_SEED = 12345


def host_shuffle_permutations(n_grid: int, n_near: int):
    """The host-side point-table shuffle.  Called ONLY by `load_ae_data`,
    which applies (grid_perm, near_perm) to the point tables and hands
    grid_perm back to the trainer so `AETrainer.evaluate` can align its
    dense grid-ordered predictions with the shuffled ground truth without
    re-deriving RNG state."""
    rng = np.random.default_rng(SHUFFLE_SEED)
    return rng.permutation(n_grid), rng.permutation(n_near)


def compute_featmap_size(grid_shape, fm_reso: int) -> Tuple[int, int, int]:
    """Per-axis featmap size scaled by grid extent, floored to even
    (`model.py:75-76`)."""
    g = np.array(grid_shape[:3], dtype=np.float64)
    fm = (g * (fm_reso / g.max())).astype(np.int64)
    return tuple(int(x // 2 * 2) for x in fm)


def load_ae_data(npz_path: str, cfg: AETrainerConfig,
                 data_type: str = "sdftex"):
    """Load the sampler npz; returns (AEData, meta dict, grid_perm).

    `grid_perm` (np.ndarray) is the permutation applied to the dense-grid
    point tables; `AETrainer.evaluate` uses it to reorder grid-ordered
    dense predictions to match the shuffled targets.

    Mirrors `_load_data` (`model.py:51-112`): clamp SDFs to the stored
    threshold, trilinear-resize the dense grid to 2x the featmap size,
    cap on-surface points at 2M, optional sdf renorm to [-1, 1].
    """
    from ..core.nn import resize_trilinear

    data = np.load(npz_path)
    aabb = np.asarray(data["aabb"], np.float32)
    threshold = float(data["threshold"])
    meta = {
        "aabb": aabb.tolist(),
        "threshold": threshold,
        "Ka": np.asarray(data["Ka"]).tolist() if "Ka" in data else [0, 0, 0],
        "Kd": np.asarray(data["Kd"]).tolist() if "Kd" in data else [1, 1, 1],
        "Ks": np.asarray(data["Ks"]).tolist() if "Ks" in data
        else [0.4, 0.4, 0.4],
        "Ns": np.asarray(data["Ns"]).tolist() if "Ns" in data else 10,
    }

    pts_grid = np.asarray(data["pts_grid"], np.float32)
    sdf_grid = np.asarray(data["sdf_grid"], np.float32)
    fm_size = compute_featmap_size(pts_grid.shape, cfg.fm_reso)
    meta["featmap_size"] = list(fm_size)
    meta["grid_shape"] = list(pts_grid.shape[:3])

    use_tex = data_type != "sdf"
    if use_tex:
        tex_grid = np.asarray(data["tex_grid"], np.float32)
        vol = np.concatenate([sdf_grid[..., None], tex_grid], axis=-1)
    else:
        vol = sdf_grid[..., None]
    vol_j = jnp.asarray(vol)[None]  # [1, X, Y, Z, C]
    required = tuple(x * 2 for x in fm_size)
    if vol.shape[:3] != required:
        vol_j = resize_trilinear(vol_j, required)

    clamp = lambda s: np.clip(s, -threshold, threshold)
    sdf_grid_flat = clamp(sdf_grid.reshape(-1, 1))
    pts_near = np.asarray(data["pts_near_surf"], np.float32).reshape(-1, 3)
    sdf_near = clamp(np.asarray(data["sdf_near_surf"],
                                np.float32).reshape(-1, 1))
    if cfg.sdf_renorm:
        sdf_grid_flat = sdf_grid_flat / threshold
        sdf_near = sdf_near / threshold

    # shuffle the point tables ONCE on the host: the train step then draws
    # batches as contiguous random-offset slices (lax.dynamic_slice)
    # instead of 65k-row gathers — XLA lowers large-table gathers on TPU
    # to serial loops (~100x slower than the slice).  grid_perm is returned
    # to the caller so evaluate() can align dense (grid-ordered)
    # predictions with these shuffled targets.
    grid_perm, near_perm = host_shuffle_permutations(
        sdf_grid_flat.shape[0], pts_near.shape[0])
    pts_grid_flat = pts_grid.reshape(-1, 3)[grid_perm]
    sdf_grid_flat = sdf_grid_flat[grid_perm]
    pts_near = pts_near[near_perm]
    sdf_near = sdf_near[near_perm]

    tex_g = tex_n = pts_s = tex_s = None
    if use_tex:
        tc = tex_grid.shape[-1]
        tex_g = jnp.asarray(tex_grid.reshape(-1, tc)[grid_perm])
        tex_n = jnp.asarray(
            np.asarray(data["tex_near_surf"],
                       np.float32).reshape(-1, tc)[near_perm])
        pts_s_np = np.asarray(data["pts_on_surf"], np.float32).reshape(-1, 3)
        tex_s_np = np.asarray(data["tex_on_surf"],
                              np.float32).reshape(-1, tc)
        if pts_s_np.shape[0] > 2_000_000:
            idx = np.random.default_rng(0).permutation(
                pts_s_np.shape[0])[:2_000_000]
            pts_s_np, tex_s_np = pts_s_np[idx], tex_s_np[idx]
        pts_s, tex_s = jnp.asarray(pts_s_np), jnp.asarray(tex_s_np)

    ae_data = AEData(
        input_grid=vol_j,
        pts_grid=jnp.asarray(pts_grid_flat),
        sdf_grid=jnp.asarray(sdf_grid_flat),
        pts_near_surf=jnp.asarray(pts_near),
        sdf_near_surf=jnp.asarray(sdf_near),
        tex_grid=tex_g, tex_near_surf=tex_n,
        pts_on_surf=pts_s, tex_on_surf=tex_s,
        aabb=jnp.asarray(aabb))
    return ae_data, meta, grid_perm


# ---------------------------------------------------------------------------
# Losses (`model.py:186-237`)
# ---------------------------------------------------------------------------

def sdf_loss_fn(kind: str, pred, gt):
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - gt))
    if kind == "weightedl1":
        lamb = 0.5
        weight = 1.0 + lamb * jnp.sign(gt) * jnp.sign(gt - pred)
        return jnp.mean(jnp.abs(pred - gt) * weight)
    raise NotImplementedError(kind)


def masked_tex_loss_fn(kind: str, pred, gt, mask):
    """Mean over masked points only (parity with `F.l1_loss(pred[mask],
    gt[mask])`); safe when the mask is empty."""
    m = mask.astype(pred.dtype)[:, None]
    n = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
    if kind == "l1":
        e = jnp.abs(pred - gt)
    elif kind == "l2":
        e = (pred - gt) ** 2
    elif kind == "huber":
        delta = 0.1
        a = jnp.abs(pred - gt)
        e = jnp.where(a < delta, 0.5 * a ** 2 / delta, a - 0.5 * delta)
    else:
        raise NotImplementedError(kind)
    return jnp.sum(e * m) / n


def make_optimizer(cfg: AETrainerConfig, param_labels: Dict):
    """AdamW (torch default wd=0.01) + per-step exponential decay to
    `enc_lr_decay` x over n_iters, geo group update scaled by
    `enc_lr_split` (`model.py:129-139`)."""
    gamma = cfg.enc_lr_decay ** (1.0 / cfg.enc_n_iters)
    sched = lambda count: cfg.enc_lr * (gamma ** count)
    base = optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=0.01)
    if cfg.enc_lr_split <= 0:
        return base
    scale_geo = optax.multi_transform(
        {"geo": optax.scale(cfg.enc_lr_split), "tex": optax.identity()},
        param_labels)
    return optax.chain(base, scale_geo)


def _strip_batch(feat: Triplane, keep: bool = True) -> Triplane:
    """Ensure planes have a leading batch dim of 1 (decode paths expect
    [1, H, W, C])."""
    if feat.xy.ndim == 3:
        return Triplane(feat.xy[None], feat.xz[None], feat.yz[None])
    return feat


class AETrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jax.Array


def make_train_step(acfg: ae.AEConfig, tcfg: AETrainerConfig,
                    data: AEData, threshold: float, param_labels: Dict,
                    mesh=None):
    """Jitted AE train step.

    Returns step_fn(state, data, key) -> (state, metrics).  `data` is an
    explicit argument — NOT a closure capture: closed-over device arrays
    get baked into the HLO as literal constants, ballooning the compile
    payload by the full dataset size (hundreds of MB), which can kill
    remote compile services outright.  The `data` passed at construction
    is only used for static shape/ratio information.
    """
    opt = make_optimizer(tcfg, param_labels)
    bs = tcfg.enc_batch_size
    n_grid = int(bs * tcfg.vol_ratio)
    n_surf = bs - n_grid
    use_tex = acfg.use_tex
    tex_thr = (1.0 * tcfg.tex_threshold_ratio if tcfg.sdf_renorm
               else threshold * tcfg.tex_threshold_ratio)

    n_sub = 8  # independent sub-slices per batch to decorrelate windows

    def sample_batch(data: AEData, key):
        """Contiguous random-offset sub-slices from the pre-shuffled
        tables (load_ae_data shuffles once).  A 65k-row random gather from
        multi-million-row tables lowers to a serial loop on TPU — slices
        are ~100x faster; 8 independent windows per source keep the SGD
        statistics close to iid sampling."""
        kg, ks = jax.random.split(key)

        def multi_slice(arrs, total, kk):
            chunk = max(total // n_sub, 1)
            sizes = [chunk] * (n_sub - 1) + [total - chunk * (n_sub - 1)]
            n_rows = arrs[0].shape[0]
            offs = jax.random.randint(kk, (n_sub,), 0,
                                      n_rows - max(sizes) + 1)
            outs = [[] for _ in arrs]
            for j, sz in enumerate(sizes):
                for a_i, a in enumerate(arrs):
                    outs[a_i].append(jax.lax.dynamic_slice_in_dim(
                        a, offs[j], sz, axis=0))
            return [jnp.concatenate(o) for o in outs]

        g_arrs = [data.pts_grid, data.sdf_grid]
        s_arrs = [data.pts_near_surf, data.sdf_near_surf]
        if use_tex:
            g_arrs.append(data.tex_grid)
            s_arrs.append(data.tex_near_surf)
        g_out = multi_slice(g_arrs, n_grid, kg)
        s_out = multi_slice(s_arrs, n_surf, ks)

        pts = jnp.concatenate([g_out[0], s_out[0]])
        sdf = jnp.concatenate([g_out[1], s_out[1]])
        if use_tex:
            return pts, sdf, jnp.concatenate([g_out[2], s_out[2]])
        return pts, sdf, None

    def loss_fn(params, data, pts, gt_sdf, gt_tex):
        pred = ae.forward(params, acfg, data.input_grid, pts, data.aabb)
        pred_sdf = pred[..., :1]
        losses = {"sdf_loss": sdf_loss_fn(tcfg.sdf_loss, pred_sdf, gt_sdf)}
        if use_tex:
            mask = jnp.abs(gt_sdf[:, 0]) < tex_thr
            pred_tex = pred[..., 1:]
            if acfg.data_type == "sdfpbr":
                losses["rgb_loss"] = masked_tex_loss_fn(
                    tcfg.tex_loss, pred_tex[:, :3], gt_tex[:, :3],
                    mask) * tcfg.tex_weight
                losses["mr_loss"] = masked_tex_loss_fn(
                    tcfg.tex_loss, pred_tex[:, 3:5], gt_tex[:, 3:5],
                    mask) * tcfg.tex_weight
                losses["normal_loss"] = masked_tex_loss_fn(
                    tcfg.tex_loss, pred_tex[:, 5:], gt_tex[:, 5:],
                    mask) * tcfg.tex_weight
            else:
                losses["tex_loss"] = masked_tex_loss_fn(
                    tcfg.tex_loss, pred_tex, gt_tex, mask) * tcfg.tex_weight
        total = sum(losses.values())
        return total, losses

    def step_fn(state: AETrainState, data: AEData, key: jax.Array):
        pts, sdf, tex = sample_batch(data, key)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P("data"))
            pts = jax.lax.with_sharding_constraint(pts, sh)
            sdf = jax.lax.with_sharding_constraint(sdf, sh)
            if tex is not None:
                tex = jax.lax.with_sharding_constraint(tex, sh)
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, data, pts, sdf, tex)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        return AETrainState(params, opt_state, state.step + 1), metrics

    if tcfg.steps_per_call > 1:
        inner = step_fn

        def step_fn(state: AETrainState, data: AEData, key: jax.Array):
            def body(st, i):
                return inner(st, data, jax.random.fold_in(key, i))

            state, stacked = jax.lax.scan(
                body, state, jnp.arange(tcfg.steps_per_call))
            return state, {k: v[-1] for k, v in stacked.items()}

    return jax.jit(step_fn, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Evaluation (`model.py:290-309, 491-516`)
# ---------------------------------------------------------------------------

def evaluate_tsdf_prediction(pred_sdf: np.ndarray, gt_sdf: np.ndarray,
                             sdf_threshold: float) -> Dict[str, float]:
    """Bucketed TSDF L1 / relative error / sign accuracy."""
    res: Dict[str, float] = {}
    l1 = np.abs(pred_sdf - gt_sdf)
    # the reference divides by |gt| unguarded (`model.py:497`), which
    # poisons every rel bucket with inf/nan when a sample's gt SDF is
    # exactly 0 (on-surface grid point); exclude those rows from the rel
    # means instead — identical values whenever no exact zero exists
    denom = np.abs(gt_sdf)
    nz = denom > 0
    rel = np.divide(l1, denom, out=np.zeros_like(l1), where=nz)
    acc = (pred_sdf * gt_sdf >= 0).astype(np.float32)
    res["mean_tsdf_l1_error"] = float(l1.mean())
    res["mean_tsdf_rel_error"] = (
        float(rel[nz].mean()) if nz.any() else float("nan"))
    res["mean_tsdf_acc"] = float(acc.mean())
    n = 4
    unit = sdf_threshold / n
    ranges = [i * unit for i in range(n + 1)] + [unit * (n + 1)]
    for i in range(len(ranges) - 1):
        m = (np.abs(gt_sdf) >= ranges[i]) & (np.abs(gt_sdf) < ranges[i + 1])
        suffix = f"{i}-{n}-{i + 1}-n"
        res[f"mean_tsdf_l1_error_{suffix}"] = (
            float(l1[m].mean()) if m.any() else float("nan"))
        mr = m & nz
        res[f"mean_tsdf_rel_error_{suffix}"] = (
            float(rel[mr].mean()) if mr.any() else float("nan"))
        res[f"mean_tsdf_acc_{suffix}"] = (
            float(acc[m].mean()) if m.any() else float("nan"))
        res[f"mean_tsdf_count_{suffix}"] = int(m.sum())
    return res


# ---------------------------------------------------------------------------
# High-level trainer object (checkpoint name contract: ckpt_final.pth)
# ---------------------------------------------------------------------------

class AETrainer:
    def __init__(self, log_dir: str, acfg: ae.AEConfig,
                 tcfg: AETrainerConfig, mesh=None):
        self.log_dir = log_dir
        self.acfg = acfg
        self.tcfg = tcfg
        self.mesh = mesh
        self.params: Optional[Dict] = None
        self.data: Optional[AEData] = None
        self.grid_perm: Optional[np.ndarray] = None
        self.meta: Dict = {}
        self._jit_process = None
        self._jit_decode = None
        self._jit_grid_dense = {}
        self._sparse_jit = None
        # Serializes device dispatch when decode_texmesh runs for several
        # samples in concurrent threads: CPU geometry stages overlap, but
        # interleaved TPU dispatches from multiple host threads thrash the
        # dispatch path (measured 8.5x slower through a high-RTT link).
        self._tpu_lock = threading.Lock()
        # Single background writer for the export tail (texel gather +
        # texture assembly + PNG/OBJ write): its hot parts release the
        # GIL (device->host copies, C++ tex_assemble, cv2's libpng), so
        # it fills the main thread's chain-block sleep windows instead
        # of extending the pipeline's critical path.  One worker keeps
        # file outputs ordered; SIN3DM_ASYNC_EXPORT=0 restores the
        # synchronous tail.
        self._export_pool = None
        self._export_futs: list = []
        self._export_lock = threading.Lock()
        os.makedirs(log_dir, exist_ok=True)

    def _submit_assemble(self, **kw) -> None:
        """Run :meth:`_texmesh_assemble` on the background writer (or
        inline when async export is disabled)."""
        if os.environ.get("SIN3DM_ASYNC_EXPORT", "1") in ("0", "false", ""):
            self._texmesh_assemble(**kw)
            return
        with self._export_lock:
            if self._export_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._export_pool = ThreadPoolExecutor(
                    1, thread_name_prefix="sin3dm-export")
            fut = self._export_pool.submit(self._texmesh_assemble, **kw)
            self._export_futs.append(fut)

    def _drain_exports(self) -> None:
        """Block until every submitted export finished; re-raise the
        first worker error.  Decode entry points drain before returning,
        so callers still observe files-on-return semantics."""
        with self._export_lock:
            futs, self._export_futs = self._export_futs, []
        for fut in futs:
            fut.result()

    def _fused_heads(self) -> bool:
        """Route inference MLP heads through the Pallas VMEM-resident
        kernel (ops/fused_mlp.py) — on by default on TPU, off on CPU
        (interpret-mode pallas is slow); SIN3DM_FUSED_HEADS=0/1 overrides.
        Training is unaffected (the kernel defines no VJP)."""
        env = os.environ.get("SIN3DM_FUSED_HEADS")
        if env is not None:
            return env not in ("0", "false", "")
        return jax.default_backend() not in ("cpu",)

    def _ensure_decode_jits(self) -> None:
        if self._jit_process is not None:
            return
        fused = self._fused_heads()
        self._jit_process = jax.jit(
            lambda p, f: ae.process_planes(p, self.acfg, f))
        self._jit_decode = jax.jit(
            lambda p, gp, tp, pts, ab: ae.decode_points(
                p, self.acfg, gp, tp, pts, ab, fused_heads=fused))

    def _grid_dense_jit(self):
        """One cached jit wrapper for the dense grid decode (a fresh
        `jax.jit(...)` per sample would re-trace every call)."""
        fn = self._jit_grid_dense.get("fn")
        if fn is None:
            fn = jax.jit(ae.decode_grid_dense,
                         static_argnums=(1, 4, 5, 6, 7, 8, 9))
            self._jit_grid_dense["fn"] = fn
        return fn

    def decode_texels(self, feat: Triplane, points: np.ndarray,
                      aabb=None, batch_size: int = 2 ** 20) -> np.ndarray:
        """Texture-bake point decode -> uint8 [N, tex_channels].

        Unlike :meth:`decode_batch` the SDF head is skipped and colors are
        quantized on device (16x smaller device->host transfer — the
        decode path is transfer-bound through this container's tunnel and
        on real hardware the PCIe/host path still likes it)."""
        assert self.params is not None and self.acfg.use_tex
        feat = _strip_batch(feat)
        self._ensure_decode_jits()
        if aabb is None:
            aabb = self.meta["aabb"]
        aabb = jnp.asarray(np.asarray(aabb), jnp.float32)
        fn = self._jit_grid_dense.get("texels")
        if fn is None:
            fused = self._fused_heads()
            fn = jax.jit(lambda p, tp, pts, ab: ae.decode_texels(
                p, self.acfg, tp, pts, ab, fused_heads=fused))
            self._jit_grid_dense["texels"] = fn
        points = np.asarray(points, np.float32)
        N = points.shape[0]
        outs = []
        with self._tpu_lock:
            _, tex_planes = self._jit_process(self.params, feat)
            for i in range(0, N, batch_size):
                chunk = points[i:i + batch_size]
                n = chunk.shape[0]
                if n < batch_size:
                    chunk = np.pad(chunk, ((0, batch_size - n), (0, 0)))
                out = fn(self.params, tex_planes, jnp.asarray(chunk), aabb)
                outs.append(np.asarray(out)[:n])
        return np.concatenate(outs, axis=0)

    def load_data(self, npz_path: str):
        self.data, self.meta, self.grid_perm = load_ae_data(
            npz_path, self.tcfg, self.acfg.data_type)

    def train(self, key: jax.Array, n_iters: Optional[int] = None,
              log_every: int = 100, eval_every: Optional[int] = None,
              resume: bool = False, save_every: Optional[int] = None):
        """Fit the AE.  `resume=True` continues from `ckpt_latest.pth`
        (params + optimizer state + step — the working version of the
        reference's saved-but-never-loaded optimizer bundle,
        `model.py:141-176`); `save_every` writes that intermediate
        checkpoint periodically (default: the eval cadence)."""
        assert self.data is not None
        n_iters = n_iters or self.tcfg.enc_n_iters
        init_key, key = jax.random.split(key)
        start_iter = 0
        resumed = None
        if resume:
            resumed = self.load_train_state("latest")
        if self.params is None:
            self.params = ae.init_autoencoder(init_key, self.acfg)
        labels = ae.geo_param_labels(self.params)
        opt = make_optimizer(self.tcfg, labels)
        if resumed is not None:
            params, opt_state, start_iter = resumed
            from ..core import logger as _lg
            _lg.log(f"AE resume from iter {start_iter}")
            state = AETrainState(params, opt_state,
                                 jnp.asarray(start_iter, jnp.int32))
        else:
            state = AETrainState(self.params, opt.init(self.params),
                                 jnp.zeros((), jnp.int32))
        step_fn = make_train_step(self.acfg, self.tcfg, self.data,
                                  self.meta["threshold"], labels,
                                  mesh=self.mesh)
        from ..core import logger
        try:
            from tensorboardX import SummaryWriter
            tb = SummaryWriter(os.path.join(self.log_dir, "tblog"))
        except Exception:
            tb = None
        from ..core.profiling import step_annotation
        eval_every = eval_every or max(n_iters // 5, 1)
        save_every = save_every or eval_every
        K = max(self.tcfg.steps_per_call, 1)
        # host-constructed raw keys (see DiffusionTrainLoop.run): avoids a
        # device dispatch per loop iteration for jax.random.split
        base = int(np.asarray(jax.random.key_data(key) if hasattr(
            jax.random, "key_data") else key).ravel()[-1])
        for i in range(start_iter, n_iters, K):
            sk = jnp.asarray(np.array([base & 0xFFFFFFFF, i], np.uint32))
            with step_annotation("ae_train", i):
                state, metrics = step_fn(state, self.data, sk)
            if i % log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                for k, v in vals.items():
                    logger.logkv(f"ae/{k}", v)
                logger.logkv("ae/iter", i)
                logger.dumpkvs()
                if tb is not None:
                    tb.add_scalars("loss", vals, global_step=i)
            if tb is not None and (i == 0 or (i + K) % eval_every < K):
                # featmap heatmaps (`model.py:282-288`)
                self.params = jax.device_get(state.params)
                feat = self.encode()
                from ..core.rng import draw_scalar_field2D
                for pi, plane in enumerate(feat):
                    tb.add_figure(f"feat_map_{pi}",
                                  draw_scalar_field2D(
                                      np.asarray(plane)[0, :, :, 0]),
                                  global_step=i)
            if (i + K) % save_every < K and i + K < n_iters:
                # intermediate resumable checkpoint (params + opt + step)
                self.params = jax.device_get(state.params)
                self.save_ckpt("latest", opt_state=state.opt_state,
                               step=i + K)
        self.params = jax.device_get(state.params)

        eval_stat = self.evaluate()
        with open(os.path.join(self.log_dir, "eval_stat.json"), "w") as f:
            json.dump(eval_stat, f, indent=2)
        # final checkpoint bundles the optimizer state too (ref model.py:141)
        self.save_ckpt("final", opt_state=state.opt_state, step=n_iters)
        return eval_stat

    # -- encode / decode -----------------------------------------------------

    def encode(self) -> Triplane:
        assert self.data is not None and self.params is not None
        return jax.jit(ae.encode, static_argnums=(1,))(
            self.params, self.acfg, self.data.input_grid)

    def decode_batch(self, feat: Triplane, points, batch_size: int = 2 ** 16,
                     aabb=None) -> np.ndarray:
        """Chunked point decode with color clamp (`model.py:319-333`).

        The plane conv blocks run ONCE (the reference recomputes them for
        every 16k-point chunk, `model.py:327-330` -> `networks.py:204-212`);
        the final partial chunk is padded so one compiled shape serves the
        whole decode.
        """
        assert self.params is not None
        feat = _strip_batch(feat)
        if aabb is None:
            aabb = self.meta["aabb"]
        aabb = jnp.asarray(np.asarray(aabb), jnp.float32)

        self._ensure_decode_jits()
        points = np.asarray(points, np.float32)
        N = points.shape[0]
        if N == 0:
            n_out = 1 + (self.acfg.tex_channels if self.acfg.use_tex else 0)
            return np.zeros((0, n_out), np.float32)
        outs = []
        with self._tpu_lock:
            geo_planes, tex_planes = self._jit_process(self.params, feat)
            for i in range(0, N, batch_size):
                chunk = points[i:i + batch_size]
                n = chunk.shape[0]
                if n < batch_size:
                    chunk = np.pad(chunk, ((0, batch_size - n), (0, 0)))
                out = self._jit_decode(self.params, geo_planes, tex_planes,
                                       jnp.asarray(chunk), aabb)
                outs.append(np.asarray(out)[:n])
        preds = np.concatenate(outs, axis=0)
        if preds.shape[-1] > 1:
            preds[..., 1:] = np.clip(preds[..., 1:], 0.0, 1.0)
        return preds

    def decode_grid(self, feat: Triplane, reso: int, aabb=None,
                    batch_size: int = 2 ** 16,
                    dense: bool = True, geo_only: bool = False,
                    transfer_dtype=None) -> np.ndarray:
        """Decode the AABB voxel-center grid -> [Nx, Ny, Nz, 1+Ct]
        (`model.py:335-349`).

        dense=True uses the gather-free separable path
        (:func:`~sin3dm_tpu.models.autoencoder.decode_grid_dense`):
        voxel centers land exactly on bilinear half-pixel positions, so
        plane sampling over the grid is a plane resize — numerically equal
        to the chunked point path but MXU-bound.
        """
        from ..dataio.grid import grid_resolutions
        if aabb is None:
            aabb = self.meta["aabb"]
        res = tuple(int(x) for x in grid_resolutions(np.asarray(aabb), reso))
        if not dense:
            from ..dataio.grid import sample_grid_points_aabb
            coords = sample_grid_points_aabb(np.asarray(aabb), reso)
            preds = self.decode_batch(feat, coords.reshape(-1, 3),
                                      batch_size=batch_size, aabb=aabb)
            return preds.reshape(*res, -1)

        feat = _strip_batch(feat)
        self._ensure_decode_jits()
        with self._tpu_lock:
            geo_planes, tex_planes = self._jit_process(self.params, feat)
            fn = self._grid_dense_jit()
            out = fn(self.params, self.acfg, geo_planes, tex_planes, res,
                     8, geo_only, self._fused_heads(), transfer_dtype)
            preds = np.array(out, dtype=np.float32)  # writable fp32 copy
        if preds.shape[-1] > 1:
            preds[..., 1:] = np.clip(preds[..., 1:], 0.0, 1.0)
        return preds

    def _resize_aabb(self, featmap_size) -> np.ndarray:
        """Retargeted AABB when sampled planes differ from training size
        (`model.py:351-360`)."""
        base = np.asarray(self.meta["featmap_size"], np.float64)
        new = np.asarray(featmap_size, np.float64)
        aabb = np.asarray(self.meta["aabb"], np.float64)
        if not np.array_equal(base, new):
            scale = new / base
            out = aabb.copy()
            out[:3] = aabb[:3] * scale
            out[3:] = aabb[3:] * scale
            return out
        return aabb

    def decode_texmesh(self, save_dir: str, feat: Triplane, reso: int,
                       n_faces: int = 10000, n_surf_pc: int = -1,
                       texture_reso: int = 2048, only_largest_cc: bool = True,
                       save_highres_mesh: bool = False,
                       save_voxel: bool = True, mtl_path=None,
                       file_format: str = "obj",
                       verbose: bool = False) -> None:
        """Full mesh-extraction pipeline (`model.py:362-473`) for one
        sample; see :meth:`decode_texmesh_many` for the pipelined batch."""
        self.decode_texmesh_many(
            [save_dir], [feat], reso, n_faces=n_faces, n_surf_pc=n_surf_pc,
            texture_reso=texture_reso, only_largest_cc=only_largest_cc,
            save_highres_mesh=save_highres_mesh, save_voxel=save_voxel,
            mtl_path=mtl_path, file_format=file_format, verbose=verbose)

    def dispatch_geo_grids(self, feats, reso: int):
        """Dispatch the dense geo-grid decodes for a batch of samples
        WITHOUT blocking, returning handles for
        :meth:`decode_texmesh_many`'s `grid_handles` parameter.

        Lets callers interleave device work from elsewhere (e.g. the NEXT
        sampling chain) between a chunk's grid dispatch and its CPU
        geometry — the cross-chunk pipeline used by `cli.sample` and
        `bench.py`."""
        feats = [_strip_batch(f, keep=True) for f in feats]
        handles = []
        for feat in feats:
            H, W = feat.xy.shape[-3], feat.xy.shape[-2]
            D = feat.xz.shape[-2]
            aabb = self._resize_aabb((H, W, D))
            handles.append(self._dispatch_geo_grid(feat, reso, aabb))
        return handles

    def decode_texmesh_many(self, save_dirs, feats, reso: int,
                            n_faces: int = 10000, n_surf_pc: int = -1,
                            texture_reso: int = 2048,
                            only_largest_cc: bool = True,
                            save_highres_mesh: bool = False,
                            save_voxel: bool = True, mtl_path=None,
                            file_format: str = "obj",
                            grid_handles=None,
                            pending_in=None, defer_last: bool = False,
                            verbose: bool = False):
        """Mesh-extraction for a batch of samples, software-pipelined over
        JAX's async dispatch: every sample's dense SDF grid is dispatched
        up front (the device computes and streams them back while the host
        runs marching cubes/decimation/UV on earlier samples), and each
        sample's texel decode streams back while the NEXT sample's CPU
        geometry runs.  Single-threaded — on small hosts thread pools
        fight over cores; a dependency-ordered pipeline does not.

        Pipeline per sample: dense SDF grid (device) -> marching cubes,
        largest CC (`model.py:362-473`) -> renormalize -> decimation ->
        UV atlas + raster -> texel decode (device) -> seam dilation ->
        obj/glb/pbr export.

        With `defer_last=True` the final sample's assembly (texel gather +
        export) is NOT run; a pending token is returned for the caller to
        pass back as `pending_in` on the next call.  Cross-chunk callers
        go through :meth:`pipelined_generate`, which threads the token so
        the last sample's texel transfer streams underneath the next
        chunk's chain + geometry instead of blocking at the end of every
        chunk."""
        import time

        def tick(label, t0):
            if verbose:
                print(f"  [decode_texmesh] {label}: "
                      f"{time.perf_counter() - t0:.2f}s", flush=True)
            return time.perf_counter()

        feats = [_strip_batch(f, keep=True) for f in feats]
        aabbs = []
        for feat in feats:
            H, W = feat.xy.shape[-3], feat.xy.shape[-2]
            D = feat.xz.shape[-2]
            aabbs.append(self._resize_aabb((H, W, D)))

        # stage 1: dispatch ALL dense geo grids (async; device round-robins
        # them while the host chews on the first sample's geometry) —
        # unless the caller pre-dispatched them via dispatch_geo_grids
        if grid_handles is None:
            grid_handles = [self._dispatch_geo_grid(feat, reso, aabb)
                            for feat, aabb in zip(feats, aabbs)]
        else:
            grid_handles = list(grid_handles)

        pending = pending_in  # assemble kwargs awaiting texels
        for idx, (save_dir, feat, new_aabb) in enumerate(
                zip(save_dirs, feats, aabbs)):
            t0 = time.perf_counter()
            arr, quant, sparse = grid_handles[idx]
            sdf_grid = None
            if (sparse is not None
                    and int(sparse.count) <= sparse.block_ids.shape[0]):
                # sparse near-surface wire format (~3x smaller transfer):
                # MC-exact reconstruction from sign bits + flagged blocks
                from ..ops import sparse_grid as _sg
                if os.environ.get("SIN3DM_SPARSE_MC", "1") != "0":
                    # marching cubes consumes the wire directly (the dense
                    # fp32 grid is never materialized on the host); fetch
                    # the async-copied payload into numpy here
                    sparse = _sg.SparseGrid(
                        np.asarray(sparse.signs),
                        np.asarray(sparse.block_ids),
                        np.asarray(sparse.block_vals),
                        int(sparse.count), sparse.shape, sparse.padded)
                else:
                    sdf_grid = _sg.decode_host(sparse, quant)
                    sparse = None
            elif quant is not None:  # int8 wire -> dequantize on host
                # floor-quantized: bucket k covers [k, k+1) -> center k+.5
                # (keeps sdf<0 sign-exact and halves the offset)
                # (also the fallback when a pathological surface overflows
                # the sparse block budget — the dense array was kept)
                sparse = None
                sdf_grid = ((np.asarray(arr)[..., 0].astype(np.float32)
                             + 0.5) * (quant / 127.0))
            else:
                sparse = None
                sdf_grid = np.asarray(arr, np.float32)[..., 0]
            arr = None
            grid_handles[idx] = None  # free device + host buffers
            t0 = tick("sdf grid "
                      + ("(sparse wire)" if sparse is not None
                         else str(sdf_grid.shape)), t0)
            cpu = self._texmesh_geometry(
                save_dir, feat, sdf_grid, new_aabb, reso, n_faces,
                n_surf_pc, texture_reso, only_largest_cc,
                save_highres_mesh, save_voxel, tick, t0,
                sparse=sparse, quant=quant)
            if cpu is None:  # empty surface / sdf-only: nothing to bake
                continue
            texel_handle = self._dispatch_texels(
                feat, cpu["texels"], new_aabb)
            # assemble the PREVIOUS sample while this one's texels stream
            # (on the background writer: its GIL-free encode/IO overlaps
            # this sample's geometry and the next chain block)
            if pending is not None:
                self._submit_assemble(mtl_path=mtl_path,
                                      file_format=file_format,
                                      tick=tick, **pending)
            pending = dict(save_dir=save_dir, cpu=cpu,
                           texel_handle=texel_handle,
                           texture_reso=texture_reso)
        if defer_last:
            return pending
        if pending is not None:
            self._submit_assemble(mtl_path=mtl_path,
                                  file_format=file_format, tick=tick,
                                  **pending)
        self._drain_exports()  # files-on-return; re-raises worker errors
        return None

    def pipelined_generate(self, chunks, sample_chunk, prepare_chunk,
                           reso: int, **decode_kwargs) -> None:
        """Cross-chunk sample+decode pipeline — the ONE copy of the
        schedule used by both `cli.sample.generate` and `bench.py`.

        Per chunk: dispatch its reverse chain (`sample_chunk`), decode
        the previous chunk's meshes while that chain runs on the device
        (the last sample's assembly deferred so its texel transfer
        streams under the chain too), then block on the chain
        (`prepare_chunk`) and dispatch this chunk's dense SDF grids ahead
        of the next chain so the next iteration's CPU never stalls.

        sample_chunk(desc) -> device samples, dispatched asynchronously.
        prepare_chunk(desc, samples) -> (save_dirs, feats); this is where
        the chain's completion is awaited (e.g. np transfer / npz save).
        decode_kwargs are forwarded to :meth:`decode_texmesh_many`.
        """
        pending = None
        pending_asm = None
        try:
            for desc in chunks:
                samples = sample_chunk(desc)
                if pending is not None:
                    pending_asm = self.decode_texmesh_many(
                        pending[0], pending[1], reso,
                        grid_handles=pending[2],
                        pending_in=pending_asm, defer_last=True,
                        **decode_kwargs)
                    pending = None
                dirs, feats = prepare_chunk(desc, samples)
                handles = self.dispatch_geo_grids(feats, reso)
                pending = (dirs, feats, handles)
            if pending is not None:
                self.decode_texmesh_many(
                    pending[0], pending[1], reso, grid_handles=pending[2],
                    pending_in=pending_asm, **decode_kwargs)
                pending = None
                pending_asm = None
        except Exception:
            # Drain deferred work so already-sampled chunks still export:
            # a failure mid-pipeline must not silently drop the assembly of
            # earlier samples whose decode was deferred (ADVICE r1).
            # Exception only — KeyboardInterrupt/SystemExit must abort
            # promptly, not run minutes of decode first.
            try:
                if pending is not None:
                    self.decode_texmesh_many(
                        pending[0], pending[1], reso,
                        grid_handles=pending[2],
                        pending_in=pending_asm, **decode_kwargs)
                elif pending_asm is not None:
                    self._texmesh_assemble(
                        mtl_path=decode_kwargs.get("mtl_path"),
                        file_format=decode_kwargs.get("file_format", "obj"),
                        tick=lambda label, t0: t0, **pending_asm)
                self._drain_exports()  # flush background-writer exports
            except Exception:
                pass  # the original error is what the caller must see
            raise

    def _dispatch_geo_grid(self, feat: Triplane, reso: int, aabb):
        """Dispatch the dense geo-only grid decode; returns
        (device array, quant scale or None) without blocking.  The SDF
        channel is all the geometry stage needs (skips the texture MLPs,
        4x smaller transfer); the clamped TSDF is further quantized to
        int8 on device (floor quantization: the sign of every voxel is
        EXACTLY preserved, so voxel.npz occupancy matches the fp32 grid;
        surface shift <= ~0.012 voxels) — the path is transfer-bound, not
        precision-bound.  The sdf-only data type keeps fp16: its pipeline
        persists the raw grid values to sdfgrid_r{reso}.npz.  Under
        sdf_renorm the decoder emits threshold-NORMALIZED values (~[-1,1])
        so the quant scale is 1.0, not the threshold."""
        from ..dataio.grid import grid_resolutions
        res = tuple(int(x) for x in
                    grid_resolutions(np.asarray(aabb), reso))
        self._ensure_decode_jits()
        quant = None
        if self.acfg.data_type != "sdf":
            thr = float(self.meta["threshold"])
            quant = 1.0 if self.tcfg.sdf_renorm else (
                thr if thr > 0 else None)
        with self._tpu_lock:
            gp, tp = self._jit_process(self.params, feat)
            out = self._grid_dense_jit()(
                self.params, self.acfg, gp, tp, res, 8, True,
                self._fused_heads(),
                None if quant is not None else jnp.float16, quant)
            sparse = None
            if (quant is not None
                    and os.environ.get("SIN3DM_SPARSE_GRID", "1") != "0"):
                from ..ops import sparse_grid as _sg
                if self._sparse_jit is None:
                    self._sparse_jit = jax.jit(
                        lambda q: tuple(_sg.encode(q))[:4])
                signs, ids, vals, count = self._sparse_jit(out[..., 0])
                shape3 = tuple(int(s) for s in out.shape[:3])
                sparse = _sg.SparseGrid(signs, ids, vals, count, shape3,
                                        _sg.padded_shape(shape3))
        arrs = ((out,) if sparse is None
                else (sparse.signs, sparse.block_ids, sparse.block_vals,
                      sparse.count))
        for a in arrs:
            try:
                a.copy_to_host_async()
            except Exception:
                pass  # backends without async host copies still work
        return out, quant, sparse

    def _dispatch_texels_runs(self, feat: Triplane, runs: np.ndarray,
                              aabb, batch_size: int = 2 ** 20):
        """Dispatch the uint8 texel decode over the RUN-LENGTH wire
        (`geometry/native.py rasterize_uv_runs`): ship (start, step,
        length) spans, expand texel positions on device
        (`models/autoencoder.py decode_texels_runs`).

        Default wire is the COMPACT pack — u16 AABB-relative starts +
        f16 normalized steps + i32 offsets, 16 B/run (~1.5 B/texel at
        production atlas density vs the u16 point wire's 6) — precision
        at-or-above the old u16 default (only run STARTS carry the q16
        snap).  `SIN3DM_TEXEL_WIRE=runs32` ships fp32 spans (exact)."""
        self._ensure_decode_jits()
        aabb_np = np.asarray(aabb, np.float32).reshape(-1)
        aabb_d = jnp.asarray(aabb_np)
        wire = os.environ.get("SIN3DM_TEXEL_WIRE", self.tcfg.texel_wire)
        quantized = wire != "runs32"
        lens = runs[:, 6].astype(np.int64) if len(runs) else np.zeros(0,
                                                                      np.int64)
        N = int(lens.sum())
        # pow2-bucketed shapes: few distinct compiles, and small bakes
        # (low texreso) don't pay for a padded 2^20-point decode
        batch_size = min(batch_size,
                         1 << max(12, max(N - 1, 1).bit_length()))
        R = max(len(runs), 1)
        Rp = 1 << max(10, (R - 1).bit_length())
        offsets = np.full(Rp + 1, N, np.int32)
        offsets[0] = 0
        offsets[1:len(lens) + 1] = np.cumsum(lens, dtype=np.int64)
        if quantized:
            lo, span = aabb_np[:3], aabb_np[3:] - aabb_np[:3]
            starts = np.zeros((Rp, 3), np.uint16)
            steps = np.zeros((Rp, 3), np.float16)
            starts[:len(runs)] = np.clip(
                np.rint((runs[:, 0:3] - lo) / span * 65535.0),
                0.0, 65535.0).astype(np.uint16)
            steps[:len(runs)] = (runs[:, 3:6] * (2.0 / span)).astype(
                np.float16)
        else:
            starts = np.zeros((Rp, 3), np.float32)
            steps = np.zeros((Rp, 3), np.float32)
            starts[:len(runs)] = runs[:, 0:3]
            steps[:len(runs)] = runs[:, 3:6]

        key = "texels_runs_q" if quantized else "texels_runs"
        fn = self._jit_grid_dense.get(key)
        if fn is None:
            fused = self._fused_heads()

            def fn(p, tp, off, st, sp, i0, ab, batch):
                return ae.decode_texels_runs(p, self.acfg, tp, off, st, sp,
                                             i0, ab, batch,
                                             fused_heads=fused,
                                             quantized=quantized)

            fn = jax.jit(fn, static_argnums=(7,))
            self._jit_grid_dense[key] = fn

        chunks = []
        with self._tpu_lock:
            _, tex_planes = self._jit_process(self.params, feat)
            off_d = jnp.asarray(offsets)
            st_d = jnp.asarray(starts)
            sp_d = jnp.asarray(steps)
            for i in range(0, max(N, 1), batch_size):
                out = fn(self.params, tex_planes, off_d, st_d, sp_d,
                         jnp.asarray(i, jnp.int32), aabb_d, batch_size)
                try:
                    out.copy_to_host_async()
                except Exception:
                    pass
                chunks.append(out)
        return chunks, N

    def _dispatch_texels(self, feat: Triplane, points, aabb,
                         batch_size: int = 2 ** 20):
        """Dispatch the uint8 texel decode; returns (chunk device arrays,
        N) without blocking on the results.

        `points` is either a TexelRuns payload (default wire — see
        `_dispatch_texels_runs`) or an [N, 3] point array.  Point arrays
        ship as uint16 AABB-relative coordinates by default (half the
        fp32 wire — the texel stage is host->device transfer bound on
        high-RTT links; quantization error is 1/65535 of the AABB);
        `SIN3DM_TEXEL_WIRE=f32` restores the exact fp32 wire."""
        if isinstance(points, TexelRuns):
            return self._dispatch_texels_runs(feat, points.runs, aabb,
                                              batch_size)
        self._ensure_decode_jits()
        aabb_np = np.asarray(aabb, np.float32).reshape(-1)
        aabb = jnp.asarray(aabb_np)
        wire = os.environ.get("SIN3DM_TEXEL_WIRE", self.tcfg.texel_wire)
        q16 = wire != "f32"
        # uint16 input = pre-quantized positions (the fused C++
        # compaction in _texmesh_geometry); ship as-is
        pre_q16 = (isinstance(points, np.ndarray)
                   and points.dtype == np.uint16)
        q16 = q16 or pre_q16
        key = "texels_q16" if q16 else "texels"
        fn = self._jit_grid_dense.get(key)
        if fn is None:
            fused = self._fused_heads()
            if q16:
                fn = jax.jit(lambda p, tp, q: ae.decode_texels_q16(
                    p, self.acfg, tp, q, fused_heads=fused))
            else:
                fn = jax.jit(lambda p, tp, pts, ab: ae.decode_texels(
                    p, self.acfg, tp, pts, ab, fused_heads=fused))
            self._jit_grid_dense[key] = fn
        if pre_q16:
            points = np.ascontiguousarray(points)
        else:
            points = np.asarray(points, np.float32)
            if q16:
                lo, span = aabb_np[:3], aabb_np[3:] - aabb_np[:3]
                points = np.clip(
                    np.rint((points - lo) / span * 65535.0), 0.0,
                    65535.0).astype(np.uint16)
        N = points.shape[0]
        chunks = []
        with self._tpu_lock:
            _, tex_planes = self._jit_process(self.params, feat)
            for i in range(0, N, batch_size):
                chunk = points[i:i + batch_size]
                n = chunk.shape[0]
                if n < batch_size:
                    chunk = np.pad(chunk, ((0, batch_size - n), (0, 0)))
                out = (fn(self.params, tex_planes, jnp.asarray(chunk))
                       if q16 else
                       fn(self.params, tex_planes, jnp.asarray(chunk),
                          aabb))
                try:
                    out.copy_to_host_async()
                except Exception:
                    pass
                chunks.append(out)
        return chunks, N

    def _texmesh_geometry(self, save_dir: str, feat: Triplane,
                          sdf_grid: np.ndarray, new_aabb, reso: int,
                          n_faces: int, n_surf_pc: int, texture_reso: int,
                          only_largest_cc: bool, save_highres_mesh: bool,
                          save_voxel: bool, tick, t0,
                          sparse=None, quant=None):
        """Host geometry stages: MC -> largest CC -> renorm -> decimate ->
        UV atlas + raster.  Returns None when there is nothing to bake.

        With `sparse` set (a host-fetched ops/sparse_grid.SparseGrid),
        marching cubes and the voxel occupancy read the wire format
        directly and `sdf_grid` may be None — the dense grid is never
        rebuilt (bit-identical output, tests/test_sparse_grid.py)."""
        from ..geometry import meshio, meshproc, uvatlas

        os.makedirs(save_dir, exist_ok=True)
        if save_voxel:
            from ..ops import sparse_grid as _sg
            vox = (_sg.occupancy_host(sparse) if sparse is not None
                   else sdf_grid < 0)
            np.savez_compressed(os.path.join(save_dir, "voxel.npz"),
                                vox_grid=vox)
            t0 = tick("voxel.npz", t0)

        if sparse is not None:
            v, f = meshproc.sdfgrid_to_mesh_sparse(
                sparse, quant, only_largest_cc=only_largest_cc)
        else:
            v, f = meshproc.sdfgrid_to_mesh(
                sdf_grid, only_largest_cc=only_largest_cc)
        t0 = tick(f"marching cubes ({len(f)} tris)", t0)
        if len(f) == 0:
            # no zero crossing (e.g. an undertrained model) — emit an empty
            # placeholder instead of crashing downstream
            print(f"decode_texmesh: empty surface, writing empty mesh to "
                  f"{save_dir}")
            meshio.save_mesh_vf(os.path.join(save_dir, "object.obj"),
                                np.zeros((0, 3)), np.zeros((0, 3), int))
            return None
        if save_highres_mesh:
            meshio.save_mesh_vf(
                os.path.join(save_dir, f"mesh_r{reso}.obj"), v, f)

        # renormalize index-space verts into the AABB (`model.py:384-387`)
        box_min = new_aabb[:3]
        box_size = new_aabb[3:].max() - new_aabb[:3].min()
        v = v / reso * box_size + box_min

        v, f = meshproc.mesh_decimation(v, f, n_faces)
        t0 = tick(f"decimation ({len(f)} tris)", t0)

        if self.acfg.data_type == "sdf":
            np.savez_compressed(os.path.join(save_dir, f"sdfgrid_r{reso}.npz"),
                                sdf_grid=sdf_grid)
            meshio.save_mesh_vf(
                os.path.join(save_dir, f"mesh_r{reso}_simple.obj"), v, f)
            return None

        if n_surf_pc > 0:
            fi, bc = meshproc.sample_mesh_random(v, f, n_surf_pc)
            surf_pts = meshproc.interpolate_barycentric(f, fi, bc, v)
            preds = self.decode_batch(feat, surf_pts, aabb=new_aabb)
            meshio.save_colored_pointcloud_obj(
                os.path.join(save_dir, f"surf_pc_n{n_surf_pc}.obj"),
                surf_pts, np.clip(preds[..., 1:4], 0, 1))

        wire = os.environ.get("SIN3DM_TEXEL_WIRE", self.tcfg.texel_wire)
        if wire.startswith("runs"):
            # run-length wire: no dense [R,R,3] position image on the
            # host at all — the rasterizer emits per-row spans and the
            # device expands them (decode_texels_runs)
            uvs, tex_idx, mask, runs = uvatlas.uv_unwrap_and_rasterize_runs(
                v, f, texture_reso)
            t0 = tick(f"uv atlas + raster ({int(mask.sum())} texels, "
                      f"{len(runs)} runs)", t0)
            texels = TexelRuns(runs)
        else:
            uvs, tex_idx, gb_pos, mask = uvatlas.uv_unwrap_and_rasterize(
                v, f, texture_reso)
            t0 = tick(f"uv atlas + raster ({int(mask.sum())} texels)", t0)
            if wire != "f32":
                # fused C++ compaction + q16 quantization (one pass over
                # the 2048^2 position buffer; the numpy gather + quantize
                # cost ~0.6 s per bake on the shared host core).
                # Bit-identical to the numpy expression in
                # _dispatch_texels, which recognizes the uint16 dtype and
                # ships it as-is.
                from ..geometry import native
                lo = np.asarray(new_aabb[:3], np.float32)
                span = np.asarray(new_aabb[3:], np.float32) - lo
                texels = native.mask_compact_q16(
                    gb_pos.reshape(-1, 3), mask.reshape(-1), lo, span)
            else:
                texels = gb_pos.reshape(-1, 3)[mask.reshape(-1)]
        return {"v": v, "f": f, "uvs": uvs, "tex_idx": tex_idx,
                "mask": mask, "texels": texels}

    def _texmesh_assemble(self, save_dir: str, cpu: Dict, texel_handle,
                          texture_reso: int, mtl_path, file_format: str,
                          tick) -> None:
        """Blocking tail: gather the texel chunks, dilate seams, export."""
        import time
        from ..geometry import meshio

        t0 = time.perf_counter()
        chunks, N = texel_handle
        preds = np.concatenate([np.asarray(c) for c in chunks],
                               axis=0)[:N]
        t0 = tick("texel decode", t0)
        mask = cpu["mask"]
        v, f, uvs, tex_idx = cpu["v"], cpu["f"], cpu["uvs"], cpu["tex_idx"]
        # scatter + 3x3 seam dilation (`model.py:426-429`) + flip in one
        # C++ pass (bit-identical to the numpy/cv2 chain it replaced;
        # tests/test_geometry_native.py::test_tex_assemble_matches_cv2)
        from ..geometry import native
        tex_img = native.tex_assemble(preds, mask, texture_reso)
        t0 = tick("texture assembly", t0)

        if self.acfg.data_type == "sdftex":
            if file_format == "obj":
                mtl_str = (meshio.read_material_params_from_mtl(mtl_path)
                           if mtl_path else None)
                meshio.save_mesh_with_tex(
                    os.path.join(save_dir, "object.obj"),
                    np.asarray(v), uvs, np.asarray(f), tex_idx, tex_img,
                    mtl_str=mtl_str,
                    Kd=self.meta.get("Kd", [1, 1, 1]),
                    Ka=self.meta.get("Ka", [0, 0, 0]),
                    Ks=self.meta.get("Ks", [0.4, 0.4, 0.4]),
                    Ns=self.meta.get("Ns", 10))
            elif file_format == "glb":
                meshio.save_mesh_with_tex_to_glb(
                    os.path.join(save_dir, "object.glb"),
                    np.asarray(v), uvs, np.asarray(f), tex_idx, tex_img)
            else:
                raise NotImplementedError(file_format)
        elif self.acfg.data_type == "sdfpbr":
            meshio.save_mesh_with_pbr(
                os.path.join(save_dir, "object.obj"),
                np.asarray(v), uvs, np.asarray(f), tex_idx,
                tex_img[..., :3], tex_img[..., 3], tex_img[..., 4],
                tex_img[..., 5:])
        else:
            raise NotImplementedError(self.acfg.data_type)

    def decode_voxel(self, save_dir: str, feat: Triplane, reso: int) -> None:
        """Voxelize the decoded SDF grid (`model.py:475-488`)."""
        feat = _strip_batch(feat, keep=True)
        H, W = feat.xy.shape[-3], feat.xy.shape[-2]
        D = feat.xz.shape[-2]
        new_aabb = self._resize_aabb((H, W, D))
        os.makedirs(save_dir, exist_ok=True)
        sdf_grid = self.decode_grid(feat, reso, aabb=new_aabb)[..., 0]
        np.savez_compressed(os.path.join(save_dir, f"r{reso}_voxel.npz"),
                            vox_grid=sdf_grid < 0)

    def evaluate(self) -> Dict[str, float]:
        feat = self.encode()
        thr = self.meta["threshold"]
        grid_shape = self.meta.get("grid_shape")
        if grid_shape is not None:
            # the training grid IS the aabb voxel-center grid, so the
            # gather-free dense decode applies (one dispatch instead of
            # hundreds of 2^16-point chunks)
            feat_b = _strip_batch(feat)
            self._ensure_decode_jits()
            gp, tp = self._jit_process(self.params, feat_b)
            pred = np.array(self._grid_dense_jit()(
                self.params, self.acfg, gp, tp, tuple(grid_shape), 8,
                True, self._fused_heads())).reshape(-1, 1)
            # align with the shuffled ground-truth table using the exact
            # permutation load_ae_data applied to it
            assert self.grid_perm is not None, \
                "evaluate() needs load_data() (grid_perm not set)"
            pred = pred[self.grid_perm]
        else:
            pred = self.decode_batch(feat,
                                     np.asarray(self.data.pts_grid))[:, :1]
        gt = np.asarray(self.data.sdf_grid)
        if self.tcfg.sdf_renorm:
            pred, gt = pred * thr, gt * thr
        stat = evaluate_tsdf_prediction(pred, gt, thr)
        if self.acfg.use_tex and self.data.pts_on_surf is not None:
            tex_pred = self.decode_batch(
                feat, np.asarray(self.data.pts_on_surf),
                batch_size=2 ** 20)[:, 1:]
            stat["surf_tex_l1_error"] = float(
                np.abs(tex_pred - np.asarray(self.data.tex_on_surf)).mean())
        return stat

    # -- checkpoints (`model.py:141-176`) ------------------------------------

    def save_ckpt(self, name: str, opt_state=None, step: int = 0) -> None:
        """`ckpt_{name}.pth`.  With `opt_state`, the file bundles
        params + optimizer state + step — the reference's
        net/optimizer/scheduler checkpoint (`model.py:141-157`), so a
        preempted AE run resumes with its exact training trajectory."""
        path = os.path.join(self.log_dir, f"ckpt_{name}.pth")
        if opt_state is None:
            ckpt.save_pytree(path, self.params, meta=self.meta)
        else:
            tree = {"params": self.params,
                    "opt_state": jax.device_get(opt_state),
                    "step": np.asarray(step, np.int32)}
            ckpt.save_pytree(path, tree, meta=self.meta)

    def load_ckpt(self, name: str) -> None:
        """Load params (+meta) — handles the params-only layout, the
        combined params/opt_state/step layout, and reference torch
        bundles (`src/encoding/model.py:141-157`) via weight transplant
        (`compat/torch_import.py`), so log_dir can point straight at a
        reference/published checkpoint directory."""
        path = os.path.join(self.log_dir, f"ckpt_{name}.pth")
        from ..compat import torch_import as ti
        if ti.is_torch_file(path):
            print(f"weight-transplanting reference torch ckpt: {path}")
            self.params, self.meta = ti.ae_bundle_to_tree(
                ti.load_torch_file(path), self.acfg)
            self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
            return
        if self.params is None:
            self.params = ae.init_autoencoder(jax.random.PRNGKey(0),
                                              self.acfg)
        if any(p.startswith("params/") for p in ckpt.peek_paths(path)):
            self.params, self.meta = ckpt.load_subtree(path, self.params,
                                                       "params")
        else:  # legacy params-only checkpoint
            self.params, self.meta = ckpt.load_pytree(path, self.params)

    def load_train_state(self, name: str):
        """Load (params, opt_state, step) for resume; returns None when the
        checkpoint is absent or has no optimizer state."""
        path = os.path.join(self.log_dir, f"ckpt_{name}.pth")
        if not os.path.exists(path):
            return None
        paths = ckpt.peek_paths(path)
        if not any(p.startswith("opt_state/") for p in paths):
            return None
        if self.params is None:
            self.params = ae.init_autoencoder(jax.random.PRNGKey(0),
                                              self.acfg)
        labels = ae.geo_param_labels(self.params)
        opt = make_optimizer(self.tcfg, labels)
        template = {"params": self.params,
                    "opt_state": opt.init(self.params),
                    "step": np.zeros((), np.int32)}
        tree, meta = ckpt.load_pytree(path, template)
        self.params = tree["params"]
        if meta:
            self.meta = meta
        return tree["params"], tree["opt_state"], int(tree["step"])


