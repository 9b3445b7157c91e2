"""Sampling CLI — same surface as the reference `src/sample.py`:

    python -m sin3dm_tpu.cli.sample --tag T --n_samples N [--use_ddim
        --timestep_respacing ddim100] [--resize 1 1 1.5] [--vox]

Draws triplane samples from the trained diffusion model (jitted lax.scan —
the whole 1000-step chain is one XLA program) and decodes each to a
textured mesh (or voxel grid with --vox).  `--resize` retargets the sample
to scaled plane sizes; each new size compiles once and then hits the jit
cache.

The mesh path is software-pipelined ACROSS sampling chunks: the reverse
chain for chunk i+1 runs on the device while the host does chunk i's CPU
geometry (marching cubes, decimation, UV).  Chain time is linear in batch
at these plane sizes (measured 1.60/3.17/6.15 s for batch 1/2/4 at
towerruins scale), so chunking costs no device efficiency and hides almost
the whole sampling time behind decode.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def _build_sampler(args):
    """(sampler, params-independent metadata) from the trained artifacts:
    jitted over the EMA checkpoint, sizes from feat.npz x --resize
    (`src/sample.py:6-30`)."""
    from ..core import checkpoint as ckpt
    from ..core import config as cfgmod
    from ..core.triplane import load_triplane_npz
    from ..diffusion.sampling import make_jit_sampler
    from ..models.unet import init_unet, unet_apply

    feat = load_triplane_npz(cfgmod.encoding_feat_path(args.tag))
    C = feat.channels
    H, W, D = feat.sizes
    H = int(H * args.resize[0])
    W = int(W * args.resize[1])
    D = int(D * args.resize[2])
    print("H, W, D:", H, W, D)

    ucfg = cfgmod.unet_config_from_args(args)
    if jax.default_backend() != "cpu":
        if os.environ.get("SIN3DM_FUSED_CONV", "1") != "0":
            # inference-only pallas conv path (models/unet.py UNetConfig):
            # kills the per-step relayout copies around batch-1 convs.
            # CPU keeps the XLA path (pallas CPU = slow interpreter).
            ucfg = ucfg._replace(fused_conv=True)
        if os.environ.get("SIN3DM_SAMPLE_DTYPE", "bf16") == "bf16":
            # inference runs bfloat16 on TPU regardless of the training
            # dtype: the sampler is bandwidth-bound, fp32 chains cost
            # ~40% more and (at batch>1) overflow the fused kernel's
            # VMEM budget.  LP quality metrics are unchanged (RESULTS).
            # SIN3DM_SAMPLE_DTYPE=train restores the args.json dtype.
            import jax.numpy as _jnp
            ucfg = ucfg._replace(compute_dtype=_jnp.bfloat16,
                                 fast_norm=True)
            # visible opt-out pointer for users comparing numerics
            # against reference fp32 chains (ADVICE r2)
            print("sampling in bfloat16 + fast_norm (TPU default; set "
                  "SIN3DM_SAMPLE_DTYPE=train for the args.json dtype)")
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    model_path = cfgmod.diffusion_model_path(args.tag, args.ema_rate,
                                             args.diff_n_iters)
    from ..compat import torch_import as ti
    if ti.is_torch_file(model_path):
        # reference torch EMA file: transplant the weights in-memory so
        # --tag can point straight at a reference/published checkpoint
        # (parity: tests/test_torch_import.py)
        print(f"weight-transplanting reference torch ckpt: {model_path}")
        params = jax.tree_util.tree_map(
            jnp.asarray,
            ti.unet_params_from_state_dict(ti.load_torch_file(model_path),
                                           ucfg))
    else:
        params, _ = ckpt.load_pytree(model_path, params)

    respacing = args.timestep_respacing if args.use_ddim else ""
    sched = cfgmod.schedule_from_args(args, respacing=respacing)
    tables = {k: jnp.asarray(v) for k, v in sched.tables_f32().items()}
    dcfg = cfgmod.diffusion_config_from_args(args)

    mesh = None
    n_dev = int(getattr(args, "sample_devices", 1))
    if n_dev == 0 or n_dev > 1:
        # sample-time DP: the reverse chain shards over the mesh 'data'
        # axis (each chip denoises its slice of the batch independently);
        # per-sample keys keep outputs chunking- and mesh-invariant
        from ..parallel import mesh as meshlib
        mesh = meshlib.make_mesh(n_dev if n_dev else None)
        print(f"sampling over {mesh.devices.size} devices (DP)")

    spatial_mesh = None
    n_sp = int(getattr(args, "sample_spatial", 1))
    if n_sp == 0 or n_sp > 1:
        # plane-spatial sharding: shard every plane's dim 1 over 'space',
        # halo-exchange 3x3 convs (parallel/halo.py) — for retargets
        # whose planes exceed one chip's HBM
        from ..parallel.halo import make_spatial_mesh
        if mesh is not None:
            raise ValueError("--sample_devices and --sample_spatial are "
                             "mutually exclusive")
        spatial_mesh = make_spatial_mesh(n_sp if n_sp else None)
        n_sp = spatial_mesh.devices.size
        for name, dim in (("H", H), ("W", W)):
            if dim % (2 * n_sp):
                raise ValueError(
                    f"--sample_spatial {n_sp} needs {name}={dim} divisible "
                    f"by {2 * n_sp} (one down level + even shards)")
        # pallas fused conv is a single-chip path; halo convs replace it
        ucfg = ucfg._replace(spatial_mesh=spatial_mesh, fused_conv=False)
        print(f"sampling with planes sharded over {n_sp} devices (space)")

    y0 = mask = None
    if getattr(args, "inpaint", False):
        # masked generation: keep the known triplane outside the region,
        # regenerate inside (ref `gaussian_diffusion.py:566-577`)
        from ..diffusion.sampling import region_keep_masks
        if not args.use_ddim:
            raise ValueError("--inpaint requires --use_ddim")
        src = args.inpaint_feat or cfgmod.encoding_feat_path(args.tag)
        y0_feat = load_triplane_npz(src)
        if y0_feat.sizes != (H, W, D):
            raise ValueError(
                f"--inpaint y0 sizes {y0_feat.sizes} != target {(H, W, D)}"
                " (inpainting does not combine with --resize)")
        # [H, W, C] -> [1, H, W, C]: broadcasts over the sample batch
        y0 = y0_feat.map(lambda p: jnp.asarray(p)[None])
        mask = region_keep_masks((H, W, D), tuple(args.inpaint_region))
        print(f"inpainting region {tuple(args.inpaint_region)} from {src}")

    # params ride as a jit argument (not baked constants): the compiled
    # chain is weight-independent — cache entries survive checkpoint
    # swaps and the serialized executable stays small (see
    # make_jit_sampler docstring)
    sampler = make_jit_sampler(
        lambda p, x, t: unet_apply(p, ucfg, x, t), tables, dcfg,
        use_ddim=args.use_ddim, mesh=mesh, y0=y0, mask=mask,
        is_mask_t0=bool(getattr(args, "is_mask_t0", False)),
        spatial_mesh=spatial_mesh, params=params)
    return sampler, C, (H, W, D)


def _save_chunk_npz(result_dir, samples, start: int, count: int):
    """Persist per-sample feat.npz (reference contract, `sample.py:39-47`).
    Blocks on the chunk's chain; returns (paths, per-sample Triplanes)."""
    from ..core.triplane import Triplane, save_triplane_npz

    xy = np.asarray(samples.xy)
    xz = np.asarray(samples.xz)
    yz = np.asarray(samples.yz)
    paths, feats = [], []
    for j in range(count):
        save_path = os.path.join(result_dir, f"{start + j:03d}", "feat.npz")
        save_triplane_npz(save_path, xy[j].transpose(2, 0, 1),
                          xz[j].transpose(2, 0, 1),
                          yz[j].transpose(2, 0, 1))
        paths.append(save_path)
        feats.append(Triplane(samples.xy[j], samples.xz[j], samples.yz[j]))
    return paths, feats


def sample_diffusion(args):
    """Draw all samples and save per-sample feat.npz (no decode) —
    standalone stage, same contract as the reference (`sample.py:6-48`)."""
    sampler, C, sizes = _build_sampler(args)
    result_dir = os.path.join(args.tag, args.output)
    os.makedirs(result_dir, exist_ok=True)

    from ..diffusion.sampling import sample_index_keys, sample_seed_key
    seed_key = sample_seed_key(int(getattr(args, "seed", 0)))
    # chain cost is linear in batch: clamp to what is actually needed
    batch_size = max(1, min(args.diff_batch_size, args.n_samples))
    result_paths = []
    for i in range(0, args.n_samples, batch_size):
        bs = min(batch_size, args.n_samples - i)
        # always sample at the full batch size: a ragged final batch would
        # recompile the whole 1000-step program; surplus rows are dropped.
        # per-sample keys from the GLOBAL index: sample j is identical for
        # a given --seed regardless of batching/chunking or CLI path.
        samples = sampler(sample_index_keys(seed_key, i, batch_size),
                          batch_size, C, sizes)
        paths, _ = _save_chunk_npz(result_dir, samples, i, bs)
        result_paths.extend(paths)
    return result_paths


def _make_trainer(args):
    from ..core import config as cfgmod
    from ..training.ae import AETrainer

    log_dir = cfgmod.encoding_log_dir(args.tag)
    trainer = AETrainer(log_dir, cfgmod.ae_config_from_args(args),
                        cfgmod.ae_trainer_config_from_args(args))
    trainer.load_ckpt("final")
    return trainer


def _find_mtl(args):
    if not args.vox and args.copy_mtl and args.data_path:
        cands = glob.glob(os.path.join(
            os.path.dirname(args.data_path), "mesh/*.mtl"))
        return cands[0] if cands else None
    return None


def decode(args, paths):
    """Decode existing per-sample feat.npz files — standalone stage
    (`src/sample.py:51-78`)."""
    from ..core.triplane import load_triplane_npz

    trainer = _make_trainer(args)
    mtl_path = _find_mtl(args)

    def decode_one(path):
        feat = load_triplane_npz(path)
        save_dir = os.path.dirname(path)
        if args.vox:
            trainer.decode_voxel(save_dir, feat, args.reso)
        else:
            trainer.decode_texmesh(save_dir, feat, args.reso,
                                   n_faces=args.n_faces,
                                   texture_reso=args.texreso,
                                   save_highres_mesh=False, n_surf_pc=-1,
                                   mtl_path=mtl_path,
                                   file_format=args.file_format)

    if args.vox:
        for p in paths:
            decode_one(p)
        return

    # On multi-core hosts, decode samples concurrently: the CPU geometry
    # stages (MC, decimate, UV, export) of one sample overlap the device
    # work of another (the trainer serializes TPU dispatch internally).
    # On a single core, threads only add contention (measured 40% slower);
    # use the single-threaded async-dispatch pipeline instead — all SDF
    # grids prefetched, texel transfers overlapped with the next sample's
    # CPU geometry.
    workers = min(4, max(1, len(paths)), os.cpu_count() or 1)
    if workers == 1:
        feats = [load_triplane_npz(p) for p in paths]
        trainer.decode_texmesh_many(
            [os.path.dirname(p) for p in paths], feats, args.reso,
            n_faces=args.n_faces, texture_reso=args.texreso,
            save_highres_mesh=False, n_surf_pc=-1, mtl_path=mtl_path,
            file_format=args.file_format)
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(decode_one, paths))


def generate(args):
    """Fused sample+decode with cross-chunk pipelining (mesh path).

    Per chunk: block on its chain, dispatch its dense SDF grids, dispatch
    the NEXT chunk's chain, then run this chunk's CPU geometry — the next
    reverse chain runs on the device underneath the host geometry work.

    Sample j is a pure function of (--seed, j): per-sample keys are
    derived from the global sample index, so the drawn samples are
    invariant to `--pipeline_chunk`, `--diff_batch_size`, and to switching
    between this fused path and the standalone sample_diffusion()+decode()
    stages.
    """
    from ..diffusion.sampling import sample_index_keys, sample_seed_key

    sampler, C, sizes = _build_sampler(args)
    trainer = _make_trainer(args)
    mtl_path = _find_mtl(args)

    result_dir = os.path.join(args.tag, args.output)
    os.makedirs(result_dir, exist_ok=True)
    seed_key = sample_seed_key(int(getattr(args, "seed", 0)))

    # small chunks pipeline best: the CPU geometry per sample (~2.5-3.5 s)
    # exceeds a batch-1 chain (~1.6 s), so the device always stays ahead
    chunk = max(1, min(int(getattr(args, "pipeline_chunk", 1) or 1),
                       args.diff_batch_size, args.n_samples))

    result_paths = []

    def sample_chunk(i):
        return sampler(sample_index_keys(seed_key, i, chunk),
                       chunk, C, sizes)  # async dispatch

    def prepare_chunk(i, samples):
        bs = min(chunk, args.n_samples - i)
        paths, feats = _save_chunk_npz(result_dir, samples, i, bs)
        result_paths.extend(paths)
        return [os.path.dirname(p) for p in paths], feats

    trainer.pipelined_generate(
        range(0, args.n_samples, chunk), sample_chunk, prepare_chunk,
        args.reso, n_faces=args.n_faces, texture_reso=args.texreso,
        save_highres_mesh=False, n_surf_pc=-1, mtl_path=mtl_path,
        file_format=args.file_format)
    return result_paths


def main(argv=None):
    from ..core import config as cfgmod
    from ..core.compile_cache import enable_compilation_cache
    from ..parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()  # SIN3DM_DIST=1: pod-slice DCN init
    enable_compilation_cache()
    args = cfgmod.sample_args(argv)
    if args.vox:
        paths = sample_diffusion(args)
        decode(args, paths)
        return
    generate(args)


if __name__ == "__main__":
    main()
