"""Sampling CLI — same surface as the reference `src/sample.py`:

    python -m sin3dm_tpu.cli.sample --tag T --n_samples N [--use_ddim
        --timestep_respacing ddim100] [--resize 1 1 1.5] [--vox]

Draws triplane samples from the trained diffusion model (jitted lax.scan —
the whole 1000-step chain is one XLA program) and decodes each to a
textured mesh (or voxel grid with --vox).  `--resize` retargets the sample
to scaled plane sizes; each new size compiles once and then hits the jit
cache.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def sample_diffusion(args):
    from ..core import checkpoint as ckpt
    from ..core import config as cfgmod
    from ..core.triplane import load_triplane_npz, save_triplane_npz
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
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    model_path = cfgmod.diffusion_model_path(args.tag, args.ema_rate,
                                             args.diff_n_iters)
    params, _ = ckpt.load_pytree(model_path, params)

    respacing = args.timestep_respacing if args.use_ddim else ""
    sched = cfgmod.schedule_from_args(args, respacing=respacing)
    tables = {k: jnp.asarray(v) for k, v in sched.tables_f32().items()}
    dcfg = cfgmod.diffusion_config_from_args(args)

    sampler = make_jit_sampler(
        lambda x, t: unet_apply(params, ucfg, x, t), tables, dcfg,
        use_ddim=args.use_ddim)

    result_dir = os.path.join(args.tag, args.output)
    os.makedirs(result_dir, exist_ok=True)

    key = jax.random.PRNGKey(int(getattr(args, "seed", 0)))
    batch_size = args.diff_batch_size
    result_paths = []
    for i in range(0, args.n_samples, batch_size):
        bs = min(batch_size, args.n_samples - i)
        key, sk = jax.random.split(key)
        # always sample at the full batch size: a ragged final batch would
        # recompile the whole 1000-step program; surplus rows are dropped
        samples = sampler(sk, batch_size, C, (H, W, D))
        xy = np.asarray(samples.xy)
        xz = np.asarray(samples.xz)
        yz = np.asarray(samples.yz)
        for j in range(bs):
            save_path = os.path.join(result_dir, f"{i + j:03d}", "feat.npz")
            save_triplane_npz(save_path, xy[j].transpose(2, 0, 1),
                              xz[j].transpose(2, 0, 1),
                              yz[j].transpose(2, 0, 1))
            result_paths.append(save_path)
    return result_paths


def decode(args, paths):
    from ..core import config as cfgmod
    from ..core.triplane import load_triplane_npz
    from ..training.ae import AETrainer

    log_dir = cfgmod.encoding_log_dir(args.tag)
    trainer = AETrainer(log_dir, cfgmod.ae_config_from_args(args),
                        cfgmod.ae_trainer_config_from_args(args))
    trainer.load_ckpt("final")

    mtl_path = None
    if not args.vox and args.copy_mtl and args.data_path:
        cands = glob.glob(os.path.join(
            os.path.dirname(args.data_path), "mesh/*.mtl"))
        mtl_path = cands[0] if cands else None

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


def main(argv=None):
    from ..core import config as cfgmod
    args = cfgmod.sample_args(argv)
    paths = sample_diffusion(args)
    decode(args, paths)


if __name__ == "__main__":
    main()
