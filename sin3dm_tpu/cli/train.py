"""Training CLI — same surface as the reference `src/train.py`:

    python -m sin3dm_tpu.cli.train --tag T --data_path D [...]

Stage 1 fits the triplane autoencoder, writes `{tag}/encoding/feat.npz` and
a reconstruction mesh; stage 2 trains the triplane diffusion UNet on that
latent, saving EMA checkpoints under `{tag}/diffusion`.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def train_ae(args, mesh=None):
    from ..core import config as cfgmod
    from ..core.triplane import save_triplane_npz
    from ..training.ae import AETrainer

    print("[Training autoencoder]")
    assert args.data_path is not None
    log_dir = cfgmod.encoding_log_dir(args.tag)
    trainer = AETrainer(log_dir, cfgmod.ae_config_from_args(args),
                        cfgmod.ae_trainer_config_from_args(args), mesh=mesh)
    trainer.load_data(args.data_path)
    trainer.train(jax.random.PRNGKey(0),
                  log_every=getattr(args, "log_interval", 100),
                  resume=bool(getattr(args, "resume", 0)))

    feat = trainer.encode()
    print("feat maps shape:", [p.shape for p in feat])
    save_triplane_npz(cfgmod.encoding_feat_path(args.tag), feat)

    # reconstruction sanity mesh (`src/train.py:28-30`)
    trainer.decode_texmesh(os.path.join(log_dir, "rec"), feat,
                           getattr(args, "rec_reso", 256))
    return trainer


def train_diffusion(args):
    from ..core import config as cfgmod
    from ..core import logger
    from ..core.triplane import Triplane, load_triplane_npz
    from ..models.unet import init_unet, unet_apply
    from ..parallel import mesh as meshlib
    from ..training.diffusion import DiffusionTrainLoop
    import jax.numpy as jnp

    print("[Training diffusion]")
    log_dir = cfgmod.diffusion_log_dir(args.tag)
    logger.configure(dir=log_dir)

    logger.log("creating data loader...")
    feat = load_triplane_npz(cfgmod.encoding_feat_path(args.tag))
    batch = Triplane(*[np.repeat(np.asarray(p)[None], args.diff_batch_size,
                                 axis=0) for p in feat])
    batch = Triplane(*[jnp.asarray(p) for p in batch])

    logger.log("creating model and diffusion...")
    ucfg = cfgmod.unet_config_from_args(args)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    sched = cfgmod.schedule_from_args(args)
    tables = {k: jnp.asarray(v) for k, v in sched.tables_f32().items()}
    dcfg = cfgmod.diffusion_config_from_args(args)
    tcfg = cfgmod.diffusion_trainer_config_from_args(args)

    dev_mesh = None
    n_dev = getattr(args, "n_devices", 0)
    if n_dev == 0:
        n_dev = len(jax.devices())
    if n_dev > 1 and args.diff_batch_size % n_dev == 0:
        dev_mesh = meshlib.make_mesh(n_dev)
        logger.log(f"data-parallel over {n_dev} devices")

    logger.log("training...")
    loop = DiffusionTrainLoop(
        lambda p, x, t: unet_apply(p, ucfg, x, t),
        params, tables, dcfg, tcfg, log_dir, batch, mesh=dev_mesh,
        sample_hook=_make_sample_viz_hook(ucfg, feat.sizes),
        resume=bool(getattr(args, "resume", 0)))
    if getattr(args, "profile", 0):
        from ..core.profiling import maybe_trace
        first = loop.resume_step + 50
        with maybe_trace(os.path.join(log_dir, "profile"), True):
            loop.run(jax.random.PRNGKey(1), n_steps=first)
        loop.resume_step = first  # continue where the traced chunk ended
    loop.run(jax.random.PRNGKey(1))


def _make_sample_viz_hook(ucfg, sizes):
    """Every 5000 steps draw 2 DDPM samples and log plane-0 heatmaps to
    TensorBoard (`train_util.py:171-196` behavior)."""
    from ..core.rng import draw_scalar_field2D
    from ..diffusion.sampling import p_sample_loop
    from ..models.unet import unet_apply
    import jax.numpy as jnp
    import numpy as np

    def hook(loop, step):
        if loop.tb is None:
            return
        params = jax.device_get(loop.state.params)
        sample = p_sample_loop(
            lambda x, t: unet_apply(params, ucfg, x, t),
            loop.tables, loop.dcfg, jax.random.PRNGKey(step + 7),
            2, ucfg.in_channels, sizes, clip_denoised=False)
        xy = np.asarray(sample.xy)
        C = xy.shape[-1]
        for i in range(2):
            loop.tb.add_figure(f"sample{i}_c0",
                               draw_scalar_field2D(xy[i, :, :, 0]),
                               global_step=step)
            loop.tb.add_figure(f"sample{i}_c{C // 2}",
                               draw_scalar_field2D(xy[i, :, :, C // 2]),
                               global_step=step)
        data_xy = np.asarray(loop.batch.xy)
        loop.tb.add_figure("data_c0",
                           draw_scalar_field2D(data_xy[0, :, :, 0]),
                           global_step=step)
    return hook


def main(argv=None):
    from ..core import config as cfgmod
    from ..core.compile_cache import enable_compilation_cache
    from ..core.rng import seed_all
    from ..parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()  # SIN3DM_DIST=1: pod-slice DCN init
    enable_compilation_cache()
    args = cfgmod.train_args(argv)
    seed_all(0)

    if args.only_enc:
        train_ae(args)
    else:
        if args.enc_log is None:
            train_ae(args)
        train_diffusion(args)


if __name__ == "__main__":
    main()
