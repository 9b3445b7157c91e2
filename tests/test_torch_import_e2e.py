"""End-to-end: sample from a REFERENCE-format (torch) checkpoint tag.

Builds a tag directory exactly as the reference `src/train.py` leaves it —
torch `ckpt_final.pth` bundle + `ema_*.pt` state dict + feat.npz +
args.json pair — and drives our `cli.sample` against it two ways:

1. directly (the loaders weight-transplant torch files in-memory), and
2. through `scripts/import_torch_ckpt.py` (converted npz containers),

asserting the two produce bit-identical samples (same seed, same weights,
same chain).  This is the interchangeability contract: a reference user
points `--tag` at their existing checkpoints and gets output.
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sin3dm_tpu.models import autoencoder as ae  # noqa: E402
from sin3dm_tpu.models.unet import UNetConfig  # noqa: E402

REF_SRC = "/root/reference/src"
SIZES = (16, 16, 12)
AABB = [-1.0, -1.0, -0.75, 1.0, 1.0, 0.75]


def _make_reference_tag(tag: str) -> None:
    """A tag dir in the reference's on-disk format, with random weights."""
    sys.path.insert(0, REF_SRC)
    try:
        import diffusion.unet_triplane as ref_unet
        import encoding.networks as ref_networks
    finally:
        sys.path.remove(REF_SRC)

    H, W, D = SIZES
    enc_dir = os.path.join(tag, "encoding")
    diff_dir = os.path.join(tag, "diffusion")
    os.makedirs(enc_dir)
    os.makedirs(diff_dir)

    acfg = ae.AEConfig()
    torch.manual_seed(0)
    net = ref_networks.AutoEncoderGroupSkip(
        acfg.fdim_geo, acfg.fdim_tex, acfg.fdim_up, acfg.hidden_dim,
        acfg.n_hidden_layers, use_tex=True, tex_channels=3)
    torch.save({
        "net": net.state_dict(),
        "optimizer": {}, "scheduler": {},
        "Ka": [0.0, 0.0, 0.0], "Kd": [1.0, 1.0, 1.0],
        "Ks": [0.4, 0.4, 0.4], "Ns": 10.0,
        "aabb": AABB, "featmap_size": list(SIZES),
    }, os.path.join(enc_dir, "ckpt_final.pth"))

    ucfg = UNetConfig()
    model = ref_unet.TriplaneUNetModelSmall(
        ucfg.in_channels, ucfg.model_channels, ucfg.out_channels,
        num_res_blocks=ucfg.num_res_blocks, channel_mult=ucfg.channel_mult,
        use_scale_shift_norm=ucfg.use_scale_shift_norm)
    torch.save(model.state_dict(),
               os.path.join(diff_dir, "ema_0.9999_000100.pt"))

    rng = np.random.default_rng(0)
    np.savez_compressed(
        os.path.join(enc_dir, "feat.npz"),
        feat_xy=rng.standard_normal((12, H, W)).astype(np.float32) * 0.2,
        feat_xz=rng.standard_normal((12, H, D)).astype(np.float32) * 0.2,
        feat_yz=rng.standard_normal((12, W, D)).astype(np.float32) * 0.2)

    with open(os.path.join(enc_dir, "args.json"), "w") as f:
        # the FULL encoding group as the reference parser dumps it
        # (`src/utils/parser_util.py:14-38`)
        json.dump({"data_path": None, "enc_batch_size": 65536,
                   "fm_reso": 16, "sdf_renorm": 0,
                   "data_type": "sdftex", "enc_net_type": "skip",
                   "fdim_geo": 4, "fdim_tex": 8, "fdim_up": 64,
                   "hidden_dim": 256, "n_hidden_layers": 4,
                   "enc_n_iters": 100, "enc_lr": 5e-3,
                   "enc_lr_decay": 0.1, "enc_lr_split": 0.2,
                   "vol_ratio": 0.1, "tex_threshold_ratio": 0.999,
                   "tex_weight": 1.0, "sdf_loss": "weightedl1",
                   "tex_loss": "l1"}, f)
    with open(os.path.join(diff_dir, "args.json"), "w") as f:
        json.dump({"enc_log": None, "diff_batch_size": 32,
                   "diff_lr": 5e-4, "schedule_sampler": "uniform",
                   "weight_decay": 0.0, "log_interval": 100,
                   "save_interval": 100,
                   "diff_n_iters": 100, "ema_rate": 0.9999,
                   "diff_net_type": "unet_small", "learn_sigma": False,
                   "steps": 1000, "noise_schedule": "linear",
                   "timestep_respacing": "", "use_kl": False,
                   "predict_xstart": True, "rescale_timesteps": False,
                   "rescale_learned_sigmas": False,
                   "in_channels": 12, "model_channels": 64,
                   "out_channels": 12, "num_res_blocks": 1,
                   "dropout": 0, "channel_mult": "1,2",
                   "use_checkpoint": False, "use_fp16": False,
                   "use_scale_shift_norm": True}, f)


def test_sample_from_reference_checkpoint(tmp_path, monkeypatch):
    from sin3dm_tpu.cli import sample as sample_cli

    monkeypatch.chdir(tmp_path)
    tag = str(tmp_path / "ref_tag")
    _make_reference_tag(tag)

    # 1) point the sample CLI straight at the torch-format tag (--vox:
    #    random AE weights decode no surface; voxel occupancy needs none)
    sample_cli.main([
        "--tag", tag, "--n_samples", "1", "--use_ddim", "true",
        "--timestep_respacing", "ddim5", "--reso", "24", "--vox",
        "--output", "results_direct"])
    direct = f"{tag}/results_direct/000"
    assert os.path.exists(os.path.join(direct, "feat.npz"))
    assert os.path.exists(os.path.join(direct, "r24_voxel.npz"))

    # 2) convert with the import CLI, then sample from the converted tag
    sys.path.insert(0, "/root/repo/scripts")
    try:
        import import_torch_ckpt
    finally:
        sys.path.remove("/root/repo/scripts")
    conv = str(tmp_path / "converted_tag")
    import_torch_ckpt.main(["--src", tag, "--dst", conv,
                            "--threshold", str(2.0 / 256 * 3)])
    from sin3dm_tpu.compat import torch_import as ti
    assert not ti.is_torch_file(
        os.path.join(conv, "diffusion", "ema_0.9999_000100.pt"))

    sample_cli.main([
        "--tag", conv, "--n_samples", "1", "--use_ddim", "true",
        "--timestep_respacing", "ddim5", "--reso", "24", "--vox",
        "--output", "results_conv"])

    # same seed + same transplanted weights -> bit-identical samples
    a = np.load(os.path.join(direct, "feat.npz"))
    b = np.load(os.path.join(conv, "results_conv", "000", "feat.npz"))
    for k in ("feat_xy", "feat_xz", "feat_yz"):
        np.testing.assert_array_equal(a[k], b[k])

    # 3) round-trip the other way: export OUR tag back to reference torch
    #    format (--reverse) and sample from THAT — still bit-identical
    exported = str(tmp_path / "exported_tag")
    import_torch_ckpt.main(["--src", conv, "--dst", exported, "--reverse"])
    assert ti.is_torch_file(
        os.path.join(exported, "diffusion", "ema_0.9999_000100.pt"))
    assert ti.is_torch_file(
        os.path.join(exported, "encoding", "ckpt_final.pth"))
    sample_cli.main([
        "--tag", exported, "--n_samples", "1", "--use_ddim", "true",
        "--timestep_respacing", "ddim5", "--reso", "24", "--vox",
        "--output", "results_exported"])
    c = np.load(os.path.join(exported, "results_exported", "000",
                             "feat.npz"))
    for k in ("feat_xy", "feat_xz", "feat_yz"):
        np.testing.assert_array_equal(a[k], c[k])
