"""Config system: args.json round trip, derived channels, path contracts
(`parser_util.py` behavior parity)."""

import json
import os

import pytest

from sin3dm_tpu.core import config as cfgmod


def test_train_args_writes_group_jsons(tmp_path):
    tag = str(tmp_path / "exp")
    args = cfgmod.train_args(["--tag", tag, "--data_path", "/x.npz"])
    enc = json.load(open(os.path.join(tag, "encoding", "args.json")))
    diff = json.load(open(os.path.join(tag, "diffusion", "args.json")))
    # reference flag names present with reference defaults
    assert enc["enc_batch_size"] == 65536
    assert enc["fdim_geo"] == 4 and enc["fdim_tex"] == 8
    assert enc["sdf_loss"] == "weightedl1"
    assert diff["steps"] == 1000
    assert diff["predict_xstart"] is True
    assert diff["model_channels"] == 64
    assert diff["channel_mult"] == "1,2"
    # derived channels = fdg + fdt (`parser_util.py:131-132`)
    assert args.in_channels == 12 and args.out_channels == 12


def test_sample_args_reload_overrides(tmp_path):
    tag = str(tmp_path / "exp")
    cfgmod.train_args(["--tag", tag, "--data_path", "/x.npz",
                       "--fdim_geo", "2", "--fdim_tex", "6",
                       "--steps", "500"])
    args = cfgmod.sample_args(["--tag", tag, "--n_samples", "3",
                               "--timestep_respacing", "ddim25"])
    # reloaded from args.json (overriding CLI), except respacing
    assert args.fdim_geo == 2 and args.fdim_tex == 6
    assert args.steps == 500
    assert args.in_channels == 8
    assert args.timestep_respacing == "ddim25"
    assert args.n_samples == 3


def test_sample_args_missing_tag():
    with pytest.raises(ValueError):
        cfgmod.sample_args(["--tag", "/nonexistent_tag_xyz"])


def test_path_contracts():
    assert cfgmod.encoding_feat_path("T") == "T/encoding/feat.npz"
    assert (cfgmod.diffusion_model_path("T", 0.9999, 25000)
            == "T/diffusion/ema_0.9999_025000.pt")


def test_config_builders(tmp_path):
    tag = str(tmp_path / "exp")
    args = cfgmod.train_args(["--tag", tag, "--data_path", "/x.npz"])
    ucfg = cfgmod.unet_config_from_args(args)
    assert ucfg.channel_mult == (1, 2)
    assert ucfg.rollout is True
    dcfg = cfgmod.diffusion_config_from_args(args)
    from sin3dm_tpu.diffusion.gaussian import MeanType, VarType
    assert dcfg.mean_type == MeanType.START_X
    assert dcfg.var_type == VarType.FIXED_LARGE
    sched = cfgmod.schedule_from_args(args)
    assert sched.num_timesteps == 1000
    tcfg = cfgmod.diffusion_trainer_config_from_args(args)
    assert tcfg.ema_rates == (0.9999,)
    acfg = cfgmod.ae_config_from_args(args)
    assert acfg.feat_channels == 12


def test_enc_log_reuse_symlink(tmp_path):
    tag1 = str(tmp_path / "exp1")
    cfgmod.train_args(["--tag", tag1, "--data_path", "/x.npz",
                       "--fdim_geo", "2"])
    tag2 = str(tmp_path / "exp2")
    args = cfgmod.train_args(["--tag", tag2, "--enc_log",
                              os.path.join(tag1, "encoding")])
    assert os.path.islink(os.path.join(tag2, "encoding"))
    assert args.fdim_geo == 2  # loaded from the reused encoding args
