"""Learned-sigma (vb) training path: frozen-mean variational term,
RESCALED_MSE scaling, out_channels doubling, KL hard-fail
(reference `gaussian_diffusion.py:806-828`, `script_util.py:55`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.core.triplane import Triplane, randn
from sin3dm_tpu.diffusion import gaussian as gd
from sin3dm_tpu.diffusion.schedule import make_schedule


def _tables(steps=100):
    return {k: jnp.asarray(v)
            for k, v in make_schedule("linear", steps).tables_f32().items()}


SIZES = (8, 6, 4)
C = 4


def _sigma_model(xt, tt):
    """Toy 2C-channel model: mean = tanh(x), var frac = 0.3 constant."""
    def f(p):
        return jnp.concatenate([jnp.tanh(p), jnp.full_like(p, 0.3)], -1)
    return xt.map(f)


class TestLearnedSigmaLosses:
    def test_terms_include_vb_and_sum(self):
        tables = _tables()
        cfg = gd.DiffusionConfig(var_type=gd.VarType.LEARNED_RANGE,
                                 loss_kind=gd.LossKind.MSE)
        x0 = randn(jax.random.PRNGKey(0), 2, C, SIZES)
        t = jnp.array([10, 70], jnp.int32)
        terms = gd.training_losses(_sigma_model, tables, cfg, x0, t,
                                   jax.random.PRNGKey(1))
        assert set(terms) >= {"vb", "mse_xy", "mse_xz", "mse_yz", "loss"}
        np.testing.assert_allclose(
            np.asarray(terms["loss"]),
            np.asarray(terms["mse_xy"] + terms["mse_xz"] + terms["mse_yz"]
                       + terms["vb"]), rtol=1e-6)
        assert np.all(np.isfinite(np.asarray(terms["loss"])))

    def test_rescaled_mse_scales_vb_only(self):
        tables = _tables(steps=100)
        x0 = randn(jax.random.PRNGKey(0), 2, C, SIZES)
        t = jnp.array([10, 70], jnp.int32)
        key = jax.random.PRNGKey(1)
        plain = gd.training_losses(
            _sigma_model, tables,
            gd.DiffusionConfig(var_type=gd.VarType.LEARNED_RANGE,
                               loss_kind=gd.LossKind.MSE), x0, t, key)
        scaled = gd.training_losses(
            _sigma_model, tables,
            gd.DiffusionConfig(var_type=gd.VarType.LEARNED_RANGE,
                               loss_kind=gd.LossKind.RESCALED_MSE),
            x0, t, key)
        # T/1000 = 0.1 multiplier on vb, mse untouched
        np.testing.assert_allclose(np.asarray(scaled["vb"]),
                                   0.1 * np.asarray(plain["vb"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(scaled["mse_xy"]),
                                   np.asarray(plain["mse_xy"]), rtol=1e-7)

    def test_vb_matches_hand_computed_kl(self):
        """vb (t>0) equals the tri-plane mean KL(q_post || p) in bits, with
        the LEARNED_RANGE logvar interpolation."""
        tables = _tables()
        cfg = gd.DiffusionConfig(var_type=gd.VarType.LEARNED_RANGE,
                                 loss_kind=gd.LossKind.MSE)
        B = 1
        x0 = randn(jax.random.PRNGKey(5), B, C, SIZES)
        tval = 33
        t = jnp.full((B,), tval, jnp.int32)
        key = jax.random.PRNGKey(6)
        terms = gd.training_losses(_sigma_model, tables, cfg, x0, t, key)

        # recreate x_t with the same internal noise draw
        noise = gd.randn_like(key, x0)
        x_t = gd.q_sample(tables, x0, t, noise)
        out = _sigma_model(x_t, None)
        mean_pred = out.map(lambda p: p[..., :C])  # tanh(x_t), unclipped? ->
        # training path computes p_mean_variance with clip_denoised=False
        v = 0.3
        frac = (v + 1.0) / 2.0
        min_log = float(tables["posterior_log_variance_clipped"][tval])
        max_log = float(tables["log_betas"][tval])
        model_logvar = frac * max_log + (1 - frac) * min_log

        true_mean = gd.q_posterior_mean(tables, x0, x_t, t)
        true_logvar = float(tables["posterior_log_variance_clipped"][tval])
        # model mean: START_X -> posterior mean of pred_xstart (unclipped)
        model_mean = gd.q_posterior_mean(tables, mean_pred, x_t, t)

        def kl_np(m1, lv1, m2, lv2):
            return 0.5 * (-1.0 + lv2 - lv1 + np.exp(lv1 - lv2)
                          + (m1 - m2) ** 2 * np.exp(-lv2))

        tot, cnt = 0.0, 0
        for tm, mm in zip(true_mean, model_mean):
            k = kl_np(np.asarray(tm), true_logvar, np.asarray(mm),
                      model_logvar)
            tot += k.sum()
            cnt += k[0].size
        expect = tot / cnt / np.log(2.0)
        np.testing.assert_allclose(float(terms["vb"][0]), expect, rtol=1e-4)

    def test_kl_loss_kinds_raise(self):
        tables = _tables()
        x0 = randn(jax.random.PRNGKey(0), 1, C, SIZES)
        t = jnp.zeros((1,), jnp.int32)
        for lk in (gd.LossKind.KL, gd.LossKind.RESCALED_KL):
            cfg = gd.DiffusionConfig(loss_kind=lk)
            with pytest.raises(NotImplementedError):
                gd.training_losses(_sigma_model, tables, cfg, x0, t,
                                   jax.random.PRNGKey(1))

    def test_frozen_mean_gradients(self):
        """vb gradients flow to the variance half only; mse gradients to the
        mean half only (the frozen-mean contract)."""
        tables = _tables()
        cfg = gd.DiffusionConfig(var_type=gd.VarType.LEARNED_RANGE,
                                 loss_kind=gd.LossKind.MSE)
        x0 = randn(jax.random.PRNGKey(0), 2, C, SIZES)
        t = jnp.array([20, 60], jnp.int32)
        key = jax.random.PRNGKey(1)

        def model_with(theta):
            def m(xt, tt):
                return xt.map(lambda p: jnp.concatenate(
                    [jnp.tanh(p) * theta["mean_w"],
                     jnp.full_like(p, 1.0) * theta["var_w"]], -1))
            return m

        theta = {"mean_w": jnp.float32(1.0), "var_w": jnp.float32(0.3)}

        def vb_of(th):
            terms = gd.training_losses(model_with(th), tables, cfg, x0, t,
                                       key)
            return jnp.mean(terms["vb"])

        def mse_of(th):
            terms = gd.training_losses(model_with(th), tables, cfg, x0, t,
                                       key)
            return jnp.mean(terms["mse_xy"] + terms["mse_xz"]
                            + terms["mse_yz"])

        gvb = jax.grad(vb_of)(theta)
        assert float(jnp.abs(gvb["mean_w"])) == 0.0      # mean frozen in vb
        assert float(jnp.abs(gvb["var_w"])) > 0.0        # var trains via vb
        gmse = jax.grad(mse_of)(theta)
        assert float(jnp.abs(gmse["mean_w"])) > 0.0
        assert float(jnp.abs(gmse["var_w"])) == 0.0


class TestLearnedSigmaEndToEnd:
    def test_train_and_sample_smoke(self):
        """A learn_sigma UNet (out=2*in) trains with finite loss and the
        LEARNED_RANGE sampler produces finite samples."""
        from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply
        from sin3dm_tpu.training.diffusion import (DiffusionTrainerConfig,
                                                   init_train_state,
                                                   make_train_step)
        from sin3dm_tpu.diffusion.sampling import p_sample_loop

        tables = _tables(steps=20)
        dcfg = gd.DiffusionConfig(var_type=gd.VarType.LEARNED_RANGE,
                                  loss_kind=gd.LossKind.RESCALED_MSE,
                                  original_num_steps=20)
        ucfg = UNetConfig(in_channels=C, model_channels=32,
                          out_channels=2 * C)
        params = init_unet(jax.random.PRNGKey(0), ucfg)
        tcfg = DiffusionTrainerConfig(batch_size=2, lr=1e-4,
                                      lr_anneal_steps=10)
        state = init_train_state(params, tcfg, 20)
        batch = randn(jax.random.PRNGKey(1), 2, C, SIZES)
        step = make_train_step(
            lambda p, x, tt: unet_apply(p, ucfg, x, tt),
            tables, dcfg, tcfg)
        for i in range(3):
            state, metrics = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(2), i))
            assert np.isfinite(float(jnp.mean(metrics["loss"])))
            assert np.isfinite(float(jnp.mean(metrics["vb"])))
            assert not bool(np.asarray(metrics["skipped"]).any())

        model = lambda x, tt: unet_apply(state.params, ucfg, x, tt)
        s = p_sample_loop(model, tables, dcfg, jax.random.PRNGKey(3),
                          1, C, SIZES)
        assert s.xy.shape == (1, 8, 6, C)
        for p in s:
            assert np.all(np.isfinite(np.asarray(p)))


class TestConfigLearnSigma:
    def test_train_args_doubles_out_channels(self, tmp_path):
        from sin3dm_tpu.core import config as cfgmod
        tag = str(tmp_path / "t1")
        args = cfgmod.train_args([
            "--tag", tag, "--data_path", "dummy.npz",
            "--learn_sigma", "True"])
        assert args.in_channels == 12
        assert args.out_channels == 24
        dc = cfgmod.diffusion_config_from_args(args)
        assert dc.var_type == gd.VarType.LEARNED_RANGE

    def test_use_kl_raises_at_config_time(self, tmp_path):
        from sin3dm_tpu.core import config as cfgmod
        tag = str(tmp_path / "t2")
        args = cfgmod.train_args([
            "--tag", tag, "--data_path", "dummy.npz", "--use_kl", "True"])
        with pytest.raises(NotImplementedError):
            cfgmod.diffusion_config_from_args(args)
