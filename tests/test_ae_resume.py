"""AE checkpoint completeness + resume: the combined
params/optimizer/step checkpoint (`ckpt_latest.pth` / `ckpt_final.pth`)
reproduces the uninterrupted training trajectory exactly
(reference bundle: `src/encoding/model.py:141-176`, whose optimizer state
was saved but never loaded — here resume actually works)."""

import os

import jax
import numpy as np
import pytest

from sin3dm_tpu.models import autoencoder as ae
from sin3dm_tpu.training import ae as ae_train

from test_ae import _make_sphere_npz


def _cfg():
    return ae.AEConfig(data_type="sdftex", fdim_geo=2, fdim_tex=4,
                       fdim_up=16, hidden_dim=32, n_hidden_layers=2)


def _tcfg(n_iters):
    return ae_train.AETrainerConfig(enc_batch_size=512, enc_n_iters=n_iters,
                                    enc_lr=5e-3, fm_reso=16)


@pytest.mark.slow
def test_ae_resume_reproduces_uninterrupted_run(tmp_path):
    npz = str(tmp_path / "sphere.npz")
    _make_sphere_npz(npz)
    N = 60
    mid_save = 20  # ckpt_latest lands at iter 20 and 40

    # uninterrupted run
    t_full = ae_train.AETrainer(str(tmp_path / "full"), _cfg(), _tcfg(N))
    t_full.load_data(npz)
    t_full.train(jax.random.PRNGKey(0), log_every=1000,
                 save_every=mid_save)

    # interrupted at iter 40 (last ckpt_latest), then resumed
    log2 = str(tmp_path / "resumed")
    t_a = ae_train.AETrainer(log2, _cfg(), _tcfg(N))
    t_a.load_data(npz)
    t_a.train(jax.random.PRNGKey(0), log_every=1000, save_every=mid_save,
              n_iters=41)  # runs 0..40; latest saved at step 40
    assert os.path.exists(os.path.join(log2, "ckpt_latest.pth"))

    t_b = ae_train.AETrainer(log2, _cfg(), _tcfg(N))
    t_b.load_data(npz)
    t_b.train(jax.random.PRNGKey(0), log_every=1000, save_every=mid_save,
              resume=True)

    # params identical to the uninterrupted run (same keys, deterministic
    # CPU math, exact host round-trip)
    fa = jax.tree_util.tree_leaves(t_full.params)
    fb = jax.tree_util.tree_leaves(t_b.params)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_final_ckpt_contains_opt_state_and_loads_everywhere(tmp_path):
    npz = str(tmp_path / "sphere.npz")
    _make_sphere_npz(npz)
    log = str(tmp_path / "log")
    tr = ae_train.AETrainer(log, _cfg(), _tcfg(10))
    tr.load_data(npz)
    tr.train(jax.random.PRNGKey(0), log_every=1000)

    from sin3dm_tpu.core import checkpoint as ckpt
    paths = ckpt.peek_paths(os.path.join(log, "ckpt_final.pth"))
    assert any(p.startswith("params/") for p in paths)
    assert any(p.startswith("opt_state/") for p in paths)
    assert "step" in paths

    # decode-style consumer loads params-only from the combined file
    t2 = ae_train.AETrainer(log, _cfg(), _tcfg(10))
    t2.load_ckpt("final")
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t2.meta["featmap_size"] == tr.meta["featmap_size"]

    # train-state consumer gets the optimizer bundle back
    t3 = ae_train.AETrainer(log, _cfg(), _tcfg(10))
    got = t3.load_train_state("final")
    assert got is not None
    _, opt_state, step = got
    assert step == 10


def test_legacy_params_only_ckpt_still_loads(tmp_path):
    """Round-1 checkpoints (params-only) keep loading."""
    log = str(tmp_path / "log")
    tr = ae_train.AETrainer(log, _cfg(), _tcfg(10))
    tr.params = ae.init_autoencoder(jax.random.PRNGKey(0), _cfg())
    tr.meta = {"featmap_size": [16, 16, 16], "aabb": [-1, -1, -1, 1, 1, 1],
               "threshold": 0.1}
    from sin3dm_tpu.core import checkpoint as ckpt
    ckpt.save_pytree(os.path.join(log, "ckpt_final.pth"), tr.params,
                     meta=tr.meta)
    t2 = ae_train.AETrainer(log, _cfg(), _tcfg(10))
    t2.load_ckpt("final")
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t2.load_train_state("final") is None
