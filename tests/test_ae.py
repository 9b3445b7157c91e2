"""Autoencoder: shapes, losses, split-lr optimizer, and a small
train-overfit + mesh decode integration on a synthetic sphere dataset."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.models import autoencoder as ae
from sin3dm_tpu.training import ae as ae_train


def _cfg(**kw):
    kw.setdefault("fdim_geo", 4)
    kw.setdefault("fdim_tex", 8)
    kw.setdefault("fdim_up", 32)
    kw.setdefault("hidden_dim", 64)
    kw.setdefault("n_hidden_layers", 4)
    return ae.AEConfig(**kw)


def test_encode_shapes():
    cfg = _cfg()
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    vol = jnp.zeros((1, 16, 12, 8, 4))  # sdf + rgb
    feat = ae.encode(params, cfg, vol)
    assert feat.xy.shape == (1, 8, 6, 12)
    assert feat.xz.shape == (1, 8, 4, 12)
    assert feat.yz.shape == (1, 6, 4, 12)
    # tanh(x*0.5) output range
    assert float(jnp.max(jnp.abs(feat.xy))) <= 1.0


def test_forward_output_shapes():
    cfg = _cfg()
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    vol = jnp.zeros((1, 16, 16, 16, 4))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (100, 3), minval=-1,
                             maxval=1)
    aabb = jnp.array([-1, -1, -1, 1, 1, 1], jnp.float32)
    out = ae.forward(params, cfg, vol, pts, aabb)
    assert out.shape == (100, 4)  # sdf + rgb
    # tex channel is sigmoid-bounded
    assert float(jnp.min(out[:, 1:])) >= 0.0
    assert float(jnp.max(out[:, 1:])) <= 1.0


def test_sdf_only_variant():
    cfg = _cfg(data_type="sdf")
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    assert "tex_encoder" not in params
    vol = jnp.zeros((1, 8, 8, 8, 1))
    pts = jnp.zeros((10, 3))
    aabb = jnp.array([-1, -1, -1, 1, 1, 1], jnp.float32)
    out = ae.forward(params, cfg, vol, pts, aabb)
    assert out.shape == (10, 1)


def test_pbr_variant():
    cfg = _cfg(data_type="sdfpbr", enc_net_type="pbr")
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    assert len(params["tex_convs"]) == 2
    vol = jnp.zeros((1, 8, 8, 8, 9))  # sdf + 8 pbr channels
    pts = jnp.zeros((10, 3))
    aabb = jnp.array([-1, -1, -1, 1, 1, 1], jnp.float32)
    out = ae.forward(params, cfg, vol, pts, aabb)
    assert out.shape == (10, 9)


def test_geo_param_labels():
    cfg = _cfg()
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    labels = ae.geo_param_labels(params)
    flat = jax.tree_util.tree_leaves(labels)
    assert set(flat) == {"geo", "tex"}


def test_sdf_loss_weightedl1():
    pred = jnp.array([[0.5], [-0.5]])
    gt = jnp.array([[1.0], [1.0]])
    # sign(gt)=1; sign(gt-pred)=1 both -> weight 1.5
    loss = ae_train.sdf_loss_fn("weightedl1", pred, gt)
    expect = np.mean([0.5 * 1.5, 1.5 * 1.5])
    assert float(loss) == pytest.approx(expect, rel=1e-5)


def test_masked_tex_loss_empty_mask_safe():
    pred = jnp.ones((4, 3))
    gt = jnp.zeros((4, 3))
    mask = jnp.zeros((4,), bool)
    loss = ae_train.masked_tex_loss_fn("l1", pred, gt, mask)
    assert float(loss) == 0.0


def test_tsdf_eval_rel_error_zero_gt_safe():
    # exact-zero gt SDF rows must not poison the rel-error means
    # (the reference divides unguarded, `model.py:497`)
    gt = np.array([0.0, 0.01, -0.02, 0.005], np.float32)
    pred = np.array([0.003, 0.012, -0.019, 0.004], np.float32)
    res = ae_train.evaluate_tsdf_prediction(pred, gt, sdf_threshold=0.0234)
    assert np.isfinite(res["mean_tsdf_rel_error"])
    for k, val in res.items():
        if "rel" in k and k != "mean_tsdf_rel_error":
            suffix = k[len("mean_tsdf_rel_error_"):]
            if res[f"mean_tsdf_count_{suffix}"] > 0:
                assert np.isfinite(val), (k, val)
    # with no zeros present, values equal the unguarded division
    res2 = ae_train.evaluate_tsdf_prediction(pred[1:], gt[1:], 0.0234)
    exp = float(np.mean(np.abs(pred[1:] - gt[1:]) / np.abs(gt[1:])))
    assert res2["mean_tsdf_rel_error"] == pytest.approx(exp, rel=1e-6)


def test_async_export_orders_and_propagates_errors(tmp_path):
    """The background export writer must (a) run submitted assembles in
    submission order on ONE worker and (b) re-raise worker errors at the
    drain point (decode entry points drain before returning)."""
    acfg = _cfg()
    trainer = ae_train.AETrainer(str(tmp_path / "log"), acfg,
                                 ae_train.AETrainerConfig())
    seen = []
    trainer._submit_assemble_probe = None  # noqa: attribute for clarity

    def fake_assemble(**kw):
        seen.append(kw["save_dir"])

    trainer._texmesh_assemble = fake_assemble
    for i in range(4):
        trainer._submit_assemble(save_dir=f"s{i}")
    trainer._drain_exports()
    assert seen == ["s0", "s1", "s2", "s3"]

    def boom(**kw):
        raise RuntimeError("writer failed")

    trainer._texmesh_assemble = boom
    trainer._submit_assemble(save_dir="x")
    with pytest.raises(RuntimeError, match="writer failed"):
        trainer._drain_exports()
    # drained: a second drain is a no-op
    trainer._drain_exports()

    # sync opt-out runs inline (no pool, immediate effect)
    trainer2 = ae_train.AETrainer(str(tmp_path / "log2"), acfg,
                                  ae_train.AETrainerConfig())
    trainer2._texmesh_assemble = fake_assemble
    import os as _os
    _os.environ["SIN3DM_ASYNC_EXPORT"] = "0"
    try:
        trainer2._submit_assemble(save_dir="inline")
        assert seen[-1] == "inline"
        assert trainer2._export_pool is None
    finally:
        del _os.environ["SIN3DM_ASYNC_EXPORT"]


def _make_sphere_npz(path, n=32, reso_pts=24):
    """Synthetic sdftex dataset with the reference npz schema."""
    rng = np.random.default_rng(0)
    aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    threshold = 2.0 / n * 3
    xs = np.linspace(0.5 / n, 1 - 0.5 / n, n) * 2 - 1
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf = np.linalg.norm(grid, axis=-1) - 0.6
    tex = np.zeros(grid.shape[:3] + (3,), np.float32)
    tex[..., 0] = 0.5 + 0.5 * grid[..., 0]

    n_surf = 2000
    dirs = rng.standard_normal((n_surf, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    on_surf = dirs * 0.6
    near = on_surf + rng.standard_normal((n_surf, 3)) * 0.005
    near_sdf = np.linalg.norm(near, axis=-1) - 0.6
    tex_fn = lambda p: np.stack(
        [0.5 + 0.5 * p[:, 0], np.zeros(len(p)), np.zeros(len(p))], -1)
    np.savez_compressed(
        path, pts_grid=grid.astype(np.float32),
        sdf_grid=sdf.astype(np.float32), tex_grid=tex,
        pts_on_surf=on_surf.astype(np.float32),
        tex_on_surf=tex_fn(on_surf).astype(np.float32),
        pts_near_surf=near.astype(np.float32),
        sdf_near_surf=near_sdf.astype(np.float32),
        tex_near_surf=tex_fn(near).astype(np.float32),
        aabb=aabb, threshold=threshold,
        Ka=[0, 0, 0], Kd=[1, 1, 1], Ks=[0.4, 0.4, 0.4], Ns=10)
    return threshold


@pytest.mark.slow
def test_ae_train_overfit_and_decode(tmp_path):
    """Mini end-to-end: train the AE on a sphere, check sign accuracy, and
    run the FULL decode_texmesh pipeline (marching cubes -> decimate -> UV
    atlas -> texture bake -> obj)."""
    npz = str(tmp_path / "sphere.npz")
    _make_sphere_npz(npz)

    acfg = _cfg()
    tcfg = ae_train.AETrainerConfig(enc_batch_size=2048, enc_n_iters=300,
                                    enc_lr=5e-3, fm_reso=16)
    trainer = ae_train.AETrainer(str(tmp_path / "log"), acfg, tcfg)
    trainer.load_data(npz)
    stat = trainer.train(jax.random.PRNGKey(0), log_every=200)
    assert stat["mean_tsdf_acc"] > 0.85
    assert os.path.exists(tmp_path / "log" / "eval_stat.json")
    assert os.path.exists(tmp_path / "log" / "ckpt_final.pth")

    feat = trainer.encode()
    out_dir = str(tmp_path / "rec")
    trainer.decode_texmesh(out_dir, feat, reso=48, n_faces=500,
                           texture_reso=128)
    assert os.path.exists(os.path.join(out_dir, "object.obj"))
    assert os.path.exists(os.path.join(out_dir, "object.mtl"))
    assert os.path.exists(os.path.join(out_dir, "object.png"))
    assert os.path.exists(os.path.join(out_dir, "voxel.npz"))

    vox = np.load(os.path.join(out_dir, "voxel.npz"))["vox_grid"]
    frac = vox.mean()
    # sphere r=0.6 in [-1,1]^3 -> volume fraction ~ (4/3 pi 0.6^3)/8 = 0.113
    assert 0.06 < frac < 0.18

    # decoded mesh should be sphere-like: verts near radius 0.6
    verts = []
    with open(os.path.join(out_dir, "object.obj")) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    radii = np.linalg.norm(np.array(verts), axis=1)
    assert abs(radii.mean() - 0.6) < 0.08

    # ckpt round trip
    t2 = ae_train.AETrainer(str(tmp_path / "log"), acfg, tcfg)
    t2.load_ckpt("final")
    assert t2.meta["featmap_size"] == trainer.meta["featmap_size"]


def test_uvatlas_no_overlap_and_coverage():
    from sin3dm_tpu.geometry import native, uvatlas
    # icosphere-ish: marching cubes sphere
    n = 24
    xs = np.linspace(0, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf = (np.linalg.norm(g - 0.5, axis=-1) - 0.3).astype(np.float32)
    v, f = native.marching_cubes(sdf, 0.0)
    uvs, tex_idx, gb_pos, mask = uvatlas.uv_unwrap_and_rasterize(v, f, 256)
    assert uvs.min() >= 0 and uvs.max() <= 1
    assert tex_idx.shape == f.shape
    # decent coverage: charts should fill a reasonable part of the atlas
    assert mask.mean() > 0.2
    # every interpolated position should lie near the sphere surface
    pos = gb_pos[mask]
    center = (n - 1) / 2.0
    radii = np.linalg.norm(pos - center, axis=-1) / (n - 1)
    np.testing.assert_allclose(radii.mean(), 0.3, atol=0.03)
    assert np.quantile(np.abs(radii - 0.3), 0.95) < 0.05


def test_uvatlas_texel_utilization():
    """Packing quality floor: profile packing + adaptive chart splits
    reach >= 0.65 texel utilization on a decimated bumpy-sphere decode
    (r1 axis-aligned shelves: 0.47; r2 oriented rects: 0.58-0.60; xatlas
    typically 0.6-0.75), and the splits may not balloon seam length —
    the seam ratio must stay moderate."""
    from sin3dm_tpu.geometry import native, uvatlas
    n = 64
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    r = np.linalg.norm(g, axis=-1)
    bump = (0.06 * np.sin(6 * g[..., 0]) * np.sin(5 * g[..., 1])
            * np.sin(7 * g[..., 2]))
    sdf = (r - 0.7 + bump).astype(np.float32)
    v, f = native.marching_cubes(sdf, 0.0)
    v2, f2 = native.decimate(v, f, 4000)
    uvs, tex_idx, gb_pos, mask = uvatlas.uv_unwrap_and_rasterize(v2, f2, 512)
    assert mask.mean() >= 0.65, mask.mean()
    # uvs all inside the unit square
    assert uvs.min() >= 0 and uvs.max() <= 1
    stats = uvatlas.seam_stats(v2, f2, tex_idx)
    print(f"utilization {mask.mean():.4f} seam_ratio "
          f"{stats['seam_ratio']:.4f}")
    # 6-axis binning alone sits near ~0.25 on this shape; the adaptive
    # splits may add a few cuts but must not run away
    assert stats["seam_ratio"] < 0.40, stats


def test_uvatlas_charts_rasterize_disjoint():
    """Definitive overlap check: rasterizing each chart SEPARATELY into
    the shared atlas must claim disjoint texel sets (guards any future
    packer change — rect layouts are disjoint by construction, but this
    is the property texture baking actually needs)."""
    from sin3dm_tpu.geometry import native, uvatlas

    n = 48
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    r = np.linalg.norm(g, axis=-1)
    bump = 0.08 * np.sin(5 * g[..., 0]) * np.sin(4 * g[..., 1])
    sdf = (r - 0.65 + bump).astype(np.float32)
    v, f = native.marching_cubes(sdf, 0.0)
    v2, f2 = native.decimate(v, f, 2500)

    uvs, tex_idx = uvatlas.parametrize(v2, f2)
    chart, _ = uvatlas._charts_by_axis(v2, f2)
    res = 512
    total = np.zeros((res, res), np.int32)
    for c in range(chart.max() + 1):
        fsel = chart == c
        _, mask = native.rasterize_uv(uvs, tex_idx[fsel], v2, f2[fsel], res)
        total += mask.astype(np.int32)
    assert total.max() <= 1, f"{(total > 1).sum()} texels claimed twice"
