"""Evaluation metrics: patch LP-IoU/F-score/Div identities, Fréchet
distance, SSFID classifier plumbing, SIFID stem + LPIPS math with random
weights, mesh IO round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sin3dm_tpu.evaluation import patch_metrics


def _sphere_grid(n=64, r=0.5, offset=(0.0, 0.0, 0.0)):
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    return np.linalg.norm(g - np.asarray(offset), axis=-1) < r


def test_lp_self_identity():
    g = _sphere_grid(64)
    iou, f1 = patch_metrics.eval_lp([g], g)
    assert iou == pytest.approx(1.0, abs=1e-6)
    assert f1 == pytest.approx(1.0, abs=1e-6)


def test_lp_decreases_with_perturbation():
    g = _sphere_grid(64, 0.5)
    g2 = _sphere_grid(64, 0.5, offset=(0.12, 0, 0))
    iou_same, _ = patch_metrics.eval_lp([g], g)
    iou_diff, f_diff = patch_metrics.eval_lp([g2], g)
    assert iou_diff < iou_same
    assert 0.0 < iou_diff < 1.0 and 0.0 < f_diff <= 1.0


def test_lp_full_variants_identity_and_bounds():
    """eval_lp_full returns all four reference metrics
    (`patch_utils.py:163-166`); identity gives 1.0 on every variant."""
    g = _sphere_grid(64)
    res = patch_metrics.eval_lp_full([g], g)
    for k in ("LP-IOU-avg", "LP-IOU-percent", "LP-F-score-avg",
              "LP-F-score-percent"):
        assert res[k] == pytest.approx(1.0, abs=1e-6), (k, res)
    g2 = _sphere_grid(64, 0.5, offset=(0.12, 0, 0))
    res2 = patch_metrics.eval_lp_full([g2], g)
    assert res2["LP-IOU-percent"] < 1.0
    assert res2["LP-IOU-percent"] <= res2["LP-F-score-percent"] + 1e-9


def test_lp_identity_towerruins_canonical():
    """Reference-shape-vs-itself LP == 1.0 at the canonical 128 pooling —
    guards pool_to / patch alignment regressions with the REAL data
    (VERDICT r3 item 10).  Skipped when the dataset npz is absent."""
    import os
    npz = os.path.join(os.path.dirname(__file__), "..", "data",
                       "towerruins", "towerruins.npz")
    if not os.path.exists(npz):
        pytest.skip("towerruins npz not present")
    ref = patch_metrics.load_sdf_npz_as_voxel(npz)
    assert max(ref.shape) == 128  # canonical pooling engaged
    res = patch_metrics.eval_lp_full([ref], ref)
    assert res["LP-IOU-avg"] == pytest.approx(1.0, abs=1e-6), res
    assert res["LP-IOU-percent"] == pytest.approx(1.0, abs=1e-6), res


def test_div_identities():
    g = _sphere_grid(48)
    assert patch_metrics.eval_div([g, g]) == pytest.approx(0.0, abs=1e-9)
    g2 = _sphere_grid(48, 0.5, offset=(0.3, 0, 0))
    d = patch_metrics.eval_div([g, g2])
    assert 0.0 < d < 1.0


def test_pool_to():
    g = np.zeros((256, 130, 64), bool)
    g[10, 10, 10] = True
    p = patch_metrics.pool_to(g, 128)
    assert p.shape == (128, 65, 64)
    assert p.sum() == 1  # max-pool preserves occupancy


def test_frechet_distance_identity():
    from sin3dm_tpu.evaluation.ssfid import frechet_distance
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 16))
    mu, sig = x.mean(0), np.cov(x, rowvar=False)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    y = x + 2.0
    d = frechet_distance(mu, sig, y.mean(0), np.cov(y, rowvar=False))
    assert d == pytest.approx(16 * 4.0, rel=0.01)  # ||mu diff||^2


def test_ssfid_classifier_shapes():
    from sin3dm_tpu.evaluation import ssfid
    rng = np.random.default_rng(0)
    params = {}
    cins = [1, 32, 64, 128, 256]
    couts = [32, 64, 128, 256, 512]
    for i, (ci, co) in enumerate(zip(cins, couts), start=1):
        params[f"conv_{i}"] = {
            "w": jnp.asarray(rng.standard_normal((4, 4, 4, ci, co))
                             * 0.01, jnp.float32),
            "b": jnp.zeros((co,), jnp.float32)}
    params["linear1"] = {"w": jnp.zeros((512, 24)), "b": jnp.zeros((24,))}
    vox = jnp.asarray(rng.random((1, 64, 64, 64, 1)), jnp.float32)
    act = ssfid.classifier_features(params, vox, out_layer=2)
    assert act.shape == (1, 16, 16, 16, 64)
    logits, z = ssfid.classifier_features(params, vox, out_layer=None)
    assert logits.shape == (1, 24) and z.shape == (1, 512)


def test_sifid_stem_shapes():
    from sin3dm_tpu.evaluation import sifid
    rng = np.random.default_rng(1)

    def conv_bn(ci, co, k):
        return {"w": jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.05,
                                 jnp.float32),
                "gamma": jnp.ones((co,)), "beta": jnp.zeros((co,)),
                "mean": jnp.zeros((co,)), "var": jnp.ones((co,))}

    params = {"Conv2d_1a_3x3": conv_bn(3, 32, 3),
              "Conv2d_2a_3x3": conv_bn(32, 32, 3),
              "Conv2d_2b_3x3": conv_bn(32, 64, 3),
              "Conv2d_3b_1x1": conv_bn(64, 80, 1),
              "Conv2d_4a_3x3": conv_bn(80, 192, 3)}
    img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    f64 = sifid.stem_features(params, img, 64)
    assert f64.shape[-1] == 64
    f192 = sifid.stem_features(params, img, 192)
    assert f192.shape[-1] == 192
    # unsupported dim rejected up front; deep dims (768/2048) need the
    # Mixed_* weights (stem-only params raise KeyError there) — full
    # coverage lives in tests/test_eval_parity.py
    with pytest.raises(ValueError):
        sifid.stem_features(params, img, 100)
    with pytest.raises(KeyError):
        sifid.stem_features(params, img, 2048)


def test_lpips_math_random_weights():
    from sin3dm_tpu.evaluation import lpips
    rng = np.random.default_rng(2)
    params = []
    cin = 3
    for cout, k, s, p, pool in lpips._ALEX_CFG:
        params.append({"w": jnp.asarray(
            rng.standard_normal((k, k, cin, cout)) * 0.03, jnp.float32),
            "b": jnp.zeros((cout,))})
        cin = cout
    lin = [jnp.asarray(np.abs(rng.standard_normal(c[0])) * 0.01,
                       jnp.float32) for c in lpips._ALEX_CFG]
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    # identical images -> 0
    assert float(lpips.lpips_pair(params, lin, x, x)) == pytest.approx(
        0.0, abs=1e-7)
    y = jnp.clip(x + 0.5, -1, 1)
    assert float(lpips.lpips_pair(params, lin, x, y)) > 0


def test_lpips_bundled_ckpt_loader():
    """Validate the lpips_weights.ckpt key schema against the reference's
    bundled file when available."""
    import os
    path = "/root/reference/evaluation/lpips_weights.ckpt"
    if not os.path.exists(path):
        pytest.skip("reference lpips ckpt not present")
    from sin3dm_tpu.evaluation.lpips import load_lpips_lin_weights
    lin = load_lpips_lin_weights(path)
    assert len(lin) == 5
    assert [w.shape[0] for w in lin] == [64, 192, 384, 256, 256]


def test_meshio_obj_roundtrip(tmp_path):
    from sin3dm_tpu.geometry import meshio, meshproc
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    f = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 2, 3]])
    uvs = np.array([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]], float)
    ft = np.array([[0, 1, 2]] * 4)
    tex = np.zeros((16, 16, 3), np.uint8)
    path = str(tmp_path / "m.obj")
    meshio.save_mesh_with_tex(path, v, uvs, f, ft, tex,
                              Kd=[0.5, 0.6, 0.7], Ns=33)
    scene = meshproc.load_obj_scene(path)
    np.testing.assert_allclose(scene["verts"], v)
    np.testing.assert_array_equal(scene["faces"], f)
    np.testing.assert_allclose(scene["face_uvs"][0],
                               uvs[ft[0]], rtol=1e-5)
    mat = scene["materials"][0]
    np.testing.assert_allclose(mat.Kd, [0.5, 0.6, 0.7])
    assert mat.Ns == 33
    assert mat.image is not None  # png found next to obj

    # mtl param copier (`utils3d.py:28-43` semantics)
    s = meshio.read_material_params_from_mtl(path.replace(".obj", ".mtl"))
    assert "Kd 0.5 0.6 0.7" in s and "map_" not in s


def test_meshio_pbr_writer(tmp_path):
    from sin3dm_tpu.geometry import meshio
    v = np.zeros((3, 3))
    f = np.array([[0, 1, 2]])
    uvs = np.zeros((3, 2))
    img3 = np.zeros((8, 8, 3), np.uint8)
    img1 = np.zeros((8, 8), np.uint8)
    path = str(tmp_path / "p.obj")
    meshio.save_mesh_with_pbr(path, v, uvs, f, f, img3, img1, img1, img3)
    import os
    tex = tmp_path / "textures"
    for name in ("albedo", "metallic", "roughness", "normal"):
        assert (tex / f"{name}.png").exists()
    mtl = open(path.replace(".obj", ".mtl")).read()
    assert "map_Pm textures/metallic.png" in mtl
