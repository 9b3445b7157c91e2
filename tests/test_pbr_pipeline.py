"""PBR data path: mesh_sampler_pbr on a synthetic textured cube ->
8-channel npz -> AE forward -> decode_texmesh PBR export."""

import os

import numpy as np
import pytest


def _write_pbr_cube(dirpath):
    os.makedirs(os.path.join(dirpath, "textures"), exist_ok=True)
    from PIL import Image
    rng = np.random.default_rng(0)
    albedo = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(albedo).save(
        os.path.join(dirpath, "textures", "albedo.png"))
    Image.fromarray((np.ones((32, 32)) * 128).astype(np.uint8)).save(
        os.path.join(dirpath, "textures", "metallic.png"))
    Image.fromarray((np.ones((32, 32)) * 64).astype(np.uint8)).save(
        os.path.join(dirpath, "textures", "roughness.png"))
    normal = np.zeros((32, 32, 3), np.uint8)
    normal[..., 2] = 255
    Image.fromarray(normal).save(
        os.path.join(dirpath, "textures", "normal.png"))

    obj = os.path.join(dirpath, "model.obj")
    v = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
         (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    faces = [(0, 2, 1), (0, 3, 2), (4, 5, 6), (4, 6, 7),
             (0, 1, 5), (0, 5, 4), (2, 3, 7), (2, 7, 6),
             (0, 4, 7), (0, 7, 3), (1, 2, 6), (1, 6, 5)]
    with open(obj, "w") as f:
        for p in v:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        f.write("vt 0.1 0.1\nvt 0.9 0.1\nvt 0.5 0.9\n")
        for a, b, c in faces:
            f.write(f"f {a + 1}/1 {b + 1}/2 {c + 1}/3\n")
    return obj


@pytest.mark.slow
def test_pbr_sampler_and_decode(tmp_path):
    from sin3dm_tpu.dataio import mesh_sampler_pbr

    obj = _write_pbr_cube(str(tmp_path))
    npz = str(tmp_path / "pbr.npz")
    mesh_sampler_pbr.run(obj, npz, reso=24, n_surf=5000, watertight=True)

    data = np.load(npz)
    assert data["tex_grid"].shape[-1] == 8
    assert data["tex_on_surf"].shape == (5000, 8)
    # metallic ~128/255, roughness ~64/255, normal z ~1.0 everywhere
    tex = data["tex_on_surf"]
    np.testing.assert_allclose(tex[:, 3].mean(), 128 / 255, atol=0.02)
    np.testing.assert_allclose(tex[:, 4].mean(), 64 / 255, atol=0.02)
    np.testing.assert_allclose(tex[:, 7].mean(), 1.0, atol=0.02)

    # AE pbr variant roundtrip through decode_texmesh's PBR export
    import jax
    from sin3dm_tpu.models import autoencoder as ae
    from sin3dm_tpu.training import ae as ae_train

    acfg = ae.AEConfig(data_type="sdfpbr", enc_net_type="pbr",
                       fdim_up=32, hidden_dim=64)
    tcfg = ae_train.AETrainerConfig(enc_batch_size=512, enc_n_iters=10,
                                    fm_reso=12)
    trainer = ae_train.AETrainer(str(tmp_path / "log"), acfg, tcfg)
    trainer.load_data(npz)
    trainer.train(jax.random.PRNGKey(0), log_every=10)
    feat = trainer.encode()
    out = str(tmp_path / "out")
    trainer.decode_texmesh(out, feat, reso=24, n_faces=200,
                           texture_reso=64)
    assert os.path.exists(os.path.join(out, "object.obj"))
    for name in ("albedo", "metallic", "roughness", "normal"):
        assert os.path.exists(os.path.join(out, "textures", f"{name}.png"))
    mtl = open(os.path.join(out, "object.mtl")).read()
    assert "map_Bump" in mtl
