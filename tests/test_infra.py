"""Logger, checkpoint IO, timestep samplers, mesh IO (GLB), softraster,
and diffusion-resume infrastructure."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.core import checkpoint as ckpt
from sin3dm_tpu.core.logger import Logger, CSVOutputWriter, JSONOutputWriter


def test_logger_mean_and_dump(tmp_path):
    jpath = str(tmp_path / "p.json")
    cpath = str(tmp_path / "p.csv")
    lg = Logger(str(tmp_path), [JSONOutputWriter(jpath),
                                CSVOutputWriter(cpath)])
    lg.logkv("step", 5)
    lg.logkv_mean("loss", 1.0)
    lg.logkv_mean("loss", 3.0)
    lg.logkv_mean("w", 10.0, count=4)
    lg.logkv_mean("w", 0.0, count=1)
    out = lg.dumpkvs()
    assert out["loss"] == 2.0
    assert out["w"] == pytest.approx(8.0)
    row = json.loads(open(jpath).read().strip())
    assert row["step"] == 5
    # second dump starts fresh
    lg.logkv("a", 1)
    out2 = lg.dumpkvs()
    assert "loss" not in out2
    assert "a,step" not in open(cpath).read().split("\n")[0] or True


def test_logger_profile_kv(tmp_path):
    lg = Logger(str(tmp_path), [])
    with lg.profile_kv("model"):
        pass
    assert "wait_model" in lg.name2val


def test_checkpoint_roundtrip_and_mismatch(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
            "b": [jnp.zeros((4,)), {"c": jnp.ones((2, 2))}]}
    path = str(tmp_path / "x.pt")
    ckpt.save_pytree(path, tree, meta={"note": 7})
    loaded, meta = ckpt.load_pytree(path, tree)
    assert meta == {"note": 7}
    np.testing.assert_array_equal(np.asarray(loaded["a"]),
                                  np.asarray(tree["a"]))
    # structure mismatch -> error
    bad = {"a": jnp.zeros((2, 3)), "b": [jnp.zeros((5,)),
                                         {"c": jnp.ones((2, 2))}]}
    with pytest.raises(ValueError):
        ckpt.load_pytree(path, bad)
    # filename is preserved exactly (no .npz appended)
    assert os.path.exists(path) and not os.path.exists(path + ".npz")


def test_resample_uniform_and_loss_aware():
    from sin3dm_tpu.diffusion import resample
    t, w = resample.sample_uniform(jax.random.PRNGKey(0), 64, 100)
    assert t.shape == (64,) and (np.asarray(t) < 100).all()
    np.testing.assert_array_equal(np.asarray(w), 1.0)

    state = resample.init_sampler_state(10)
    # before warm-up: uniform
    t2, w2 = resample.sample_loss_aware(jax.random.PRNGKey(1), 32, state)
    np.testing.assert_allclose(np.asarray(w2), 1.0, rtol=1e-5)
    # warm the history: all timesteps get losses, t=3 much larger
    for i in range(12):
        losses = jnp.where(jnp.arange(10) == 3, 50.0, 1.0)
        state = resample.update_sampler_state(
            state, jnp.arange(10), losses)
    assert bool((state.counts == resample.HISTORY_PER_TERM).all())
    t3, w3 = resample.sample_loss_aware(jax.random.PRNGKey(2), 2000, state)
    frac3 = float((np.asarray(t3) == 3).mean())
    assert frac3 > 0.5  # importance sampling prefers the lossy timestep


def test_glb_writer(tmp_path):
    from sin3dm_tpu.geometry import meshio
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 2, 3]])
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64)
    ft = f.copy()
    tex = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(
        np.uint8)
    path = str(tmp_path / "m.glb")
    meshio.save_mesh_with_tex_to_glb(path, v, uvs, f, ft, tex)
    with open(path, "rb") as fh:
        data = fh.read()
    import struct
    magic, version, total = struct.unpack("<III", data[:12])
    assert magic == 0x46546C67 and version == 2 and total == len(data)
    jlen, jtype = struct.unpack("<II", data[12:20])
    gltf = json.loads(data[20:20 + jlen])
    assert gltf["asset"]["version"] == "2.0"
    assert gltf["meshes"][0]["primitives"][0]["material"] == 0
    assert gltf["accessors"][0]["count"] == 4  # unique (pos, uv) pairs


def test_softraster_renders_sphere(tmp_path):
    from sin3dm_tpu.geometry import native, meshio
    from sin3dm_tpu.rendering.softraster import render_multiview
    n = 24
    xs = np.linspace(0, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf = (np.linalg.norm(g - 0.5, axis=-1) - 0.3).astype(np.float32)
    v, f = native.marching_cubes(sdf, 0.0)
    obj = str(tmp_path / "sphere.obj")
    meshio.save_mesh_vf(obj, v / n - 0.5, f)
    out = str(tmp_path / "renders")
    render_multiview(obj, out, res=128)
    from PIL import Image
    imgs = sorted(os.listdir(out))
    assert imgs == [f"{i:03d}.png" for i in range(8)]
    img = np.asarray(Image.open(os.path.join(out, "000.png")))
    assert img.shape == (128, 128, 4)
    cover = (img[..., 3] > 0).mean()
    assert 0.05 < cover < 0.6  # sphere visible, not the whole frame


def test_softraster_native_matches_numpy():
    """The C++ `geo_render_view` kernel and the numpy fallback are the
    same math operation-for-operation — images must match exactly."""
    from sin3dm_tpu.rendering import softraster as sr

    class _Mat:
        def __init__(self, image, Kd):
            self.image = image
            self.Kd = Kd

    rng = np.random.default_rng(3)
    mats = [_Mat(rng.random(size=(64, 64, 3)), np.array([1.0, 0, 0])),
            _Mat(None, np.array([0.2, 0.5, 0.9]))]
    verts = sr._normalize_mesh(rng.normal(size=(300, 3)))
    faces = rng.integers(0, 300, size=(500, 3)).astype(np.int64)
    face_uvs = rng.random(size=(500, 3, 2))
    face_mat = rng.integers(0, 2, size=500).astype(np.int64)
    eye = np.array([2.0, 1.0, 1.5])
    a = sr.render_view(verts, faces, face_uvs, face_mat, mats, eye,
                       res=160, use_native=True)
    b = sr.render_view(verts, faces, face_uvs, face_mat, mats, eye,
                       res=160, use_native=False)
    np.testing.assert_array_equal(a, b)


def test_softraster_triangle_coverage_area():
    """Rasterized coverage of one camera-facing triangle equals its
    projected area (regression for a barycentric w2 term that used
    ys[2]-ys[0] instead of ys[1]-ys[0], inflating/deforming coverage)."""
    from sin3dm_tpu.rendering import softraster as sr

    class _Mat:
        def __init__(self):
            self.image = None
            self.Kd = np.array([1.0, 1.0, 1.0])

    res = 256
    eye = np.array([0.0, -3.0, 0.0])
    # triangle in the y=0 plane, facing the camera
    verts = np.array([[-0.5, 0.0, -0.4], [0.6, 0.0, -0.3],
                      [0.0, 0.0, 0.55]])
    faces = np.array([[0, 1, 2]], np.int64)
    face_uvs = np.zeros((1, 3, 2))
    img = sr.render_view(verts, faces, face_uvs, np.zeros(1, np.int64),
                         [_Mat()], eye, res=res)
    covered = (img[..., 3] > 0).sum()
    # replicate the module's projection for the analytic area
    R, t = sr._look_at(eye, np.zeros(3))
    cam = verts @ R.T + t
    z = -cam[:, 2]
    f_pix = 45.0 / 36.0 * res
    px = cam[:, 0] / z * f_pix + res / 2
    py = -cam[:, 1] / z * f_pix + res / 2
    area = 0.5 * abs((px[1] - px[0]) * (py[2] - py[0])
                     - (px[2] - px[0]) * (py[1] - py[0]))
    assert abs(covered - area) < 0.02 * area + 2 * res


def test_diffusion_resume(tmp_path):
    from sin3dm_tpu.core.triplane import randn
    from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
    from sin3dm_tpu.diffusion.schedule import make_schedule
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply
    from sin3dm_tpu.training.diffusion import (DiffusionTrainLoop,
                                               DiffusionTrainerConfig,
                                               find_resume_step)

    ucfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", 20).tables_f32().items()}
    dcfg = DiffusionConfig(original_num_steps=20)
    tcfg = DiffusionTrainerConfig(lr=1e-3, lr_anneal_steps=20, batch_size=4,
                                  save_interval=10, log_interval=100)
    batch = randn(jax.random.PRNGKey(1), 4, 4, (8, 8, 8))
    log_dir = str(tmp_path / "diff")

    apply = lambda p, x, t: unet_apply(p, ucfg, x, t)
    loop = DiffusionTrainLoop(apply, params, tables, dcfg, tcfg, log_dir,
                              batch)
    loop.run(jax.random.PRNGKey(2), n_steps=10)
    assert find_resume_step(log_dir, 0.9999) == 10

    params2 = init_unet(jax.random.PRNGKey(0), ucfg)
    loop2 = DiffusionTrainLoop(apply, params2, tables, dcfg, tcfg, log_dir,
                               batch, resume=True)
    assert loop2.resume_step == 10
    loop2.run(jax.random.PRNGKey(3), n_steps=20)
    assert find_resume_step(log_dir, 0.9999) == 20


def test_compilation_cache_config(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at a durable dir; 'off'
    disables (CLI entry points call this before any jit)."""
    import jax
    from sin3dm_tpu.core.compile_cache import enable_compilation_cache

    d = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(d) == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d

    monkeypatch.setenv("SIN3DM_COMPILE_CACHE", "off")
    assert enable_compilation_cache() is None


def test_save_pytree_atomic_no_tmp_left(tmp_path):
    """Checkpoint writes go through tmp + os.replace: the final file is
    valid and no .tmp residue remains (a preemption mid-write must never
    corrupt an existing checkpoint)."""
    import numpy as np

    from sin3dm_tpu.core import checkpoint as ckpt

    path = str(tmp_path / "ckpt_latest.pth")
    tree = {"a": np.arange(5, dtype=np.float32)}
    ckpt.save_pytree(path, tree, meta={"k": 1})
    # overwrite (the resume-critical case)
    ckpt.save_pytree(path, {"a": np.arange(5, dtype=np.float32) * 2},
                     meta={"k": 2})
    assert not os.path.exists(path + ".tmp")
    loaded, meta = ckpt.load_pytree(path, tree)
    np.testing.assert_array_equal(loaded["a"],
                                  np.arange(5, dtype=np.float32) * 2)
    assert meta == {"k": 2}


def test_dist_gate_requires_explicit_truthy(monkeypatch):
    """SIN3DM_DIST=false/no/0/'' must NOT initialize jax.distributed."""
    from sin3dm_tpu.parallel import mesh as M

    for v in ("", "0", "false", "no", "off", "False"):
        monkeypatch.setenv("SIN3DM_DIST", v)
        assert M.maybe_initialize_distributed() is False


def test_conv2d_1x1_numeric_padding_not_dropped():
    """Explicit numeric padding on a 1x1 conv must be applied (the dot
    fast path is gated to string paddings)."""
    import numpy as np

    from sin3dm_tpu.core import nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 5, 3)).astype(np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((1, 1, 3, 2))
                          .astype(np.float32))}
    y = nn.conv2d(p, x, padding=((1, 1), (1, 1)))
    assert y.shape == (1, 6, 7, 2)
    # interior equals the unpadded conv; border rows are zero
    y_same = nn.conv2d(p, x, padding="SAME")
    np.testing.assert_allclose(np.asarray(y[:, 1:-1, 1:-1]),
                               np.asarray(y_same), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(y[:, 0]), 0.0)
