"""Run-length texel wire: C++ span emission + on-device expansion.

The texture bake's host->device wire (VERDICT r4 weak #3: texel transfer
dominated decode in slow tunnel windows).  `geo_rasterize_uv_runs` emits
per-row (start, step, length) spans whose in-order expansion must
reproduce the dense rasterizer's masked texel stream exactly;
`decode_texels_runs` expands them on device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sin3dm_tpu.geometry import meshproc, native, uvatlas
from sin3dm_tpu.models import autoencoder as ae


@pytest.fixture(scope="module")
def sphere_atlas():
    """Decimated marching-cubes sphere -> UV atlas (a realistic chart
    population: hundreds of triangles, several charts)."""
    n = 48
    g = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.7).astype(np.float32)
    v, f = meshproc.sdfgrid_to_mesh(sdf)
    v = v / n * 2 - 1
    v, f = meshproc.mesh_decimation(v, f, 800)
    uvs, tex_idx = uvatlas.parametrize(v, f, padding=2 / 256)
    return (uvs.astype(np.float32), tex_idx.astype(np.int32),
            v.astype(np.float32), f.astype(np.int32))


def test_runs_match_dense_rasterizer(sphere_atlas):
    uvs, tex_idx, v, f = sphere_atlas
    res = 256
    pos, mask = native.rasterize_uv(uvs, tex_idx, v, f, res)
    mask2, runs = native.rasterize_uv_runs(uvs, tex_idx, v, f, res)
    np.testing.assert_array_equal(mask, mask2)

    lens = runs[:, 6].astype(np.int64)
    assert int(lens.sum()) == int(mask.sum())
    assert (lens >= 1).all()

    # in-order expansion == row-major masked compaction of the dense image
    exp = np.concatenate(
        [runs[i, :3] + runs[i, 3:6] * np.arange(l)[:, None]
         for i, l in enumerate(lens)], axis=0).astype(np.float32)
    dense = pos.reshape(-1, 3)[mask.reshape(-1)]
    np.testing.assert_allclose(exp, dense, atol=2e-6)


def test_decode_texels_runs_matches_pointwise(sphere_atlas):
    """Device expansion + decode == decode_texels on the same positions."""
    uvs, tex_idx, v, f = sphere_atlas
    res = 128
    pos, mask = native.rasterize_uv(uvs, tex_idx, v, f, res)
    _, runs = native.rasterize_uv_runs(uvs, tex_idx, v, f, res)
    dense_pts = pos.reshape(-1, 3)[mask.reshape(-1)]
    N = dense_pts.shape[0]

    acfg = ae.AEConfig()
    params = ae.init_autoencoder(jax.random.PRNGKey(0), acfg)
    feat = ae.encode(
        params, acfg,
        jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 4)) * 0.3)
    _, tex_planes = ae.process_planes(params, acfg, feat)
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)

    want = ae.decode_texels(params, acfg, tex_planes,
                            jnp.asarray(dense_pts), aabb)

    lens = runs[:, 6].astype(np.int64)
    Rp = 1 << (len(runs) - 1).bit_length()
    offsets = np.full(Rp + 1, N, np.int32)
    offsets[0] = 0
    offsets[1:len(lens) + 1] = np.cumsum(lens)
    starts = np.zeros((Rp, 3), np.float32)
    steps = np.zeros((Rp, 3), np.float32)
    starts[:len(runs)] = runs[:, :3]
    steps[:len(runs)] = runs[:, 3:6]

    batch = 1 << 13
    got = []
    for i in range(0, N, batch):
        got.append(np.asarray(ae.decode_texels_runs(
            params, acfg, tex_planes, jnp.asarray(offsets),
            jnp.asarray(starts), jnp.asarray(steps),
            jnp.asarray(i, jnp.int32), aabb, batch)))
    got = np.concatenate(got, axis=0)[:N]
    # positions agree to ~1e-6 of the AABB; u8 colors may flip by 1 LSB
    # where a texel sits exactly on a quantization boundary
    diff = np.abs(got.astype(np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_decode_texmesh_runs_wire_end_to_end(tmp_path, monkeypatch):
    """decode_texmesh with the runs wire (the default) produces the same
    texture as the f32 wire to within 1 u8 LSB."""
    from PIL import Image

    from sin3dm_tpu.core.triplane import Triplane
    from sin3dm_tpu.training.ae import AETrainer, AETrainerConfig

    import importlib

    bench = importlib.import_module("bench")
    acfg = ae.AEConfig()
    sizes = (16, 16, 16)
    # bench's quick-fit: geo head reads the radial ramp -> sphere surface
    params = bench._quick_fit_sphere_impl(acfg, sizes, n_steps=120)
    feat = bench.make_structured_triplane(jax.random.PRNGKey(2),
                                          acfg.feat_channels, sizes)

    def mk_trainer(d, wire):
        tr = AETrainer(str(d), acfg, AETrainerConfig(texel_wire=wire))
        tr.params = params
        tr.meta = {"aabb": [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0],
                   "threshold": 2.0 / 64 * 3, "featmap_size": list(sizes),
                   "Ka": [0, 0, 0], "Kd": [1, 1, 1],
                   "Ks": [0.4, 0.4, 0.4], "Ns": 10}
        return tr

    out = {}
    for wire in ("runs", "runs32", "f32"):
        d = tmp_path / wire
        tr = mk_trainer(d, wire)
        tr.decode_texmesh(str(d), feat, 32, n_faces=300, texture_reso=64,
                          save_voxel=False)
        png = d / "object.png"
        assert png.exists()
        out[wire] = np.asarray(Image.open(png)).astype(np.int32)

    # fp32 spans vs dense fp32 points: same math, <=1 LSB
    diff = np.abs(out["runs32"] - out["f32"])
    assert diff.max() <= 1, f"runs32 texture LSB diff {diff.max()}"
    # compact pack (u16 starts + f16 steps): the u16-point wire's
    # accepted snap applies at run starts only
    diffq = np.abs(out["runs"] - out["f32"])
    assert diffq.max() <= 3, f"compact runs texture diff {diffq.max()}"
    assert (diffq > 1).mean() < 0.01
