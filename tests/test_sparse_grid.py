"""Sparse near-surface grid wire format (`ops/sparse_grid.py`):
MC-exactness of the reconstruction vs the dense int8 transfer, sign
exactness everywhere, boundary-crossing coverage, overflow signalling,
and the wire-size win."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.ops import sparse_grid as sg


def _sphere_q(shape=(60, 52, 44), radius=0.55, thr=0.0234375):
    """Floor-quantized int8 clamped TSDF of a sphere (device wire
    convention: bucket k covers [k, k+1))."""
    axes = [np.linspace(-1, 1, s) for s in shape]
    x, y, z = np.meshgrid(*axes, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - radius
    v = np.clip(sdf, -thr, thr)
    q = np.clip(np.floor(v * 127.0 / thr), -128, 127).astype(np.int8)
    return q, thr


def _dense_deq(q, thr):
    return (q.astype(np.float32) + 0.5) * (thr / 127.0)


def _matter_mask(q):
    neg = q < 0
    m = np.zeros_like(neg)
    for ax in range(3):
        a = np.swapaxes(neg, 0, ax)
        c = a[1:] != a[:-1]
        mm = np.zeros_like(a)
        mm[:-1] |= c
        mm[1:] |= c
        m |= np.swapaxes(mm, 0, ax)
    return m


def test_roundtrip_exact_where_it_matters():
    q, thr = _sphere_q()
    enc = jax.jit(lambda x: tuple(sg.encode(x))[:4])
    signs, ids, vals, count = enc(jnp.asarray(q))
    P = tuple(-(-s // sg.BLOCK) * sg.BLOCK for s in q.shape)
    spg = sg.SparseGrid(signs, ids, vals, count, q.shape, P)
    assert int(count) <= ids.shape[0], "sphere shell must fit the budget"

    rec = sg.decode_host(spg, thr)
    dense = _dense_deq(q, thr)
    # signs identical EVERYWHERE (voxel.npz occupancy contract)
    np.testing.assert_array_equal(rec < 0, dense < 0)
    # values identical at every voxel MC can read
    m = _matter_mask(q)
    np.testing.assert_array_equal(rec[m], dense[m])
    # wire is materially smaller than the dense int8 grid
    assert sg.wire_bytes(spg) < 0.5 * q.size


def test_marching_cubes_bit_identical():
    from sin3dm_tpu.geometry import meshproc

    q, thr = _sphere_q((40, 36, 36))
    enc = jax.jit(lambda x: tuple(sg.encode(x))[:4])
    signs, ids, vals, count = enc(jnp.asarray(q))
    P = tuple(-(-s // sg.BLOCK) * sg.BLOCK for s in q.shape)
    spg = sg.SparseGrid(signs, ids, vals, count, q.shape, P)
    rec = sg.decode_host(spg, thr)
    dense = _dense_deq(q, thr)

    v1, f1 = meshproc.sdfgrid_to_mesh(dense)
    v2, f2 = meshproc.sdfgrid_to_mesh(rec)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(v1, v2)


def test_negative_boundary_voxels_covered():
    """A shape clipped by the volume boundary: the +1.0 MC pad crosses
    against negative boundary voxels, so their values must ship."""
    from sin3dm_tpu.geometry import meshproc

    q, thr = _sphere_q((24, 24, 24), radius=1.4)  # sphere covers volume
    assert (q[0] < 0).any()
    # clipped shapes flag many boundary blocks — give the encoder full
    # capacity here (the production default would signal dense fallback,
    # covered by test_overflow_signals_fallback)
    enc = jax.jit(lambda x: tuple(sg.encode(x, capacity=216))[:4])
    signs, ids, vals, count = enc(jnp.asarray(q))
    assert int(count) <= 216
    P = tuple(-(-s // sg.BLOCK) * sg.BLOCK for s in q.shape)
    spg = sg.SparseGrid(signs, ids, vals, count, q.shape, P)
    rec = sg.decode_host(spg, thr)
    dense = _dense_deq(q, thr)
    v1, f1 = meshproc.sdfgrid_to_mesh(dense)
    v2, f2 = meshproc.sdfgrid_to_mesh(rec)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


def _encode_np(q, capacity=None):
    enc = jax.jit(lambda x: tuple(sg.encode(x, capacity=capacity))[:4])
    signs, ids, vals, count = enc(jnp.asarray(q))
    P = tuple(-(-s // sg.BLOCK) * sg.BLOCK for s in q.shape)
    return sg.SparseGrid(signs, ids, vals, count, q.shape, P)


@pytest.mark.parametrize("shape", [(60, 52, 44), (40, 36, 36), (17, 23, 9)])
def test_sparse_mc_bit_identical(shape):
    """Wire-direct marching cubes (geo_marching_cubes_sparse) produces
    bit-identical verts/tris — including order — to the dense decode +
    pad + MC path, so every downstream stage is path-invariant."""
    from sin3dm_tpu.geometry import meshproc

    q, thr = _sphere_q(shape)
    spg = _encode_np(q, capacity=int(np.prod(
        [(-(-s // sg.BLOCK)) for s in shape])))
    assert int(spg.count) <= spg.block_ids.shape[0]

    v1, f1 = meshproc.sdfgrid_to_mesh(sg.decode_host(spg, thr))
    v2, f2 = meshproc.sdfgrid_to_mesh_sparse(spg, thr)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


def test_sparse_mc_boundary_clipped_shape():
    """Sphere clipped by the volume boundary: border crossings against
    the virtual +1.0 pad layer must come out identical too."""
    from sin3dm_tpu.geometry import meshproc

    q, thr = _sphere_q((24, 24, 24), radius=1.4)
    assert (q[0] < 0).any()
    spg = _encode_np(q, capacity=216)
    v1, f1 = meshproc.sdfgrid_to_mesh(sg.decode_host(spg, thr))
    v2, f2 = meshproc.sdfgrid_to_mesh_sparse(spg, thr)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


def test_sparse_mc_empty_and_overflow():
    from sin3dm_tpu.geometry import meshproc

    # all-positive grid: no surface, no flagged blocks
    q = np.full((16, 16, 16), 100, np.int8)
    spg = _encode_np(q)
    v, f = meshproc.sdfgrid_to_mesh_sparse(spg, 0.05)
    assert len(f) == 0

    # overflowed budget: the wrapper must refuse (reconstruction is
    # impossible), not read out of bounds
    rng = np.random.default_rng(0)
    q = rng.integers(-128, 128, (32, 32, 32)).astype(np.int8)
    spg = _encode_np(q)
    assert int(spg.count) > spg.block_ids.shape[0]
    with pytest.raises(ValueError, match="overflow"):
        meshproc.sdfgrid_to_mesh_sparse(spg, 0.05)


def test_occupancy_host_matches_dense():
    q, thr = _sphere_q((30, 26, 22))
    spg = _encode_np(q, capacity=512)
    np.testing.assert_array_equal(sg.occupancy_host(spg),
                                  _dense_deq(q, thr) < 0)


def test_overflow_signals_fallback():
    """Random-sign noise floods the block budget: count must exceed
    capacity so the caller takes the dense fallback."""
    rng = np.random.default_rng(0)
    q = rng.integers(-128, 128, (32, 32, 32)).astype(np.int8)
    enc = jax.jit(lambda x: tuple(sg.encode(x))[:4])
    signs, ids, vals, count = enc(jnp.asarray(q))
    assert int(count) > ids.shape[0]


@pytest.mark.parametrize("shape", [(17, 23, 9), (16, 16, 16)])
def test_odd_shapes_pad_and_slice(shape):
    q, thr = _sphere_q(shape)
    # low-reso grids have proportionally thick shells; these cases test
    # padding/slicing, not the budget, so give full capacity
    enc = jax.jit(lambda x: tuple(sg.encode(x, capacity=512))[:4])
    signs, ids, vals, count = enc(jnp.asarray(q))
    assert int(count) <= 512
    P = tuple(-(-s // sg.BLOCK) * sg.BLOCK for s in q.shape)
    spg = sg.SparseGrid(signs, ids, vals, count, shape, P)
    rec = sg.decode_host(spg, thr)
    assert rec.shape == shape
    dense = _dense_deq(q, thr)
    np.testing.assert_array_equal(rec < 0, dense < 0)
    m = _matter_mask(q)
    np.testing.assert_array_equal(rec[m], dense[m])


@pytest.mark.slow
def test_decode_texmesh_sparse_vs_dense_identical(tmp_path, monkeypatch):
    """Pipeline glue: decode_texmesh through _dispatch_geo_grid with the
    sparse wire ON vs OFF writes byte-identical object.obj + voxel.npz,
    and the sphere at reso 64 actually FITS the block budget (so the
    sparse path, not the fallback, is what ran)."""
    import os

    from sin3dm_tpu.training import ae as ae_train
    from test_ae import _cfg, _make_sphere_npz

    npz = str(tmp_path / "sphere.npz")
    _make_sphere_npz(npz)
    acfg = _cfg()
    tcfg = ae_train.AETrainerConfig(enc_batch_size=2048, enc_n_iters=200,
                                    enc_lr=5e-3, fm_reso=16)
    trainer = ae_train.AETrainer(str(tmp_path / "log"), acfg, tcfg)
    trainer.load_data(npz)
    trainer.train(jax.random.PRNGKey(0), log_every=200)
    feat = trainer.encode()

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("SIN3DM_SPARSE_GRID", mode)
        trainer._sparse_jit = None
        d = str(tmp_path / f"rec{mode}")
        trainer.decode_texmesh(d, feat, reso=64, n_faces=500,
                               texture_reso=128)
        outs[mode] = d

    # the sparse path must actually have run (budget fits the sphere)
    monkeypatch.setenv("SIN3DM_SPARSE_GRID", "1")
    trainer._sparse_jit = None
    aabb = trainer._resize_aabb(tuple(trainer.meta["featmap_size"]))
    _, _, spg = trainer._dispatch_geo_grid(
        jax.tree_util.tree_map(lambda a: a[None] if a.ndim == 3 else a,
                               feat), 64, aabb)
    assert spg is not None
    assert int(spg.count) <= spg.block_ids.shape[0]

    v0 = np.load(os.path.join(outs["0"], "voxel.npz"))["vox_grid"]
    v1 = np.load(os.path.join(outs["1"], "voxel.npz"))["vox_grid"]
    np.testing.assert_array_equal(v0, v1)
    o0 = open(os.path.join(outs["0"], "object.obj"), "rb").read()
    o1 = open(os.path.join(outs["1"], "object.obj"), "rb").read()
    assert o0 == o1
