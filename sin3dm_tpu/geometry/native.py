"""ctypes bindings for the first-party C++ geometry library.

Builds `cpp/libsin3dm_geometry.so` on first use if missing (g++ is part of
the baked toolchain).  All functions operate on contiguous float32/int32
numpy arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_SO_PATH = os.path.join(_CPP_DIR, "libsin3dm_geometry.so")

_lib: Optional[ctypes.CDLL] = None

c_float_p = ctypes.POINTER(ctypes.c_float)
c_int_p = ctypes.POINTER(ctypes.c_int)
c_ubyte_p = ctypes.POINTER(ctypes.c_ubyte)


def _build() -> None:
    subprocess.run(["make", "-C", _CPP_DIR], check=True,
                   capture_output=True)


def _stale() -> bool:
    """True when the .so is missing or older than its source — a stale
    binary with a changed C ABI would be called with mismatched argtypes
    (segfault/heap corruption), so rebuild on source changes."""
    if not os.path.exists(_SO_PATH):
        return True
    src = os.path.join(_CPP_DIR, "geometry.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
    except OSError:
        return False


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        _build()
    L = ctypes.CDLL(_SO_PATH)

    L.geo_free.argtypes = [ctypes.c_void_p]
    L.geo_marching_cubes.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(c_float_p), c_int_p, ctypes.POINTER(c_int_p), c_int_p]
    L.geo_marching_cubes.restype = ctypes.c_int
    L.geo_marching_cubes_sparse.argtypes = [
        c_ubyte_p, c_int_p, ctypes.POINTER(ctypes.c_byte),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(c_float_p), c_int_p, ctypes.POINTER(c_int_p), c_int_p]
    L.geo_marching_cubes_sparse.restype = ctypes.c_int
    L.geo_connected_components.argtypes = [c_int_p, ctypes.c_int,
                                           ctypes.c_int, c_int_p]
    L.geo_connected_components.restype = ctypes.c_int
    L.geo_decimate.argtypes = [
        c_float_p, ctypes.c_int, c_int_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(c_float_p), c_int_p, ctypes.POINTER(c_int_p), c_int_p]
    L.geo_decimate.restype = ctypes.c_int
    L.geo_bvh_build.argtypes = [c_float_p, ctypes.c_int, c_int_p,
                                ctypes.c_int]
    L.geo_bvh_build.restype = ctypes.c_void_p
    L.geo_bvh_destroy.argtypes = [ctypes.c_void_p]
    L.geo_bvh_closest.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int,
                                  c_float_p, c_int_p, c_float_p]
    L.geo_bvh_winding.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int,
                                  c_float_p]
    L.geo_bvh_signed_distance.argtypes = [ctypes.c_void_p, c_float_p,
                                          ctypes.c_int, c_float_p, c_int_p,
                                          c_float_p]
    L.geo_rasterize_uv.argtypes = [c_float_p, ctypes.c_int, c_int_p,
                                   c_float_p, c_int_p, ctypes.c_int,
                                   ctypes.c_int, c_float_p, c_ubyte_p]
    L.geo_rasterize_uv_runs.argtypes = [c_float_p, ctypes.c_int, c_int_p,
                                        c_float_p, c_int_p, ctypes.c_int,
                                        ctypes.c_int, c_ubyte_p,
                                        ctypes.POINTER(c_float_p)]
    L.geo_rasterize_uv_runs.restype = ctypes.c_longlong
    L.geo_mask_compact_q16.argtypes = [
        c_float_p, c_ubyte_p, ctypes.c_longlong, c_float_p, c_float_p,
        ctypes.POINTER(ctypes.c_ushort)]
    L.geo_mask_compact_q16.restype = ctypes.c_longlong
    L.geo_tex_assemble.argtypes = [c_ubyte_p, c_ubyte_p, ctypes.c_int,
                                   ctypes.c_int, c_ubyte_p]
    L.geo_tex_assemble.restype = ctypes.c_longlong
    L.geo_charts_by_axis.argtypes = [c_float_p, c_int_p, ctypes.c_int,
                                     c_int_p, c_int_p]
    L.geo_oriented_rect_angles.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    c_double_p = ctypes.POINTER(ctypes.c_double)
    L.geo_render_view.argtypes = [
        c_double_p, c_double_p, c_double_p, ctypes.c_int, c_int_p, c_int_p,
        ctypes.c_int, c_float_p, ctypes.c_int, c_double_p, c_int_p,
        c_float_p, c_float_p]
    _lib = L
    return L


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _take_floats(ptr, n: int) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib().geo_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr


def _take_ints(ptr, n: int) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib().geo_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr


def marching_cubes(grid: np.ndarray,
                   iso: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Extract isosurface; vertices in index space (PyMCubes convention,
    used by `utils3d.py:196-213`)."""
    g = _f32(grid)
    nx, ny, nz = g.shape
    vp = c_float_p()
    tp = c_int_p()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib().geo_marching_cubes(
        g.ctypes.data_as(c_float_p), nx, ny, nz, iso,
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
        ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError("marching_cubes failed")
    v = _take_floats(vp, nv.value * 3).reshape(-1, 3).astype(np.float64)
    f = _take_ints(tp, nt.value * 3).reshape(-1, 3).astype(np.int64)
    return v, f


def marching_cubes_sparse(signs: np.ndarray, block_ids: np.ndarray,
                          block_vals: np.ndarray, count: int,
                          shape: Tuple[int, int, int],
                          padded: Tuple[int, int, int],
                          quant: float) -> Tuple[np.ndarray, np.ndarray]:
    """Iso-0 surface straight from the sparse near-surface wire format
    (`ops/sparse_grid.SparseGrid`) — skips the dense fp32 grid rebuild and
    the one-layer pad copy entirely.  Bit-identical verts/tris to
    `marching_cubes(pad(decode_host(sg), 1, 1.0), 0.0)`; vertices are in
    the PADDED (virtual) index space, i.e. callers subtract 1 exactly as
    `sdfgrid_to_mesh` does after the dense call."""
    if int(count) > len(np.asarray(block_ids).reshape(-1)):
        # overflowed block budget: flagged blocks beyond capacity were
        # dropped by the encoder — reconstruction is impossible; callers
        # must fall back to the dense grid (ops/sparse_grid.py contract)
        raise ValueError(
            f"sparse grid overflow: {int(count)} flagged blocks > "
            f"capacity {len(np.asarray(block_ids).reshape(-1))}")
    s = np.ascontiguousarray(signs, dtype=np.uint8)
    ids = _i32(block_ids)
    vals = np.ascontiguousarray(block_vals, dtype=np.int8)
    X, Y, Z = (int(x) for x in shape)
    PX, PY, PZ = (int(x) for x in padded)
    # float32(quant/127) so the C-side (q+0.5)*dq product reproduces
    # decode_host's numpy float32 arithmetic bit-for-bit
    dq = np.float32(float(quant) / 127.0)
    vp = c_float_p()
    tp = c_int_p()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib().geo_marching_cubes_sparse(
        s.ctypes.data_as(c_ubyte_p), ids.ctypes.data_as(c_int_p),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_byte)), int(count),
        X, Y, Z, PX, PY, PZ, float(dq),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
        ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError("marching_cubes_sparse failed")
    v = _take_floats(vp, nv.value * 3).reshape(-1, 3).astype(np.float64)
    f = _take_ints(tp, nt.value * 3).reshape(-1, 3).astype(np.int64)
    return v, f


def face_components(faces: np.ndarray, n_verts: int
                    ) -> Tuple[np.ndarray, int]:
    f = _i32(faces).reshape(-1)
    out = np.empty(len(f) // 3, dtype=np.int32)
    n = lib().geo_connected_components(
        f.ctypes.data_as(c_int_p), len(f) // 3, n_verts,
        out.ctypes.data_as(c_int_p))
    return out, int(n)


def decimate(verts: np.ndarray, faces: np.ndarray,
             target_faces: int,
             prepass_mult: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse to ~target_faces (open3d
    simplify_quadric_decimation replacement, `utils3d.py:216-221`).

    prepass_mult: vertex-clustering pre-pass keeps ~prepass_mult x
    target_faces triangles for the quadric stage (<=0 disables)."""
    v = _f32(verts).reshape(-1)
    f = _i32(faces).reshape(-1)
    vp = c_float_p()
    tp = c_int_p()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib().geo_decimate(
        v.ctypes.data_as(c_float_p), len(v) // 3,
        f.ctypes.data_as(c_int_p), len(f) // 3, int(target_faces),
        int(prepass_mult),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
        ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError("decimate failed")
    vo = _take_floats(vp, nv.value * 3).reshape(-1, 3).astype(np.float64)
    fo = _take_ints(tp, nt.value * 3).reshape(-1, 3).astype(np.int64)
    return vo, fo


class MeshBVH:
    """Closest-point + fast-winding-number queries on a triangle mesh
    (point_cloud_utils replacement for `signed_distance_to_mesh` /
    `closest_points_on_mesh`, `data/mesh_sampler.py:104-119`)."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        self._v = _f32(verts).reshape(-1, 3)
        self._f = _i32(faces).reshape(-1, 3)
        self._h = lib().geo_bvh_build(
            self._v.ctypes.data_as(c_float_p), len(self._v),
            self._f.ctypes.data_as(c_int_p), len(self._f))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                lib().geo_bvh_destroy(self._h)
        except Exception:
            pass

    def closest(self, pts: np.ndarray):
        """-> (dist [N], face [N], bary [N,3])"""
        p = _f32(pts).reshape(-1, 3)
        n = len(p)
        dist = np.empty(n, np.float32)
        face = np.empty(n, np.int32)
        bary = np.empty((n, 3), np.float32)
        lib().geo_bvh_closest(self._h, p.ctypes.data_as(c_float_p), n,
                              dist.ctypes.data_as(c_float_p),
                              face.ctypes.data_as(c_int_p),
                              bary.ctypes.data_as(c_float_p))
        return dist, face, bary

    def winding(self, pts: np.ndarray) -> np.ndarray:
        p = _f32(pts).reshape(-1, 3)
        n = len(p)
        w = np.empty(n, np.float32)
        lib().geo_bvh_winding(self._h, p.ctypes.data_as(c_float_p), n,
                              w.ctypes.data_as(c_float_p))
        return w

    def signed_distance(self, pts: np.ndarray):
        """-> (sdf [N] negative inside, face [N], bary [N,3])"""
        p = _f32(pts).reshape(-1, 3)
        n = len(p)
        sdf = np.empty(n, np.float32)
        face = np.empty(n, np.int32)
        bary = np.empty((n, 3), np.float32)
        lib().geo_bvh_signed_distance(self._h, p.ctypes.data_as(c_float_p),
                                      n, sdf.ctypes.data_as(c_float_p),
                                      face.ctypes.data_as(c_int_p),
                                      bary.ctypes.data_as(c_float_p))
        return sdf, face, bary


def rasterize_uv(uvs: np.ndarray, tri_uv: np.ndarray, verts: np.ndarray,
                 tri_pos: np.ndarray, res: int):
    """Rasterize mesh triangles in UV space -> per-texel 3D position + mask
    (nvdiffrast replacement for the texture bake, `utils3d.py:228-251`).

    Returns (pos [res,res,3], mask [res,res] bool); row r covers
    v=(r+0.5)/res (no flip applied here).
    """
    u = _f32(uvs).reshape(-1, 2)
    tu = _i32(tri_uv).reshape(-1)
    v = _f32(verts).reshape(-1)
    tpv = _i32(tri_pos).reshape(-1)
    nt = len(tu) // 3
    pos = np.zeros((res, res, 3), np.float32)
    mask = np.zeros((res, res), np.uint8)
    lib().geo_rasterize_uv(
        u.ctypes.data_as(c_float_p), len(u), tu.ctypes.data_as(c_int_p),
        v.ctypes.data_as(c_float_p), tpv.ctypes.data_as(c_int_p), nt, res,
        pos.ctypes.data_as(c_float_p), mask.ctypes.data_as(c_ubyte_p))
    return pos, mask.astype(bool)


def rasterize_uv_runs(uvs: np.ndarray, tri_uv: np.ndarray, verts: np.ndarray,
                      tri_pos: np.ndarray, res: int):
    """Rasterize in UV space -> coverage mask + per-row position SPANS.

    Same coverage as :func:`rasterize_uv`, but positions come back as
    runs [R, 7] float32 (start xyz, per-column step xyz, length), sorted
    and trimmed so expanding them in order reproduces the row-major
    masked texel stream exactly (the order `geo_tex_assemble` consumes).
    This is the texture bake's compact host->device wire: ~28 B per run
    instead of 6 B per texel (training/ae.py `_dispatch_texels_runs`).

    Returns (mask [res,res] bool, runs [R,7] float32).
    """
    u = _f32(uvs).reshape(-1, 2)
    tu = _i32(tri_uv).reshape(-1)
    v = _f32(verts).reshape(-1)
    tpv = _i32(tri_pos).reshape(-1)
    nt = len(tu) // 3
    mask = np.zeros((res, res), np.uint8)
    out_runs = c_float_p()
    n = lib().geo_rasterize_uv_runs(
        u.ctypes.data_as(c_float_p), len(u), tu.ctypes.data_as(c_int_p),
        v.ctypes.data_as(c_float_p), tpv.ctypes.data_as(c_int_p), nt, res,
        mask.ctypes.data_as(c_ubyte_p), ctypes.byref(out_runs))
    if n < 0:
        raise MemoryError("geo_rasterize_uv_runs allocation failed")
    runs = _take_floats(out_runs, int(n) * 7).reshape(-1, 7)
    return mask.astype(bool), runs


def mask_compact_q16(pos: np.ndarray, mask: np.ndarray, lo: np.ndarray,
                     span: np.ndarray) -> np.ndarray:
    """Masked compaction + uint16 AABB quantization in one C++ pass.

    Equivalent to `np.clip(np.rint((pos[mask] - lo) / span * 65535.0),
    0.0, 65535.0).astype(np.uint16)` (bit-identical: float32 math in the
    same operation order, rint = round half to even) without the two
    numpy passes over the 2048^2 position buffer — the texel-wire prep
    for `training/ae.py _dispatch_texels`.

    Args: pos [N, 3] float32, mask [N] bool/uint8, lo/span [3] float32.
    Returns: [count, 3] uint16 in row-major scan order.
    """
    p = _f32(pos).reshape(-1, 3)
    m = np.ascontiguousarray(mask, np.uint8).reshape(-1)
    assert p.shape[0] == m.shape[0], (p.shape, m.shape)
    lo = _f32(lo).reshape(3)
    span = _f32(span).reshape(3)
    out = np.empty((int(m.sum()), 3), np.uint16)
    n = lib().geo_mask_compact_q16(
        p.ctypes.data_as(c_float_p), m.ctypes.data_as(c_ubyte_p),
        p.shape[0], lo.ctypes.data_as(c_float_p),
        span.ctypes.data_as(c_float_p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort)))
    assert n == out.shape[0], (n, out.shape)
    return out


def tex_assemble(preds: np.ndarray, mask: np.ndarray, reso: int
                 ) -> np.ndarray:
    """Scatter decoded texel colors + 3x3 seam dilation + vertical flip
    in one pass (the texture bake tail, `model.py:426-429`).

    Exactly equivalent to:
        img = zeros((R, R, C), u8); img[mask] = preds
        out = where(mask, img, cv2.dilate(img, ones(3,3)))[::-1]
    (cv2.dilate's default border never contributes to the max.)

    Args: preds [N, C] uint8 (N = mask.sum()), mask [R, R] bool/uint8.
    Returns: [R, R, C] uint8, already flipped (row 0 = top, v = 1).
    """
    preds = np.ascontiguousarray(preds, np.uint8)
    m = np.ascontiguousarray(mask, np.uint8).reshape(-1)
    C = preds.shape[-1]
    assert m.shape[0] == reso * reso, (m.shape, reso)
    out = np.empty((reso, reso, C), np.uint8)
    n = lib().geo_tex_assemble(
        preds.ctypes.data_as(c_ubyte_p), m.ctypes.data_as(c_ubyte_p),
        reso, C, out.ctypes.data_as(c_ubyte_p))
    assert n == preds.shape[0], (n, preds.shape)
    return out


def charts_by_axis(verts: np.ndarray, tris: np.ndarray):
    """Normal-axis chart segmentation (uvatlas helper): per-face union-find
    root (within 6-way normal bins over shared edges) and the bin id.
    Same union order as the original Python implementation."""
    v = _f32(verts).reshape(-1)
    f = _i32(tris).reshape(-1)
    nt = len(f) // 3
    root = np.empty(nt, np.int32)
    bins = np.empty(nt, np.int32)
    lib().geo_charts_by_axis(
        v.ctypes.data_as(c_float_p), f.ctypes.data_as(c_int_p), nt,
        root.ctypes.data_as(c_int_p), bins.ctypes.data_as(c_int_p))
    return root, bins


def oriented_rect_angles(uv_list) -> np.ndarray:
    """Batched minimal-area oriented-bounding-rect angles: one rotation
    angle in [0, pi/2) per 2D point set (rotating calipers over the convex
    hull; point sets of <= 8 use the raw point cycle like the Python
    original)."""
    n = len(uv_list)
    if n == 0:
        return np.zeros(0, np.float64)
    offsets = np.zeros(n + 1, np.int64)
    for i, uv in enumerate(uv_list):
        offsets[i + 1] = offsets[i] + len(uv)
    cat = (np.concatenate([np.ascontiguousarray(u, np.float64).reshape(-1, 2)
                           for u in uv_list], axis=0)
           if offsets[-1] else np.zeros((0, 2)))
    cat = np.ascontiguousarray(cat, np.float64)
    out = np.empty(n, np.float64)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    ll_p = ctypes.POINTER(ctypes.c_longlong)
    lib().geo_oriented_rect_angles(
        cat.ctypes.data_as(dbl_p), offsets.ctypes.data_as(ll_p), n,
        out.ctypes.data_as(dbl_p))
    return out


def render_view_raster(px: np.ndarray, py: np.ndarray, z: np.ndarray,
                       faces: np.ndarray, order: np.ndarray,
                       face_uvs: np.ndarray, res: int):
    """Z-buffered perspective rasterization for the software multi-view
    renderer (`rendering/softraster.py` semantics, operation-for-operation):
    projected verts + paint order in, per-pixel (zbuf, face_id, u, v) maps
    out (face_id = -1 where empty).  Texture gather + shading stay in
    numpy — they vectorize over the face-id map."""
    pxa = np.ascontiguousarray(px, np.float64)
    pya = np.ascontiguousarray(py, np.float64)
    za = np.ascontiguousarray(z, np.float64)
    f = _i32(faces).reshape(-1)
    o = _i32(order).reshape(-1)
    uv = _f32(face_uvs).reshape(-1)
    nt = len(f) // 3
    zbuf = np.full((res, res), np.inf, np.float64)
    face_id = np.full((res, res), -1, np.int32)
    u = np.zeros((res, res), np.float32)
    v = np.zeros((res, res), np.float32)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib().geo_render_view(
        pxa.ctypes.data_as(dbl_p), pya.ctypes.data_as(dbl_p),
        za.ctypes.data_as(dbl_p), len(pxa), f.ctypes.data_as(c_int_p),
        o.ctypes.data_as(c_int_p), nt, uv.ctypes.data_as(c_float_p), res,
        zbuf.ctypes.data_as(dbl_p), face_id.ctypes.data_as(c_int_p),
        u.ctypes.data_as(c_float_p), v.ctypes.data_as(c_float_p))
    return zbuf, face_id, u, v
