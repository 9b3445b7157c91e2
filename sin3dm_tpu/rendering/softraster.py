"""Software multi-view renderer — Blender-free fallback for evaluation.

Renders a textured OBJ with a z-buffered perspective rasterizer and
Lambertian shading, using the SAME 8 camera poses as the Blender protocol
(azimuth 0..315 step 45, elevation 45, d=3, 45mm focal on a 36mm sensor,
512x512 — `rendering/blender_render_multiview.py`).  Shading obviously
differs from Cycles, but SIFID/LPIPS compare generated vs reference
renders, so using one consistent renderer for both sides keeps the metrics
meaningful in environments without Blender.
"""

from __future__ import annotations

import math
import os
import warnings

import numpy as np

# Set to the failure once the native rasterizer proves unusable, so a
# broken .so is reported ONCE and never rebuilt/retried per view (a silent
# fall-through to the numpy path is a 10-100x slowdown).
_NATIVE_FAILED: Exception | None = None


def _look_at(eye: np.ndarray, target: np.ndarray, up=(0, 0, 1)):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0, 0])
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    # world -> camera (x right, y up, z backward)
    R = np.stack([right, true_up, -fwd])
    t = -R @ eye
    return R, t


def _normalize_mesh(verts: np.ndarray) -> np.ndarray:
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    center = (lo + hi) / 2
    half = (hi - lo).max() / 2 * 1.03
    return (verts - center) / half


def render_view(verts, faces, face_uvs, face_mat, materials, eye,
                res: int = 512, focal_mm: float = 45.0,
                light_dir=(0.3, 0.3, 0.9), use_native: bool = True
                ) -> np.ndarray:
    """-> RGBA uint8 [res, res, 4].

    `use_native=True` rasterizes through the C++ `geo_render_view` kernel
    (per-pixel face-id/UV/depth maps; texture gather + shading stay
    vectorized here) — same math as the numpy fallback below, which is
    kept as the parity oracle (`tests/test_softraster.py`) and for
    environments without the native lib."""
    R, t = _look_at(np.asarray(eye, np.float64), np.zeros(3))
    cam = verts @ R.T + t
    # perspective: 36mm sensor width -> f_pix = focal/36 * res
    f_pix = focal_mm / 36.0 * res
    z = -cam[:, 2]
    valid_z = np.maximum(z, 1e-6)
    px = cam[:, 0] / valid_z * f_pix + res / 2
    py = -cam[:, 1] / valid_z * f_pix + res / 2

    tri_n = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                     verts[faces[:, 2]] - verts[faces[:, 0]])
    nrm = tri_n / np.maximum(np.linalg.norm(tri_n, axis=-1, keepdims=True),
                             1e-12)
    ld = np.asarray(light_dir, np.float64)
    ld = ld / np.linalg.norm(ld)
    view_dir = np.asarray(eye) / np.linalg.norm(eye)
    # two-sided shading: ambient + diffuse from fixed light + headlight fill
    shade = (0.25 + 0.55 * np.abs(nrm @ ld) + 0.25 * np.abs(nrm @ view_dir))
    shade = np.clip(shade, 0.0, 1.0)

    order = np.argsort(-z[faces].mean(axis=1))
    # both paths read UVs at float32 precision (the native kernel takes
    # float32 in and writes float32 u/v), so parity is structural
    face_uvs = np.asarray(face_uvs, np.float32)

    global _NATIVE_FAILED
    if use_native and _NATIVE_FAILED is None:
        try:
            from ..geometry import native
            zbuf, face_id, u_map, v_map = native.render_view_raster(
                px, py, z, faces, order, face_uvs, res)
        except Exception as e:  # cache: don't re-run `make` per view
            _NATIVE_FAILED = e
            warnings.warn(
                f"native rasterizer unavailable ({e!r}); falling back to "
                "the ~10-100x slower numpy path for all renders",
                RuntimeWarning)
            face_id = None
        if face_id is not None:
            color = np.zeros((res, res, 3), np.float64)
            hit = face_id >= 0
            fid = face_id[hit]
            uu = np.mod(u_map[hit].astype(np.float64), 1.0)
            vv = np.mod(v_map[hit].astype(np.float64), 1.0)
            base = np.zeros((len(fid), 3), np.float64)
            mats = np.asarray(face_mat)[fid]
            for mi, mat in enumerate(materials):
                sel = mats == mi
                if not sel.any():
                    continue
                if mat.image is not None:
                    H, W = mat.image.shape[:2]
                    ix = np.clip((uu[sel] * W).astype(int), 0, W - 1)
                    iy = np.clip(((1 - vv[sel]) * H).astype(int), 0, H - 1)
                    base[sel] = mat.image[iy, ix, :3]
                else:
                    base[sel] = mat.Kd
            color[hit] = base * shade[fid][:, None]
            out = np.concatenate(
                [color, hit.astype(np.float64)[..., None]], axis=-1)
            return (np.clip(out, 0, 1) * 255).astype(np.uint8)

    zbuf = np.full((res, res), np.inf, np.float64)
    color = np.zeros((res, res, 3), np.float64)
    alpha = np.zeros((res, res), np.float64)

    # near-to-far not needed with zbuf; kept so native/numpy tie-break alike
    for fi in order:
        tri = faces[fi]
        if np.any(z[tri] <= 1e-6):
            continue
        xs, ys = px[tri], py[tri]
        xmin = max(int(np.floor(xs.min())), 0)
        xmax = min(int(np.ceil(xs.max())), res - 1)
        ymin = max(int(np.floor(ys.min())), 0)
        ymax = min(int(np.ceil(ys.max())), res - 1)
        if xmin > xmax or ymin > ymax:
            continue
        gx, gy = np.meshgrid(np.arange(xmin, xmax + 1),
                             np.arange(ymin, ymax + 1))
        d = ((xs[1] - xs[0]) * (ys[2] - ys[0])
             - (xs[2] - xs[0]) * (ys[1] - ys[0]))
        if abs(d) < 1e-12:
            continue
        w1 = ((gx - xs[0]) * (ys[2] - ys[0])
              - (xs[2] - xs[0]) * (gy - ys[0])) / d
        w2 = ((xs[1] - xs[0]) * (gy - ys[0])
              - (gx - xs[0]) * (ys[1] - ys[0])) / d
        w0 = 1.0 - w1 - w2
        cover = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not cover.any():
            continue
        # perspective-correct depth + uv — SAME op order as the native
        # kernel (q_i = w_i * (1/z_i), then sum) so parity is bit-exact
        q0 = w0 * (1.0 / z[tri[0]])
        q1 = w1 * (1.0 / z[tri[1]])
        q2 = w2 * (1.0 / z[tri[2]])
        depth = 1.0 / np.maximum(q0 + q1 + q2, 1e-12)
        closer = cover & (depth < zbuf[gy, gx])
        if not closer.any():
            continue
        uv = (face_uvs[fi][0].astype(np.float64)[None, None] * q0[..., None]
              + face_uvs[fi][1].astype(np.float64)[None, None] * q1[..., None]
              + face_uvs[fi][2].astype(np.float64)[None, None] * q2[..., None])
        # the native kernel stores u/v as float32; round here too
        uv = (uv * depth[..., None]).astype(np.float32).astype(np.float64)
        mat = materials[face_mat[fi]]
        if mat.image is not None:
            H, W = mat.image.shape[:2]
            u = np.mod(uv[..., 0], 1.0)
            vv = np.mod(uv[..., 1], 1.0)
            ix = np.clip((u * W).astype(int), 0, W - 1)
            iy = np.clip(((1 - vv) * H).astype(int), 0, H - 1)
            base = mat.image[iy, ix, :3]
        else:
            base = np.broadcast_to(mat.Kd, uv.shape[:2] + (3,))
        col = base * shade[fi]
        yy, xx = gy[closer], gx[closer]
        zbuf[yy, xx] = depth[closer]
        color[yy, xx] = col[closer]
        alpha[yy, xx] = 1.0

    out = np.concatenate([color, alpha[..., None]], axis=-1)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def render_multiview(obj_path: str, out_dir: str, res: int = 512,
                     d: float = 3.0) -> None:
    from ..geometry.meshproc import load_obj_scene
    from PIL import Image

    scene = load_obj_scene(obj_path)
    verts = _normalize_mesh(scene["verts"])
    os.makedirs(out_dir, exist_ok=True)
    views = [(az, 45) for az in range(0, 360, 45)]
    for i, (azimuth, elevation) in enumerate(views):
        phi = math.radians(azimuth)
        theta = math.radians(elevation)
        eye = np.array([d * math.sin(theta) * math.cos(phi),
                        d * math.sin(theta) * math.sin(phi),
                        d * math.cos(theta)])
        img = render_view(verts, scene["faces"], scene["face_uvs"],
                          scene["face_mat"], scene["materials"], eye,
                          res=res)
        Image.fromarray(img).save(os.path.join(out_dir, f"{i:03d}.png"))
