"""Mesh -> training-data sampler CLI.

Produces the exact npz schema consumed by the autoencoder
(`/root/reference/data/mesh_sampler.py:218-222`): keys
`pts_grid, sdf_grid, tex_grid, pts_on_surf, tex_on_surf, pts_near_surf,
sdf_near_surf, tex_near_surf, aabb, threshold, Ka, Kd, Ks, Ns`.

The native stack replaces the reference's dependencies: first-party OBJ
loader (trimesh), BVH fast-winding SDF + closest-point queries
(point_cloud_utils), winding-number watertight remesh (pcu
make_mesh_watertight).  Texture lookup improves on the reference: material
ids come from the hit FACE directly instead of interpolated per-vertex
float ids (`mesh_sampler.py:110-113`'s acknowledged hack).

Usage: python -m sin3dm_tpu.dataio.mesh_sampler -s model.obj -d out.npz
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np

from ..geometry import meshproc, native
from .grid import normalize_aabb, sample_grid_points_aabb


def sample_texture_bilinear(image: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """OBJ-convention UV lookup (v=0 at image bottom), bilinear, wrap."""
    H, W = image.shape[:2]
    u = np.mod(uv[:, 0], 1.0) * W - 0.5
    v = (1.0 - np.mod(uv[:, 1], 1.0)) * H - 0.5
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    u0w, u1w = u0 % W, (u0 + 1) % W
    v0w, v1w = np.clip(v0, 0, H - 1), np.clip(v0 + 1, 0, H - 1)
    c00 = image[v0w, u0w]
    c01 = image[v0w, u1w]
    c10 = image[v1w, u0w]
    c11 = image[v1w, u1w]
    top = c00 * (1 - fu) + c01 * fu
    bot = c10 * (1 - fu) + c11 * fu
    return top * (1 - fv) + bot * fv


class MeshSampler:
    """SDF + texture sampling for a single textured mesh."""

    def __init__(self, path: str):
        self.path = path
        scene = meshproc.load_obj_scene(path)
        self.verts = scene["verts"]
        self.faces = scene["faces"]
        self.face_uvs = scene["face_uvs"]       # [F, 3, 2]
        self.face_mat = scene["face_mat"]       # [F]
        self.materials = scene["materials"]
        self.v_watertight: Optional[np.ndarray] = None
        self.f_watertight: Optional[np.ndarray] = None
        self._bvh_orig: Optional[native.MeshBVH] = None
        self._bvh_wt: Optional[native.MeshBVH] = None

    # material params of the first material (schema parity)
    @property
    def Ka(self):
        return self.materials[0].Ka

    @property
    def Kd(self):
        return self.materials[0].Kd

    @property
    def Ks(self):
        return self.materials[0].Ks

    @property
    def Ns(self):
        return self.materials[0].Ns

    def make_watertight_copy(self, resolution: int = 100_000,
                             is_watertight: bool = False) -> None:
        if is_watertight:
            print("Watertight mesh, skipping...")
            self.v_watertight = self.verts
            self.f_watertight = self.faces
            return
        cache = self.path.replace(".obj", f"_watertight_r{resolution}.obj")
        if os.path.exists(cache):
            print("Watertight mesh exists, loading...")
            scene = meshproc.load_obj_scene(cache)
            self.v_watertight = scene["verts"]
            self.f_watertight = scene["faces"]
            return
        t0 = time.time()
        self.v_watertight, self.f_watertight = meshproc.make_mesh_watertight(
            self.verts, self.faces, resolution=resolution)
        try:
            from ..geometry.meshio import save_mesh_vf
            save_mesh_vf(cache, self.v_watertight, self.f_watertight)
        except OSError:
            pass
        print("make_watertight_copy time:", time.time() - t0)

    def normalize(self, reso: int = 256, enlarge_scale: float = 1.03,
                  mult: int = 8) -> None:
        self.aabb, translation, scale = normalize_aabb(
            self.verts, reso=reso, enlarge_scale=enlarge_scale, mult=mult)
        self.verts = (self.verts + translation) * scale
        self.v_watertight = (self.v_watertight + translation) * scale
        self._bvh_orig = None
        self._bvh_wt = None

    def _wt_bvh(self) -> native.MeshBVH:
        if self._bvh_wt is None:
            self._bvh_wt = native.MeshBVH(
                self.v_watertight.astype(np.float32),
                self.f_watertight.astype(np.int32))
        return self._bvh_wt

    def _orig_bvh(self) -> native.MeshBVH:
        if self._bvh_orig is None:
            self._bvh_orig = native.MeshBVH(self.verts.astype(np.float32),
                                            self.faces.astype(np.int32))
        return self._bvh_orig

    def sample_watertight_surf(self, n: int = 1_000_000,
                               rng=None) -> np.ndarray:
        fi, bc = meshproc.sample_mesh_random(self.v_watertight,
                                             self.f_watertight, n, rng=rng)
        return meshproc.interpolate_barycentric(self.f_watertight, fi, bc,
                                                self.v_watertight)

    def query_sdf(self, points: np.ndarray) -> np.ndarray:
        sdf, _, _ = self._wt_bvh().signed_distance(points)
        return sdf.astype(np.float64)

    def query_tex(self, points: np.ndarray) -> np.ndarray:
        """RGBA at the closest surface point of the ORIGINAL mesh."""
        _, fi, bary = self._orig_bvh().closest(points)
        uv = (self.face_uvs[fi] * bary[..., None]).sum(axis=1)
        mat = self.face_mat[fi]
        colors = np.zeros((len(points), 4))
        for mid in np.unique(mat):
            m = mat == mid
            material = self.materials[mid]
            if material.image is None:
                colors[m, :3] = material.Kd
                colors[m, 3] = 1.0
            else:
                colors[m] = sample_texture_bilinear(material.image, uv[m])
        return colors


def run(src: str, dst: str, reso: int = 256,
        watertight_reso: int = 100_000, n_surf: int = 2_000_000,
        mult: int = 8, threshold: Optional[float] = None,
        enlarge_scale: float = 1.03, watertight: bool = False,
        only_vol: bool = False, seed: int = 0) -> None:
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    if threshold is None:
        threshold = 2.0 / reso * 3
    print("threshold:", threshold)

    rng = np.random.default_rng(seed)
    mesh = MeshSampler(src)
    mesh.make_watertight_copy(resolution=watertight_reso,
                              is_watertight=watertight)
    mesh.normalize(reso=reso, enlarge_scale=enlarge_scale, mult=mult)

    vol_pts = sample_grid_points_aabb(mesh.aabb, reso)
    vol_shape = vol_pts.shape[:3]

    vol_sdf = mesh.query_sdf(vol_pts.reshape(-1, 3))
    mask = np.abs(vol_sdf) < threshold
    vol_sdf = np.clip(vol_sdf, -threshold, threshold)

    vol_tex = np.zeros((vol_sdf.shape[0], 3))
    if mask.any():
        vol_tex[mask] = mesh.query_tex(
            vol_pts.reshape(-1, 3)[mask])[..., :3]

    vol_sdf = vol_sdf.reshape(vol_shape)
    vol_tex = vol_tex.reshape(vol_shape + (3,))
    print("vol_pts:", vol_pts.shape, "vol_sdf:", vol_sdf.shape)

    common = dict(aabb=mesh.aabb, threshold=threshold, Ka=mesh.Ka,
                  Kd=mesh.Kd, Ks=mesh.Ks, Ns=mesh.Ns)
    if only_vol:
        np.savez_compressed(dst, pts_grid=vol_pts, sdf_grid=vol_sdf,
                            tex_grid=vol_tex, **common)
        return

    on_surf_pts = mesh.sample_watertight_surf(n=n_surf, rng=rng)
    on_surf_tex = mesh.query_tex(on_surf_pts)[..., :3]

    near_surf_pts = on_surf_pts + rng.standard_normal(
        on_surf_pts.shape) * 0.005
    near_surf_pts = np.clip(near_surf_pts, mesh.aabb[None, :3],
                            mesh.aabb[None, 3:])
    near_surf_sdf = mesh.query_sdf(near_surf_pts)
    nmask = np.abs(near_surf_sdf) < threshold
    near_surf_sdf = np.clip(near_surf_sdf, -threshold, threshold)
    near_surf_tex = np.zeros((near_surf_sdf.shape[0], 3))
    if nmask.any():
        near_surf_tex[nmask] = mesh.query_tex(near_surf_pts[nmask])[..., :3]

    # save-time cap EXACTLY as the reference does it
    # (`data/mesh_sampler.py:212-216`): on-surface points random-
    # downsample to 2M before saving, while the near-surface arrays —
    # derived from ALL n_surf points above — ship uncapped (5M at the
    # canonical --n_surf 5000000 of `scripts/run_single.sh:9`).  The AE
    # additionally re-caps at load (`src/encoding/model.py:104-107` ==
    # training/ae.py) for npz files produced without this cap.
    if on_surf_pts.shape[0] > 2_000_000:
        idx = rng.choice(on_surf_pts.shape[0], 2_000_000, replace=False)
        on_surf_pts, on_surf_tex = on_surf_pts[idx], on_surf_tex[idx]

    np.savez_compressed(
        dst, pts_grid=vol_pts, sdf_grid=vol_sdf, tex_grid=vol_tex,
        pts_on_surf=on_surf_pts, tex_on_surf=on_surf_tex,
        pts_near_surf=near_surf_pts, sdf_near_surf=near_surf_sdf,
        tex_near_surf=near_surf_tex, **common)
    print("saved", dst)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--src", type=str, required=True)
    parser.add_argument("-d", "--dst", type=str, required=True)
    parser.add_argument("--reso", type=int, default=256)
    parser.add_argument("--watertight_reso", type=int, default=100_000)
    parser.add_argument("--n_surf", type=int, default=2_000_000)
    parser.add_argument("--mult", type=int, default=8)
    parser.add_argument("--threshold", type=float, default=None)
    parser.add_argument("--enlarge_scale", type=float, default=1.03)
    parser.add_argument("-wt", "--watertight", action="store_true")
    parser.add_argument("--only_vol", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    run(args.src, args.dst, reso=args.reso,
        watertight_reso=args.watertight_reso, n_surf=args.n_surf,
        mult=args.mult, threshold=args.threshold,
        enlarge_scale=args.enlarge_scale, watertight=args.watertight,
        only_vol=args.only_vol, seed=args.seed)


if __name__ == "__main__":
    main()
