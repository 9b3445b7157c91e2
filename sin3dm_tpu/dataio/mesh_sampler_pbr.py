"""PBR mesh sampler CLI — 8-channel texture variant of the sampler
(`/root/reference/data/mesh_sampler_pbr.py`): reads
`textures/albedo|metallicRoughness|metallic|roughness|normal` images next
to the OBJ; `query_tex` returns [rgb(3), metallic(1), roughness(1),
normal(3)].

Usage: python -m sin3dm_tpu.dataio.mesh_sampler_pbr -s model.obj -d out.npz
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Optional

import numpy as np

from .mesh_sampler import MeshSampler, sample_texture_bilinear


def _load_img(pattern: str) -> Optional[np.ndarray]:
    paths = glob.glob(pattern)
    if not paths:
        return None
    from PIL import Image
    img = Image.open(paths[0])
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr / 255.0


class PBRMeshSampler(MeshSampler):
    """Overrides texture lookup with the PBR texture set."""

    def __init__(self, path: str):
        super().__init__(path)
        tex_dir = os.path.join(os.path.dirname(path), "textures")
        self.image_albedo = _load_img(os.path.join(tex_dir, "albedo.*"))
        if self.image_albedo is None:
            raise RuntimeError(f"PBR sampler needs {tex_dir}/albedo.*")
        mr = _load_img(os.path.join(tex_dir, "metallicRoughness.*"))
        if mr is None:
            metallic = _load_img(os.path.join(tex_dir, "metallic.*"))
            roughness = _load_img(os.path.join(tex_dir, "roughness.*"))
            base = metallic if metallic is not None else roughness
            if base is None:
                mr = np.zeros(self.image_albedo.shape[:2] + (2,), np.float32)
            else:
                m = (metallic[..., 0] if metallic is not None
                     else np.zeros(base.shape[:2], np.float32))
                r = (roughness[..., 0] if roughness is not None
                     else np.zeros(base.shape[:2], np.float32))
                mr = np.stack([m, r], axis=-1)
        else:
            mr = mr[..., :2]
        self.image_mr = mr
        self.image_normal = _load_img(os.path.join(tex_dir, "normal.*"))
        if self.image_normal is None:
            self.image_normal = np.full(
                self.image_albedo.shape[:2] + (3,), 0.5, np.float32)
            self.image_normal[..., 2] = 1.0

    def query_tex(self, points: np.ndarray) -> np.ndarray:
        _, fi, bary = self._orig_bvh().closest(points)
        uv = (self.face_uvs[fi] * bary[..., None]).sum(axis=1)
        albedo = sample_texture_bilinear(self.image_albedo, uv)[..., :3]
        mr = sample_texture_bilinear(self.image_mr, uv)[..., :2]
        normal = sample_texture_bilinear(self.image_normal, uv)[..., :3]
        return np.concatenate([albedo, mr, normal], axis=-1)  # (N, 8)


def run(src: str, dst: str, **kw) -> None:
    """Same pipeline as the base sampler but with 8-channel textures and
    query_tex returning all channels (no rgba slice)."""
    reso = kw.get("reso", 256)
    threshold = kw.get("threshold") or 2.0 / reso * 3
    n_surf = kw.get("n_surf", 2_000_000)
    rng = np.random.default_rng(kw.get("seed", 0))
    from .grid import sample_grid_points_aabb

    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    mesh = PBRMeshSampler(src)
    mesh.make_watertight_copy(resolution=kw.get("watertight_reso", 100_000),
                              is_watertight=kw.get("watertight", False))
    mesh.normalize(reso=reso, enlarge_scale=kw.get("enlarge_scale", 1.03),
                   mult=kw.get("mult", 8))

    vol_pts = sample_grid_points_aabb(mesh.aabb, reso)
    vol_shape = vol_pts.shape[:3]
    vol_sdf = mesh.query_sdf(vol_pts.reshape(-1, 3))
    mask = np.abs(vol_sdf) < threshold
    vol_sdf = np.clip(vol_sdf, -threshold, threshold)
    vol_tex = np.zeros((vol_sdf.shape[0], 8))
    if mask.any():
        vol_tex[mask] = mesh.query_tex(vol_pts.reshape(-1, 3)[mask])
    vol_sdf = vol_sdf.reshape(vol_shape)
    vol_tex = vol_tex.reshape(vol_shape + (8,))

    on_surf_pts = mesh.sample_watertight_surf(n=n_surf, rng=rng)
    on_surf_tex = mesh.query_tex(on_surf_pts)
    near = on_surf_pts + rng.standard_normal(on_surf_pts.shape) * 0.005
    near = np.clip(near, mesh.aabb[None, :3], mesh.aabb[None, 3:])
    near_sdf = mesh.query_sdf(near)
    nmask = np.abs(near_sdf) < threshold
    near_sdf = np.clip(near_sdf, -threshold, threshold)
    near_tex = np.zeros((near_sdf.shape[0], 8))
    if nmask.any():
        near_tex[nmask] = mesh.query_tex(near[nmask])

    if on_surf_pts.shape[0] > 2_000_000:
        idx = rng.choice(on_surf_pts.shape[0], 2_000_000, replace=False)
        on_surf_pts, on_surf_tex = on_surf_pts[idx], on_surf_tex[idx]

    np.savez_compressed(
        dst, pts_grid=vol_pts, sdf_grid=vol_sdf, tex_grid=vol_tex,
        pts_on_surf=on_surf_pts, tex_on_surf=on_surf_tex,
        pts_near_surf=near, sdf_near_surf=near_sdf, tex_near_surf=near_tex,
        aabb=mesh.aabb, threshold=threshold,
        Ka=mesh.Ka, Kd=mesh.Kd, Ks=mesh.Ks, Ns=mesh.Ns)
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
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    run(args.src, args.dst, reso=args.reso,
        watertight_reso=args.watertight_reso, n_surf=args.n_surf,
        mult=args.mult, threshold=args.threshold,
        enlarge_scale=args.enlarge_scale, watertight=args.watertight,
        seed=args.seed)


if __name__ == "__main__":
    main()
