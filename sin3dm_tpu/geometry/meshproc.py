"""High-level mesh processing on top of the native kernels.

Covers the reference's geometry call surface (SURVEY.md §2.2):
`sdfgrid_to_mesh` (+ largest connected component), `mesh_decimation`,
surface sampling with barycentric interpolation, watertight remeshing,
and a small OBJ loader for the data pipeline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import native


def sdfgrid_to_mesh(sdf_grid: np.ndarray, only_largest_cc: bool = True,
                    is_voxel: bool = False
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """SDF grid -> mesh in index space, matching the reference conventions
    (`src/encoding/utils3d.py:196-213`): pad one layer of +1.0 (or 0 for
    voxel grids at iso 0.5), marching cubes, subtract the pad offset, and
    optionally keep only the component with the most faces."""
    if is_voxel:
        g = np.pad(sdf_grid.astype(np.float32), 1, constant_values=0.0)
        # voxel grids are occupancy: inside has value 1 > iso, so negate to
        # match the "inside < iso" convention
        v, f = native.marching_cubes(-g, -0.5)
    else:
        g = np.pad(sdf_grid.astype(np.float32), 1, constant_values=1.0)
        v, f = native.marching_cubes(g, 0.0)
    v = v - 1.0
    if only_largest_cc and len(f) > 0:
        comp, n = native.face_components(f, len(v))
        if n > 1:
            counts = np.bincount(comp, minlength=n)
            keep = comp == np.argmax(counts)
            f = f[keep]
            v, f = remove_unreferenced_vertices(v, f)
    return v, f


def sdfgrid_to_mesh_sparse(sparse, quant: float,
                           only_largest_cc: bool = True
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """`sdfgrid_to_mesh` fed straight from the sparse near-surface wire
    (`ops/sparse_grid.SparseGrid`) — same pad-by-one/+1.0 + iso-0 +
    largest-CC semantics (`src/encoding/utils3d.py:196-213`), but the
    dense fp32 grid and its padded copy are never materialized on the
    host.  Verts/tris are bit-identical to the dense path (tested in
    tests/test_sparse_grid.py)."""
    v, f = native.marching_cubes_sparse(
        np.asarray(sparse.signs), np.asarray(sparse.block_ids),
        np.asarray(sparse.block_vals), int(sparse.count),
        sparse.shape, sparse.padded, quant)
    v = v - 1.0
    if only_largest_cc and len(f) > 0:
        comp, n = native.face_components(f, len(v))
        if n > 1:
            counts = np.bincount(comp, minlength=n)
            keep = comp == np.argmax(counts)
            f = f[keep]
            v, f = remove_unreferenced_vertices(v, f)
    return v, f


def remove_unreferenced_vertices(v: np.ndarray, f: np.ndarray
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    # boolean-mask + cumsum remap: ~10x faster than np.unique on the
    # multi-million-face meshes marching cubes emits
    used_mask = np.zeros(len(v), dtype=bool)
    used_mask[f.reshape(-1)] = True
    used = np.nonzero(used_mask)[0]
    remap = -np.ones(len(v), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return v[used], remap[f]


def mesh_decimation(v: np.ndarray, f: np.ndarray,
                    face_count: int = 10000
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric decimation (`utils3d.py:216-221` semantics).

    prepass_mult=4: the vertex-clustering pre-pass hands the quadric
    stage ~4x the target faces.  Sweep on a 355k-tri marching-cubes
    surface decimated to 10k (best-of-3, quiet core; quality = mean
    |SDF| at 20k surface samples of the analytic shape):

        mult 3: 0.48s / 1.97e-4    mult 6: 0.57s / 1.90e-4
        mult 4: 0.47s / 1.97e-4    mult 8: 0.85s / 1.82e-4

    The +4% distance at mult 4 is ~0.03 voxels at 256^3 and only touches
    the exported mesh — the LP/voxel metrics read voxel.npz (the dense
    SDF grid), which decimation never sees.  (Absolute times above
    predate the deduped-push + 4-ary-heap quadric stage, which cut the
    collapse loop ~45%: 0.39 -> 0.21 s on a 276k-tri extract.)"""
    if len(f) <= face_count:
        return np.asarray(v, np.float64), np.asarray(f, np.int64)
    return native.decimate(v, f, face_count, prepass_mult=4)


def face_areas(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    tri = v[f]
    return 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)


def sample_mesh_random(v: np.ndarray, f: np.ndarray, n: int,
                       rng: Optional[np.random.Generator] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Area-weighted random surface samples -> (face_idx [n], bary [n,3])
    (pcu.sample_mesh_random replacement, `mesh_sampler.py:100`)."""
    rng = rng or np.random.default_rng()
    areas = face_areas(v, f)
    p = areas / areas.sum()
    fi = rng.choice(len(f), size=n, p=p)
    # uniform barycentric via sqrt trick
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    bary = np.stack([1 - r1, r1 * (1 - r2), r1 * r2], axis=-1)
    return fi, bary


def interpolate_barycentric(f: np.ndarray, fi: np.ndarray, bary: np.ndarray,
                            vertex_attr: np.ndarray) -> np.ndarray:
    """Interpolate per-vertex attributes at (face, barycentric) samples
    (pcu.interpolate_barycentric_coords replacement)."""
    corners = vertex_attr[f[fi]]            # [n, 3, A]
    return (corners * bary[..., None]).sum(axis=1)


def estimate_vertex_normals(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    tri = v[f]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    lens = np.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / np.maximum(lens, 1e-12)


def make_mesh_watertight(v: np.ndarray, f: np.ndarray,
                         resolution: int = 100_000
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Watertight remesh via winding-number voxelization + marching cubes
    (pcu.make_mesh_watertight replacement, `mesh_sampler.py:94`).

    `resolution` is interpreted like the watertight-manifold algorithm's
    leaf-cell budget: the voxel grid has ~resolution cells total (min 64
    per axis), scaled anisotropically to the bounding box.
    """
    lo = v.min(axis=0)
    hi = v.max(axis=0)
    size = hi - lo
    pad = 0.03 * size.max()
    lo, hi = lo - pad, hi + pad
    size = hi - lo
    per_axis = max(64, int(round(resolution ** (1 / 3))))
    dims = np.maximum((per_axis * size / size.max()).astype(int), 8)

    xs = [np.linspace(lo[k], hi[k], dims[k]) for k in range(3)]
    grid = np.stack(np.meshgrid(*xs, indexing="ij"), axis=-1)
    bvh = native.MeshBVH(v.astype(np.float32), f.astype(np.int32))
    w = bvh.winding(grid.reshape(-1, 3)).reshape(grid.shape[:3])
    occ = (0.5 - w).astype(np.float32)  # negative inside
    mv, mf = native.marching_cubes(occ, 0.0)
    # back to world coordinates
    scale = size / (dims - 1)
    mv = mv * scale[None, :] + lo[None, :]
    return mv, mf


# ---------------------------------------------------------------------------
# Minimal OBJ scene loader (trimesh replacement for the data pipeline,
# `data/mesh_sampler.py:16-73`): vertices, faces, uvs, per-material groups,
# MTL material params + texture images.
# ---------------------------------------------------------------------------

class ObjMaterial:
    def __init__(self, name: str):
        self.name = name
        self.Ka = np.array([0.0, 0.0, 0.0])
        self.Kd = np.array([1.0, 1.0, 1.0])
        self.Ks = np.array([0.4, 0.4, 0.4])
        self.Ns = 10.0
        self.map_Kd: Optional[str] = None
        self.image: Optional[np.ndarray] = None  # [H, W, 3/4] float in [0,1]


def _load_mtl(path: str) -> dict:
    mats = {}
    cur = None
    try:
        with open(path) as fh:
            for line in fh:
                parts = line.strip().split()
                if not parts:
                    continue
                k = parts[0]
                if k == "newmtl":
                    cur = ObjMaterial(parts[1])
                    mats[parts[1]] = cur
                elif cur is None:
                    continue
                elif k in ("Ka", "Kd", "Ks"):
                    setattr(cur, k, np.array([float(x)
                                              for x in parts[1:4]]))
                elif k == "Ns":
                    cur.Ns = float(parts[1])
                elif k == "map_Kd":
                    cur.map_Kd = parts[-1]
    except FileNotFoundError:
        pass
    return mats


def load_obj_scene(path: str):
    """Parse an OBJ with materials.  Returns a dict with:
    verts [V,3], faces [F,3], face_uvs [F,3,2] (0 where absent),
    face_mat [F] material index, materials list[ObjMaterial]."""
    import os
    verts, uvs = [], []
    faces, face_uv_idx, face_mat = [], [], []
    mats: dict = {}
    mat_list = []
    mat_index = {}
    cur_mat = -1

    def get_mat(name):
        nonlocal cur_mat
        if name not in mat_index:
            m = mats.get(name, ObjMaterial(name))
            mat_index[name] = len(mat_list)
            mat_list.append(m)
        return mat_index[name]

    base = os.path.dirname(path)
    with open(path) as fh:
        for line in fh:
            parts = line.strip().split()
            if not parts:
                continue
            k = parts[0]
            if k == "mtllib":
                mats.update(_load_mtl(os.path.join(base, parts[1])))
            elif k == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif k == "vt":
                uvs.append([float(parts[1]), float(parts[2])])
            elif k == "usemtl":
                cur_mat = get_mat(parts[1])
            elif k == "f":
                idx = []
                for p in parts[1:]:
                    comp = p.split("/")
                    vi = int(comp[0])
                    ti = int(comp[1]) if len(comp) > 1 and comp[1] else 0
                    idx.append((vi, ti))
                # triangulate polygon fan
                for i in range(1, len(idx) - 1):
                    tri = [idx[0], idx[i], idx[i + 1]]
                    faces.append([t[0] - 1 if t[0] > 0
                                  else len(verts) + t[0] for t in tri])
                    face_uv_idx.append([t[1] - 1 if t[1] > 0
                                        else (len(uvs) + t[1]
                                              if t[1] < 0 else -1)
                                        for t in tri])
                    face_mat.append(cur_mat)

    verts = np.asarray(verts, np.float64)
    uvs_np = np.asarray(uvs, np.float64) if uvs else np.zeros((0, 2))
    faces = np.asarray(faces, np.int64)
    face_uv_idx = np.asarray(face_uv_idx, np.int64)
    face_mat = np.asarray(face_mat, np.int64)
    if (face_mat < 0).any():
        # faces before any usemtl -> default material
        default = len(mat_list)
        mat_list.append(ObjMaterial("default"))
        face_mat = np.where(face_mat < 0, default, face_mat)

    # face-corner uvs
    fuv = np.zeros((len(faces), 3, 2))
    valid = face_uv_idx >= 0
    if uvs_np.size:
        fuv[valid] = uvs_np[face_uv_idx[valid]]

    # load texture images
    import os as _os
    for m in mat_list:
        if m.map_Kd:
            img_path = _os.path.join(base, m.map_Kd)
            if _os.path.exists(img_path):
                from PIL import Image
                img = np.asarray(Image.open(img_path).convert("RGBA"),
                                 np.float32) / 255.0
                m.image = img

    return {"verts": verts, "faces": faces, "face_uvs": fuv,
            "face_mat": face_mat, "materials": mat_list}
