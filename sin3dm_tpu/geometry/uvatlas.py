"""First-party UV atlas generation (xatlas replacement for texture baking,
`/root/reference/src/encoding/utils3d.py:228-251`).

Method: normal-axis chart segmentation (6 directional bins), orthographic
per-chart projection, and shelf packing into the unit square — the same
family as Blender's "Smart UV Project".  Quality requirements here are
modest: the atlas only carries baked texture colors queried from the
triplane decoder, so low distortion + no overlaps is what matters, both of
which this construction guarantees (projection along the dominant normal
axis bounds distortion; disjoint packing rects prevent overlap).

Returns (uvs [N,2], mesh_tex_idx [F,3]) like xatlas.parametrize.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Tuple

import numpy as np


def _face_normals(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


_AXES = np.array([
    [1, 0, 0], [-1, 0, 0],
    [0, 1, 0], [0, -1, 0],
    [0, 0, 1], [0, 0, -1],
], np.float64)

# (u_axis, v_axis) for each bin; u flipped on negative bins so charts are
# not mirrored
_PROJ = [
    ((0, -1, 0), (0, 0, 1)),   # +x: u=-y, v=z
    ((0, 1, 0), (0, 0, 1)),    # -x: u=+y, v=z
    ((1, 0, 0), (0, 0, 1)),    # +y: u=x, v=z
    ((-1, 0, 0), (0, 0, 1)),   # -y
    ((1, 0, 0), (0, 1, 0)),    # +z: u=x, v=y
    ((-1, 0, 0), (0, 1, 0)),   # -z
]


def _charts_by_axis(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Per-face chart id: connected components within each normal bin."""
    fn = _face_normals(v, f)
    bins = np.argmax(fn @ _AXES.T, axis=1)

    # face adjacency via shared (sorted) edges
    edge_to_faces = defaultdict(list)
    for fi, tri in enumerate(f):
        for k in range(3):
            a, b = tri[k], tri[(k + 1) % 3]
            edge_to_faces[(min(a, b), max(a, b))].append(fi)

    parent = np.arange(len(f))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for faces in edge_to_faces.values():
        for i in range(1, len(faces)):
            a, b = faces[0], faces[i]
            if bins[a] == bins[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb

    roots = np.array([find(i) for i in range(len(f))])
    _, chart = np.unique(roots, return_inverse=True)
    return chart, bins


def _oriented_rect_angle(uv: np.ndarray) -> float:
    """Rotation angle (radians) minimizing the chart's bounding-rect area
    (rotating calipers over the convex hull — each hull edge direction is
    a candidate)."""
    if len(uv) < 3:
        return 0.0
    try:
        from scipy.spatial import ConvexHull
        hull = uv[ConvexHull(uv).vertices]
    except Exception:
        hull = uv
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]),
                              np.pi / 2))
    best_a, best_area = 0.0, np.inf
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        rot = hull @ np.array([[c, -s], [s, c]])
        w, h = rot.max(axis=0) - rot.min(axis=0)
        if w * h < best_area:
            best_area, best_a = w * h, a
    return best_a


def parametrize(v: np.ndarray, f: np.ndarray, padding: float = 0.004
                ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (uvs [N,2] in [0,1], mesh_tex_idx [F,3] indices into uvs).

    Each chart is rotated to its minimal-area oriented bounding rect (a
    pure rotation — texel density and orientation handedness preserved),
    then laid out by the better of FFDH shelves and skyline bottom-left,
    charts rotated 90 deg when taller than wide.  Measured texel
    utilization on decimated decodes: 0.47 (r1 axis-aligned shelves) ->
    0.58-0.60 (oriented rects + best-of packing) — xatlas lands at
    0.6-0.75 on comparable inputs.  The remaining gap is chart FILL
    (rounded axis-projection charts cover ~3/4 of their rects), not
    packing: rect placement already reaches ~76% density, and a
    free-form bitmap packer measured WORSE (greedy fragmentation beat
    by the rect structure) at 10x the cost."""
    chart, bins = _charts_by_axis(v, f)
    n_charts = chart.max() + 1 if len(f) else 0

    # project each chart; duplicate vertices per (chart, vertex)
    tex_idx = np.zeros_like(f)
    chart_rects = []          # (w, h) of each chart in world units
    chart_vert_uv = []        # list of dict vertex -> uv row
    for c in range(n_charts):
        faces_c = np.where(chart == c)[0]
        bin_id = bins[faces_c[0]]
        u_ax = np.array(_PROJ[bin_id][0], np.float64)
        v_ax = np.array(_PROJ[bin_id][1], np.float64)
        vids = np.unique(f[faces_c].reshape(-1))
        uv = np.stack([v[vids] @ u_ax, v[vids] @ v_ax], axis=-1)
        # rotate to the minimal-area oriented bounding rect, then make the
        # rect wider than tall (90-deg rotation) for shelf packing
        a = _oriented_rect_angle(uv)
        ca, sa = np.cos(a), np.sin(a)
        uv = uv @ np.array([[ca, -sa], [sa, ca]])
        uv -= uv.min(axis=0)
        w, h = uv.max(axis=0) if len(uv) else (0.0, 0.0)
        if h > w:
            uv = np.stack([uv[:, 1], w - uv[:, 0]], axis=-1)
            w, h = h, w
        chart_rects.append((max(w, 1e-9), max(h, 1e-9)))
        mapping = {vid: i for i, vid in enumerate(vids)}
        chart_vert_uv.append((faces_c, mapping, uv))

    # two packers, best-of (r2): FFDH shelves (r1's layout; near-optimal
    # when chart heights cluster) and skyline bottom-left (wins on mixed
    # sizes).  The global scale is binary-searched per packer for the
    # largest layout that fits [0,1]^2 and the better scale is kept.
    order = sorted(range(n_charts),
                   key=lambda c: -chart_rects[c][1])  # by height desc

    def pack_shelf(scale):
        pos = {}
        shelves = []  # [y, height, x_used]
        y_top = 0.0
        for c in order:
            w = chart_rects[c][0] * scale + 2 * padding
            h = chart_rects[c][1] * scale + 2 * padding
            if w > 1.0 or h > 1.0:
                return None
            placed = False
            for sh in shelves:
                if h <= sh[1] and sh[2] + w <= 1.0:
                    pos[c] = (sh[2] + padding, sh[0] + padding)
                    sh[2] += w
                    placed = True
                    break
            if not placed:
                if y_top + h > 1.0:
                    return None
                shelves.append([y_top, h, w])
                pos[c] = (padding, y_top + padding)
                y_top += h
        return pos

    def pack_skyline(scale):
        pos = {}
        # skyline: sorted list of (x, y, width) segments spanning [0,1]
        sky = [(0.0, 0.0, 1.0)]
        for c in order:
            w = chart_rects[c][0] * scale + 2 * padding
            h = chart_rects[c][1] * scale + 2 * padding
            if w > 1.0 or h > 1.0:
                return None
            # best (lowest resting y, then leftmost) left-edge position:
            # try each segment start
            best = None  # (y, x, i)
            for i, (sx, sy, sw) in enumerate(sky):
                if sx + w > 1.0 + 1e-12:
                    break  # segments are sorted by x; no fit further right
                # resting height = max skyline over [sx, sx + w)
                y = sy
                x_end = sx + w
                j = i
                while j < len(sky) and sky[j][0] < x_end - 1e-12:
                    y = max(y, sky[j][1])
                    j += 1
                if y + h <= 1.0 + 1e-12 and (best is None
                                             or (y, sx) < (best[0], best[1])):
                    best = (y, sx, i)
            if best is None:
                return None
            y, x, i = best
            pos[c] = (x + padding, y + padding)
            # update skyline: segment [x, x+w) at height y+h
            x_end = x + w
            new_sky = []
            for (sx, sy, sw) in sky:
                se = sx + sw
                if se <= x + 1e-12 or sx >= x_end - 1e-12:
                    new_sky.append((sx, sy, sw))
                    continue
                if sx < x - 1e-12:           # left remainder
                    new_sky.append((sx, sy, x - sx))
                if se > x_end + 1e-12:       # right remainder
                    new_sky.append((x_end, sy, se - x_end))
            new_sky.append((x, y + h, w))
            new_sky.sort(key=lambda s: s[0])
            # merge adjacent equal-height segments
            merged = [new_sky[0]]
            for s in new_sky[1:]:
                px, py, pw = merged[-1]
                if abs(s[1] - py) < 1e-12 and abs(px + pw - s[0]) < 1e-9:
                    merged[-1] = (px, py, pw + s[2])
                else:
                    merged.append(s)
            sky = merged
        return pos

    total_area = sum(w * h for w, h in chart_rects)
    hi0 = 1.0 / np.sqrt(total_area) if total_area > 0 else 1.0

    def search(try_pack):
        hi = hi0
        lo = hi * 1e-3
        pos = try_pack(lo)
        if pos is None:
            return 0.0, None
        for _ in range(40):
            mid = 0.5 * (lo + hi)
            p = try_pack(mid)
            if p is not None:
                lo, pos = mid, p
            else:
                hi = mid
        return lo, pos

    import os as _os
    cand = {"shelf": search(pack_shelf), "skyline": search(pack_skyline)}
    if _os.environ.get("SIN3DM_UV_DEBUG"):
        print({k: round(float(v[0]), 6) for k, v in cand.items()})
    scale, pos = max(cand.values(), key=lambda sp: sp[0])
    if pos is None:
        raise RuntimeError("uv packing failed even at minimal scale")

    # emit uvs
    uvs_out = []
    for c in range(n_charts):
        faces_c, mapping, uv = chart_vert_uv[c]
        ox, oy = pos[c]
        base = len(uvs_out)
        uvs_out.extend((uv * scale + np.array([ox, oy])).tolist())
        for fi in faces_c:
            for k in range(3):
                tex_idx[fi, k] = base + mapping[f[fi, k]]

    return np.asarray(uvs_out, np.float64), tex_idx.astype(np.int64)


def uv_unwrap_and_rasterize(v: np.ndarray, f: np.ndarray, resolution: int):
    """Full xatlas_uvmap replacement (`utils3d.py:228-251`): parametrize,
    rasterize the UV charts at `resolution`, return
    (uvs, mesh_tex_idx, gb_pos [R,R,3], mask [R,R]).

    Padding is resolution-aware (2 texels between charts): with hundreds
    of charts, fixed padding eats most of the atlas and starves texel
    density."""
    from . import native
    uvs, tex_idx = parametrize(v, f, padding=max(2.0 / resolution, 5e-4))
    gb_pos, mask = native.rasterize_uv(
        uvs.astype(np.float32), tex_idx.astype(np.int32),
        v.astype(np.float32), f.astype(np.int32), resolution)
    return uvs, tex_idx, gb_pos, mask
