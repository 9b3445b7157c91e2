"""Native geometry kernels: marching cubes (watertightness on analytic
SDFs), connected components, decimation, BVH SDF, UV rasterizer."""

import numpy as np
import pytest

from sin3dm_tpu.geometry import native


def _sphere_sdf(n=32, r=0.35):
    xs = np.linspace(0, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    return (np.linalg.norm(g - 0.5, axis=-1) - r).astype(np.float32), xs


def _edge_counts(faces):
    from collections import Counter
    c = Counter()
    for a, b, cc in faces:
        for u, v in ((a, b), (b, cc), (cc, a)):
            c[(min(u, v), max(u, v))] += 1
    return c


def test_marching_cubes_sphere_watertight():
    sdf, xs = _sphere_sdf(32, 0.35)
    v, f = native.marching_cubes(sdf, 0.0)
    assert len(v) > 100 and len(f) > 100
    # every edge shared by exactly 2 triangles -> closed 2-manifold;
    # this validates the generated MC tables (incl. ambiguous cases)
    counts = _edge_counts(f)
    assert all(c == 2 for c in counts.values())
    # vertices on the sphere of radius 0.35*(n-1) in index space
    center = (len(xs) - 1) / 2.0
    radii = np.linalg.norm(v - center, axis=1) / (len(xs) - 1)
    np.testing.assert_allclose(radii, 0.35, atol=0.02)


def test_marching_cubes_orientation_outward():
    """Triangle normals should point outward (away from the negative-inside
    region), matching the obj-export convention."""
    sdf, xs = _sphere_sdf(24, 0.3)
    v, f = native.marching_cubes(sdf, 0.0)
    center = (len(xs) - 1) / 2.0
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    cdir = tri.mean(axis=1) - center
    dots = (n * cdir).sum(-1)
    frac_outward = (dots > 0).mean()
    assert frac_outward > 0.99 or frac_outward < 0.01  # consistent
    assert frac_outward > 0.99, "normals must point outward"


def test_marching_cubes_two_spheres_components():
    n = 40
    xs = np.linspace(0, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    s1 = np.linalg.norm(g - np.array([0.3, 0.3, 0.3]), axis=-1) - 0.15
    s2 = np.linalg.norm(g - np.array([0.7, 0.7, 0.7]), axis=-1) - 0.1
    sdf = np.minimum(s1, s2).astype(np.float32)
    v, f = native.marching_cubes(sdf, 0.0)
    comp, n_comp = native.face_components(f, len(v))
    assert n_comp == 2
    # the larger sphere has more faces
    counts = np.bincount(comp)
    big = np.argmax(counts)
    assert counts[big] > counts[1 - big]


def test_decimation_preserves_shape():
    sdf, xs = _sphere_sdf(40, 0.4)
    v, f = native.marching_cubes(sdf, 0.0)
    target = 500
    v2, f2 = native.decimate(v, f, target)
    assert len(f2) <= target * 1.1
    assert len(f2) > target * 0.3
    center = (len(xs) - 1) / 2.0
    radii = np.linalg.norm(v2 - center, axis=1) / (len(xs) - 1)
    np.testing.assert_allclose(radii.mean(), 0.4, atol=0.02)
    assert radii.std() < 0.02


def test_bvh_signed_distance_cube():
    # unit cube mesh [0,1]^3, 12 triangles, outward normals
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
    f = np.array([
        [0, 2, 1], [0, 3, 2],      # z=0 (normal -z)
        [4, 5, 6], [4, 6, 7],      # z=1 (+z)
        [0, 1, 5], [0, 5, 4],      # y=0 (-y)
        [2, 3, 7], [2, 7, 6],      # y=1 (+y)
        [0, 4, 7], [0, 7, 3],      # x=0 (-x)
        [1, 2, 6], [1, 6, 5],      # x=1 (+x)
    ], np.int32)
    bvh = native.MeshBVH(v, f)
    pts = np.array([[0.5, 0.5, 0.5],    # center: inside, dist 0.5
                    [0.5, 0.5, 1.25],   # outside, dist 0.25
                    [0.1, 0.5, 0.5],    # inside, dist 0.1
                    [-0.3, 0.5, 0.5]], np.float32)
    sdf, face, bary = bvh.signed_distance(pts)
    np.testing.assert_allclose(sdf, [-0.5, 0.25, -0.1, 0.3], atol=1e-5)
    w = bvh.winding(pts)
    np.testing.assert_allclose(w, [1, 0, 1, 0], atol=0.01)


def test_bvh_winding_matches_exact_on_sphere_mesh():
    sdf, xs = _sphere_sdf(24, 0.3)
    v, f = native.marching_cubes(sdf, 0.0)
    bvh = native.MeshBVH(v.astype(np.float32), f.astype(np.int32))
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, len(xs) - 1, size=(500, 3)).astype(np.float32)
    w = bvh.winding(pts)
    center = (len(xs) - 1) / 2.0
    inside = np.linalg.norm(pts - center, axis=1) / (len(xs) - 1) < 0.3
    # away from the surface, winding is essentially 0/1
    margin = np.abs(np.linalg.norm(pts - center, axis=1) / (len(xs) - 1)
                    - 0.3) > 0.03
    agree = (w[margin] > 0.5) == inside[margin]
    assert agree.mean() > 0.995


def test_bvh_closest_point():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    bvh = native.MeshBVH(v, f)
    dist, face, bary = bvh.closest([[0.25, 0.25, 1.0], [2.0, 0.0, 0.0]])
    np.testing.assert_allclose(dist, [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(bary[0], [0.5, 0.25, 0.25], atol=1e-6)
    np.testing.assert_allclose(bary[1], [0, 1, 0], atol=1e-6)  # corner


def test_rasterize_uv():
    # one triangle covering the lower-left UV half
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    tri_uv = np.array([[0, 1, 2]], np.int32)
    verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float32)
    tri_pos = tri_uv
    pos, mask = native.rasterize_uv(uvs, tri_uv, verts, tri_pos, 64)
    assert mask.shape == (64, 64)
    frac = mask.mean()
    assert 0.45 < frac < 0.55
    # position interpolates linearly: texel (r=0,c=31) ~ u=(31.5)/64
    r, c = 0, 31
    assert mask[r, c]
    np.testing.assert_allclose(pos[r, c, 0], 10 * (c) / 64, atol=0.3)


def test_charts_by_axis_matches_python_unionfind():
    """Native chart segmentation reproduces the original Python
    edge-map/union-find exactly (same roots up to the np.unique
    relabeling) on a bumpy-sphere MC mesh."""
    from collections import defaultdict
    from sin3dm_tpu.geometry import uvatlas

    n = 32
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    r = np.linalg.norm(g, axis=-1)
    bump = (0.1 * np.sin(5 * g[..., 0]) * np.sin(4 * g[..., 1])
            * np.sin(6 * g[..., 2]))
    sdf = (r - 0.7 + bump).astype(np.float32)
    v, f = native.marching_cubes(sdf, 0.0)

    # original Python implementation (the oracle)
    tri = v[f]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                           1e-12)
    bins_py = np.argmax(nrm @ uvatlas._AXES.T, axis=1)
    edge_to_faces = defaultdict(list)
    for fi, t in enumerate(f):
        for k in range(3):
            a, b = t[k], t[(k + 1) % 3]
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
            if bins_py[a] == bins_py[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    roots_py = np.array([find(i) for i in range(len(f))])

    roots_nat, bins_nat = native.charts_by_axis(v, f)
    np.testing.assert_array_equal(bins_nat, bins_py)
    np.testing.assert_array_equal(roots_nat, roots_py)


def test_oriented_rect_angles_matches_python():
    """Native batched rotating calipers achieves the same minimal rect
    area as the Python oracle on random point clouds (the chosen angle
    may differ on exact ties; the areas must agree)."""
    from sin3dm_tpu.geometry import uvatlas

    rng = np.random.default_rng(0)
    clouds = []
    for n in [2, 3, 4, 8, 9, 20, 77, 200]:
        clouds.append(rng.normal(size=(n, 2)) * rng.uniform(0.1, 3))
    # degenerate: collinear + duplicated points
    clouds.append(np.repeat(np.linspace(0, 1, 5)[:, None], 2, axis=1))
    clouds.append(np.zeros((6, 2)))
    angles = native.oriented_rect_angles(clouds)

    def rect_area(uv, a):
        c, s = np.cos(a), np.sin(a)
        rot = uv @ np.array([[c, -s], [s, c]])
        w, h = rot.max(axis=0) - rot.min(axis=0)
        return w * h

    for uv, a_nat in zip(clouds, angles):
        a_py = uvatlas._oriented_rect_angle(uv)
        assert 0 <= a_nat < np.pi / 2 + 1e-12
        np.testing.assert_allclose(rect_area(uv, a_nat),
                                   rect_area(uv, a_py), rtol=1e-9,
                                   atol=1e-12)


def test_mask_compact_q16_bit_exact():
    """Fused C++ compaction+quantization == the numpy texel-wire
    expression (`training/ae.py _dispatch_texels`) bit for bit, including
    clip boundaries and round-half-to-even cases."""
    rng = np.random.default_rng(0)
    N = 200_000
    aabb = np.array([-1.0, -0.9, -0.7, 1.0, 0.9, 0.7])
    lo = aabb[:3].astype(np.float32)
    span = aabb[3:].astype(np.float32) - lo
    pos = rng.uniform(aabb[:3] - 0.1, aabb[3:] + 0.1, (N, 3)
                      ).astype(np.float32)
    # exact half-integer quantization inputs exercise rint's
    # round-half-to-even against np.rint
    k = rng.integers(0, 65536, (2000, 3))
    pos[:2000] = (k.astype(np.float32) + 0.5) * span / 65535.0 + lo
    mask = rng.random(N) < 0.47

    ref = np.clip(np.rint((pos[mask] - lo) / span * 65535.0), 0.0,
                  65535.0).astype(np.uint16)
    got = native.mask_compact_q16(pos, mask, lo, span)
    np.testing.assert_array_equal(got, ref)
    # empty mask
    got0 = native.mask_compact_q16(pos, np.zeros(N, bool), lo, span)
    assert got0.shape == (0, 3)


def test_tex_assemble_matches_cv2():
    """Fused C++ scatter+dilate+flip == the numpy/cv2 reference chain
    it replaced (`model.py:426-429` semantics), bit for bit."""
    import cv2

    rng = np.random.default_rng(3)
    for R, C in ((64, 3), (48, 8), (33, 1)):
        mask = rng.random((R, R)) < 0.4
        preds = rng.integers(0, 256, (int(mask.sum()), C)).astype(np.uint8)

        img = np.zeros((R, R, C), np.uint8)
        img[mask] = preds
        dil = cv2.dilate(img, np.ones((3, 3), "uint8"), iterations=1)
        if dil.ndim == 2:
            dil = dil[..., None]
        m = mask[..., None].astype(np.uint8)
        ref = (img * m + dil * (1 - m))[::-1]

        got = native.tex_assemble(preds, mask, R)
        np.testing.assert_array_equal(got, ref)
