import numpy as np

from points2surf_tpu.ops.marching_cubes import marching_tetrahedra
from points2surf_tpu.ops.meshdist import signed_distance


def _icosphere_ish(res=28, radius=0.5):
    """Sphere mesh via our own isosurface extractor."""
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = radius - np.sqrt(x * x + y * y + z * z)
    v, f = marching_tetrahedra(vol.astype(np.float32), 0.0)
    v = v / (res - 1) * 2.0 - 1.0
    return v.astype(np.float32), f


def test_signed_distance_sphere(rng):
    v, f = _icosphere_ish()
    q = (rng.rand(500, 3).astype(np.float32) * 1.6) - 0.8
    got = signed_distance(v, f, q, query_batch=256, tri_chunk=512)
    want = 0.5 - np.linalg.norm(q, axis=1)  # analytic: positive inside
    # mesh is a discretization of the sphere -> tolerance ~ a voxel
    np.testing.assert_allclose(got, want, atol=0.03)
    # signs must agree except very close to the surface
    far = np.abs(want) > 0.05
    assert (np.sign(got[far]) == np.sign(want[far])).all()


def test_signed_distance_cube_corners(rng):
    # unit cube [-.4,.4]^3 as two triangles per face
    hv = 0.4
    corners = np.array(
        [[x, y, z] for x in (-hv, hv) for y in (-hv, hv) for z in (-hv, hv)],
        np.float32,
    )
    # faces with outward orientation
    quads = [
        (0, 1, 3, 2, False),  # x = -hv
        (4, 5, 7, 6, True),   # x = +hv
        (0, 1, 5, 4, True),   # y = -hv
        (2, 3, 7, 6, False),  # y = +hv
        (0, 2, 6, 4, False),  # z = -hv
        (1, 3, 7, 5, True),   # z = +hv
    ]
    faces = []
    for a, b, c, d, flip in quads:
        if flip:
            faces += [(a, b, c), (a, c, d)]
        else:
            faces += [(a, c, b), (a, d, c)]
    faces = np.asarray(faces, np.int64)

    q = np.array(
        [
            [0.0, 0.0, 0.0],   # center: inside, dist 0.4
            [0.3, 0.0, 0.0],   # inside, dist 0.1
            [0.5, 0.0, 0.0],   # outside, dist 0.1
            [0.5, 0.5, 0.5],   # outside near corner
        ],
        np.float32,
    )
    got = signed_distance(corners, faces, q, query_batch=4, tri_chunk=16)
    want = np.array(
        [0.4, 0.1, -0.1, -np.sqrt(3 * 0.1**2)], np.float32
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_signed_distance_matches_grid_field(rng):
    """Round-trip: SDF of a mesh extracted from an analytic field must
    reproduce the field near the surface."""
    v, f = _icosphere_ish(res=36, radius=0.45)
    base = v[rng.choice(len(v), 64)]
    normal_dir = base / np.linalg.norm(base, axis=1, keepdims=True)
    offs = rng.uniform(-0.1, 0.1, (64, 1)).astype(np.float32)
    q = (base + offs * normal_dir).astype(np.float32)
    got = signed_distance(v, f, q, query_batch=64, tri_chunk=512)
    want = 0.45 - np.linalg.norm(q, axis=1)
    np.testing.assert_allclose(got, want, atol=0.02)


def test_closest_point_on_mesh_exact(rng):
    """Exact closest-point primitive (reference point_cloud.py:197-220):
    the returned point must lie on the claimed face, its distance must
    match, and no densely-sampled surface point may be closer."""
    from points2surf_tpu.ops.marching_cubes import marching_tetrahedra
    from points2surf_tpu.ops.meshdist import closest_point_on_mesh

    res = 20
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    field = 0.6 - np.sqrt(x * x + y * y + z * z)
    v, f = marching_tetrahedra(field.astype(np.float32), 0.0)
    v = v / (res - 1) * 2.0 - 1.0

    queries = (rng.rand(50, 3).astype(np.float32) * 2.0) - 1.0
    got_pts, got_dist, got_fid = closest_point_on_mesh(
        v, f, queries, query_batch=32, tri_chunk=256
    )

    # 1. returned point sits on the claimed face (within fp eps) and its
    #    distance matches
    tri = v[f[got_fid]]  # (Q, 3, 3)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    n = np.cross(b - a, c - a)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    plane_resid = np.abs(np.sum((got_pts - a) * n, axis=1))
    assert plane_resid.max() < 1e-4
    np.testing.assert_allclose(
        np.linalg.norm(queries - got_pts, axis=1), got_dist, atol=1e-5
    )

    # 2. dense barycentric sampling cannot beat the reported distance
    levels = 12
    ws = []
    for i in range(levels + 1):
        for j in range(levels + 1 - i):
            k = levels - i - j
            ws.append((i / levels, j / levels, k / levels))
    ws = np.asarray(ws, np.float32)  # (S, 3)
    va, vb, vc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    samples = (
        ws[:, 0, None, None] * va[None]
        + ws[:, 1, None, None] * vb[None]
        + ws[:, 2, None, None] * vc[None]
    ).reshape(-1, 3)
    d_sampled = np.min(
        np.linalg.norm(queries[:, None, :] - samples[None], axis=2), axis=1
    )
    assert (got_dist <= d_sampled + 1e-5).all()
    # and must be close to the sampled min (spacing bound)
    edge = np.linalg.norm(vb - va, axis=1).max()
    assert (d_sampled - got_dist <= edge / levels).all()
