import numpy as np

from points2surf_tpu.ops.marching_cubes import marching_tetrahedra


def _sphere_field(res, radius=0.3):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    d = np.sqrt(x * x + y * y + z * z)
    return (radius - d).astype(np.float32)  # positive inside


def test_sphere_surface(rng):
    res = 32
    vol = _sphere_field(res)
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie on the sphere of radius 0.3 (in model coords)
    ms = verts / (res - 1) * 2.0 - 1.0
    r = np.linalg.norm(ms, axis=1)
    assert abs(r.mean() - 0.3) < 0.01
    assert r.std() < 0.01


def test_watertight_closed_surface(rng):
    vol = _sphere_field(24, 0.4)
    verts, faces = marching_tetrahedra(vol, 0.0)
    # every edge must be shared by exactly 2 faces (closed 2-manifold)
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_orientation_outward(rng):
    res = 24
    vol = _sphere_field(res, 0.4)
    verts, faces = marching_tetrahedra(vol, 0.0)
    # normals should point away from the center (outside = negative field)
    v0, v1, v2 = (verts[faces[:, k]] for k in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    centroid = (v0 + v1 + v2) / 3.0 - (res - 1) / 2.0
    outward = np.einsum("ij,ij->i", n, centroid)
    assert (outward > 0).mean() > 0.99


def test_signed_volume_of_sphere(rng):
    res = 40
    radius = 0.5
    vol = _sphere_field(res, radius)
    verts, faces = marching_tetrahedra(vol, 0.0)
    ms = verts / (res - 1) * 2.0 - 1.0
    v0, v1, v2 = (ms[faces[:, k]] for k in range(3))
    signed_vol = np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum() / 6.0
    want = 4.0 / 3.0 * np.pi * radius**3
    assert abs(abs(signed_vol) - want) / want < 0.02


def test_empty_and_full_fields():
    vol = np.full((8, 8, 8), -1.0, np.float32)
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0
    vol = np.full((8, 8, 8), 1.0, np.float32)
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_native_matches_numpy(rng):
    import pytest

    try:
        from points2surf_tpu.ops import marching_native

        v_n, f_n = marching_native.marching_tetrahedra(
            _sphere_field(24, 0.4), 0.0
        )
    except Exception as e:
        pytest.skip(f"native kernel unavailable: {e}")
    v_p, f_p = marching_tetrahedra(_sphere_field(24, 0.4), 0.0)
    assert len(v_n) == len(v_p)
    assert len(f_n) == len(f_p)
    # same vertex set (ordering may differ)
    sn = np.asarray(sorted(map(tuple, np.round(v_n, 5))))
    sp = np.asarray(sorted(map(tuple, np.round(v_p, 5))))
    np.testing.assert_allclose(sn, sp, atol=1e-5)
    # watertight
    edges = np.concatenate(
        [f_n[:, [0, 1]], f_n[:, [1, 2]], f_n[:, [2, 0]]], axis=0
    )
    _, counts = np.unique(np.sort(edges, 1), axis=0, return_counts=True)
    assert (counts == 2).all()


def test_native_speed_large_volume(rng):
    import time

    import pytest

    try:
        from points2surf_tpu.ops import marching_native
    except Exception as e:
        pytest.skip(f"native kernel unavailable: {e}")
    vol = _sphere_field(192, 0.45)
    t0 = time.time()
    v, f = marching_native.marching_tetrahedra(vol, 0.0)
    t_native = time.time() - t0
    assert len(f) > 100000
    assert t_native < 10.0


def test_thin_plate_watertight_both_impls():
    """Regression: gradient-based face orientation flipped faces on thin
    features (centroid central differences sample across a 2-3-voxel
    plate), breaking watertightness. The parity-consistent case table
    must produce watertight, outward-oriented output on a thin plate for
    BOTH the numpy and native kernels."""
    from points2surf_tpu.ops import marching_cubes, marching_native
    from points2surf_tpu.utils.mesh import Mesh

    lin = np.linspace(-1, 1, 64, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = np.minimum(
        0.03 - np.abs(z), 0.5 - np.maximum(np.abs(x), np.abs(y))
    ).astype(np.float32)

    for name, fn in (
        ("numpy", marching_cubes.marching_tetrahedra),
        ("native", marching_native.marching_tetrahedra),
    ):
        v, f = fn(vol, 0.0)
        m = Mesh(v.astype(np.float32), np.asarray(f)).cleaned()
        assert m.is_watertight(), name
        assert m.volume > 0, name  # outward orientation
        # volume ~ plate: 1.0 x 1.0 x 0.06 in field units; vertices are in
        # voxel units (31.5 per unit): 31.5^2 * 1.89 ~ 1877
        assert 1500 < m.volume < 2300, (name, m.volume)


def test_plane_field_is_exact(rng):
    """Linear fields are interpolated EXACTLY by marching tetrahedra (the
    per-tet interpolation is linear), so a plane field pins the extractor's
    geometry — index->vertex placement, edge interpolation, axis order —
    to numerical tolerance. An offset, axis-swap, or rescale bug shows up
    as a constant-distance violation here while cancelling out of
    volume-to-volume parity comparisons (the blind spot this test closes;
    the reference meshes with skimage lewiner, sdf.py:215, unavailable
    offline)."""
    res = 20
    idx = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    for seed in range(5):
        r = np.random.RandomState(seed)
        n = r.randn(3).astype(np.float32)
        n /= np.linalg.norm(n)
        # pass through a point near the grid center: always intersects
        c = float(n.sum() * (res - 1) / 2.0 + (r.rand() - 0.5))
        field = (n[0] * x + n[1] * y + n[2] * z - c).astype(np.float32)
        verts, faces = marching_tetrahedra(field, 0.0)
        assert len(verts) > 10 and len(faces) > 10, seed
        d = verts @ n - c
        assert np.abs(d).max() < 1e-4, (seed, np.abs(d).max())
        # coherent orientation: positive side is "inside", so every face
        # normal must point toward the negative half-space
        v0, v1, v2 = (verts[faces[:, k]] for k in range(3))
        fn = np.cross(v1 - v0, v2 - v0)
        dots = fn @ n
        nz = dots[np.abs(dots) > 1e-9]
        assert (nz < 0).all(), (seed, (nz > 0).mean())


def test_axis_permutation_metamorphic(rng):
    """The Kuhn 6-tet decomposition is symmetric under axis permutations
    (the tets enumerate the 6 axis orderings along the 0->6 diagonal), so
    extracting a permuted field must yield the SAME surface point set with
    coordinates permuted back — a self-consistency oracle independent of
    any analytic field."""
    res = 18
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    # anisotropic blobby field: no accidental symmetry
    field = (
        0.45 - np.sqrt(0.5 * x * x + 1.7 * y * y + 3.1 * z * z)
        + 0.08 * np.sin(4 * x) * np.cos(3 * y)
    ).astype(np.float32)
    base_v, base_f = marching_tetrahedra(field, 0.0)
    assert len(base_v) > 50
    key0 = set(map(tuple, np.round(base_v, 4).tolist()))
    for perm in [(1, 0, 2), (2, 1, 0), (1, 2, 0), (2, 0, 1), (0, 2, 1)]:
        pv, pf = marching_tetrahedra(np.transpose(field, perm), 0.0)
        assert len(pf) == len(base_f), perm
        back = np.empty_like(pv)
        for axis_out, axis_in in enumerate(perm):
            back[:, axis_in] = pv[:, axis_out]
        key = set(map(tuple, np.round(back, 4).tolist()))
        assert key == key0, perm
