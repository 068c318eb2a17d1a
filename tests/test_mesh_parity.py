"""Mesh-level parity oracle against the reference volume pipeline.

The strongest egress-free stand-in for the north-star Chamfer comparison
(BASELINE.md): both volume pipelines consume IDENTICAL prediction values,
so the comparison isolates everything downstream of the network — splat
(reference sdf.py:82-111 vs ops/voxel.splat_to_volume), iterative sign
propagation (sdf.py:114-178 vs ops/voxel.propagate_sign), clamping,
isosurface extraction, and the voxel->model vertex rescale (sdf.py:224 vs
infer/meshing._extract_and_write). Prediction-stage parity is covered
separately by test_reference_parity.py (both full pipelines through the
same converted checkpoint, corr > 0.95); together the two oracles compose
into end-to-end mesh-level parity.

skimage/trimesh are not installed here, so the reference's literal
``marching_cubes_lewiner`` call (sdf.py:215) cannot run; the reference
volume is meshed by OUR extractor with the reference's OWN rescale
formula. Everything upstream of that call — add_samples_to_volume,
propagate_sign, the clamp — is the reference's numpy/scipy code executed
verbatim from the read-only mount.

Three prediction fields:
  * analytic sphere SDF (clean zero crossing, flood-free) — the
    meaningful relative-Chamfer criterion vs ground truth;
  * winding-number-signed field on the real abc_minimal shape at grid
    128 (realistic CAD query pattern; thin features make it flood-prone,
    which stresses the propagation exactly where round-3 found the
    failure cliff);
  * a seeded sign-corrupted variant (near-surface flips + value jitter)
    — adversarial input for the certainty-threshold iteration.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
ABC = "/root/repo/datasets/abc_minimal"
GT_MESH = (
    ABC + "/03_meshes/00011084_fddd53ce45f640f3ab922328_trimesh_019.ply"
)

pytestmark = pytest.mark.slow

SIGMA = 5
CERTAINTY = 13


@pytest.fixture(scope="module")
def ref_sdf():
    import os

    if not os.path.isdir(REF + "/source"):
        pytest.skip("reference repo not mounted")
    # the reference predates numpy 1.24: restore the aliases it uses
    for alias, real in (("int", int), ("float", float), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, real)
    if "trimesh" not in sys.modules:
        fake = types.ModuleType("trimesh")
        fake.Trimesh = type("Trimesh", (), {})
        fake.transformations = types.ModuleType("trimesh.transformations")
        sys.modules["trimesh"] = fake
        sys.modules["trimesh.transformations"] = fake.transformations
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import source.sdf as mod

    return mod


def _reference_volume(ref_sdf, q_pts, q_dist, grid_res):
    """The reference's own volume code, verbatim (sdf.py:181-213 without
    the file IO): splat -> propagate_sign -> clamp."""
    vol = np.zeros((grid_res, grid_res, grid_res))
    vol = ref_sdf.add_samples_to_volume(
        vol, q_pts.astype(np.float64), q_dist.astype(np.float64)
    )
    vol = ref_sdf.propagate_sign(vol, SIGMA, CERTAINTY)
    return np.clip(vol, -1.0, 1.0)


def _our_volume(q_pts, q_dist, grid_res):
    from points2surf_tpu.infer import meshing

    pts_pad, dist_pad, n_q = meshing._pad_queries(q_pts, q_dist)
    return np.asarray(
        meshing._build_volume(
            jnp.asarray(pts_pad), jnp.asarray(dist_pad), n_q,
            grid_res, SIGMA, CERTAINTY,
        )
    )


def _mesh_reference_volume(vol, grid_res):
    """Mesh a reference-pipeline volume: our extractor + the reference's
    own voxel->model rescale (sdf.py:224)."""
    from points2surf_tpu.ops import marching_cubes

    v, f = marching_cubes.extract_isosurface(vol.astype(np.float32), 0.0)
    v = (((v + 0.5) / float(grid_res)) - 0.5) * 2.0
    return v, f


def _run_both_pipelines(ref_sdf, q_pts, q_dist, grid_res, tmp_path, tag):
    """Returns (ref mesh, our mesh) after asserting volume equivalence."""
    from points2surf_tpu.infer import meshing
    from points2surf_tpu.utils import mesh_io

    vol_ref = _reference_volume(ref_sdf, q_pts, q_dist, grid_res)
    vol_ours = _our_volume(q_pts, q_dist, grid_res)

    # splat + propagation + clamp parity, voxel by voxel
    mismatch = float(np.mean(np.sign(vol_ref) != np.sign(vol_ours)))
    assert mismatch == 0.0, f"{tag}: sign mismatch fraction {mismatch}"
    np.testing.assert_allclose(
        vol_ours, vol_ref, atol=1e-6,
        err_msg=f"{tag}: volume values diverge",
    )

    # production meshing path (device splat/propagate + extract + IO)
    mc_file = str(tmp_path / f"{tag}_ours.ply")
    ok = meshing.implicit_surface_to_mesh(
        q_dist, q_pts, str(tmp_path / f"{tag}_vol.off"), mc_file,
        grid_res, SIGMA, CERTAINTY,
    )
    assert ok, f"{tag}: production meshing produced no mesh"
    v_ours, f_ours = mesh_io.load_mesh(mc_file)
    v_ref, f_ref = _mesh_reference_volume(vol_ref, grid_res)
    assert len(v_ref) and len(f_ref)
    return (v_ref, f_ref), (v_ours, f_ours)


def _chamfer(mesh_a, mesh_b, seed_a, seed_b, n=10000):
    from points2surf_tpu.evalx import metrics

    sa = metrics.sample_mesh_surface(*mesh_a, n, np.random.RandomState(seed_a))
    sb = metrics.sample_mesh_surface(*mesh_b, n, np.random.RandomState(seed_b))
    return metrics.chamfer_distance(sa, sb)


def test_mesh_parity_sphere(ref_sdf, tmp_path):
    """Analytic sphere SDF on a real near-surface voxel query pattern:
    clean zero crossing, so the relative criterion is meaningful — the
    Chamfer between the two reconstructions must be far below each one's
    Chamfer to the true surface."""
    from points2surf_tpu.ops import voxel

    grid = 96
    radius = 0.55
    rng = np.random.RandomState(0)
    # fibonacci-ish sphere cloud stands in for the scan
    n_cloud = 20000
    dirs = rng.randn(n_cloud, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    cloud = dirs * radius
    q_pts = voxel.grid_query_points(cloud, grid, threshold_vs=3)
    assert len(q_pts) > 5000
    # positive INSIDE (trimesh/reference convention)
    q_dist = (radius - np.linalg.norm(q_pts, axis=1)).astype(np.float32)

    mesh_ref, mesh_ours = _run_both_pipelines(
        ref_sdf, q_pts, q_dist, grid, tmp_path, "sphere"
    )

    # ground truth: dense uniform sphere samples
    gt_dirs = np.random.RandomState(3).randn(10000, 3)
    gt_dirs /= np.linalg.norm(gt_dirs, axis=1, keepdims=True)
    gt = (gt_dirs * radius, np.zeros((0, 3), np.int64))

    ch_ref_ours = _chamfer(mesh_ref, mesh_ours, 17, 18)
    from points2surf_tpu.evalx import metrics

    s_ours = metrics.sample_mesh_surface(
        *mesh_ours, 10000, np.random.RandomState(18)
    )
    s_ref = metrics.sample_mesh_surface(
        *mesh_ref, 10000, np.random.RandomState(17)
    )
    d_ours_gt = float(
        np.abs(np.linalg.norm(s_ours, axis=1) - radius).sum() * 2
    )
    d_ref_gt = float(np.abs(np.linalg.norm(s_ref, axis=1) - radius).sum() * 2)
    # both reconstructions sit within a voxel of the true sphere...
    assert d_ours_gt / 20000 < 2.0 / grid
    assert d_ref_gt / 20000 < 2.0 / grid
    # ...and their mutual Chamfer is indistinguishable from the
    # surface-sampling noise floor (two independent samplings of the SAME
    # mesh) — identical volumes + shared marcher means the surfaces are
    # the same; only the 10k-sample draw differs.
    s_ours2 = metrics.sample_mesh_surface(
        *mesh_ours, 10000, np.random.RandomState(23)
    )
    noise_floor = metrics.chamfer_distance(s_ours, s_ours2)
    assert ch_ref_ours < 1.5 * noise_floor, (ch_ref_ours, noise_floor)


def _winding_field(q_pts, verts, faces, tri_chunk=2048):
    """Winding-number sign x nearest-vertex magnitude — a deterministic,
    network-free stand-in with realistic SDF magnitudes (positive inside,
    reference convention)."""
    import functools

    from scipy import spatial

    from points2surf_tpu.ops.meshdist import _solid_angle

    ta = jnp.asarray(verts[faces[:, 0]])
    tb = jnp.asarray(verts[faces[:, 1]])
    tc = jnp.asarray(verts[faces[:, 2]])

    @functools.partial(jax.jit, static_argnames=("chunk",))
    def winding(qc, ta, tb, tc, chunk=tri_chunk):
        fp = ta.shape[0]
        nch = -(-fp // chunk)
        pad = nch * chunk - fp
        ta = jnp.concatenate([ta, jnp.zeros((pad, 3), ta.dtype)])
        tb = jnp.concatenate([tb, jnp.zeros((pad, 3), tb.dtype)])
        tc = jnp.concatenate([tc, jnp.zeros((pad, 3), tc.dtype)])

        def body(wind, ci):
            s = ci * chunk
            aa = jax.lax.dynamic_slice(ta, (s, 0), (chunk, 3))
            bb = jax.lax.dynamic_slice(tb, (s, 0), (chunk, 3))
            cc = jax.lax.dynamic_slice(tc, (s, 0), (chunk, 3))
            col = s + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            om = _solid_angle(qc[:, None, :], aa[None], bb[None], cc[None])
            om = jnp.where(col < fp, om, 0.0)
            return wind + jnp.sum(om, axis=1), None

        wind, _ = jax.lax.scan(
            body, jnp.zeros((qc.shape[0],), jnp.float32), jnp.arange(nch)
        )
        return wind / (4.0 * jnp.pi)

    B = 8192
    winds = []
    for s in range(0, len(q_pts), B):
        chunk_q = q_pts[s : s + B]
        pad = B - len(chunk_q)
        if pad:
            chunk_q = np.concatenate(
                [chunk_q, np.zeros((pad, 3), np.float32)]
            )
        w = np.asarray(winding(jnp.asarray(chunk_q), ta, tb, tc))
        winds.append(w[: B - pad] if pad else w)
    wind = np.concatenate(winds)
    mag, _ = spatial.cKDTree(verts).query(q_pts, 1)
    sign = np.where(np.abs(wind) > 0.5, 1.0, -1.0)
    return (sign * mag).astype(np.float32)


def test_mesh_parity_abc_grid128(ref_sdf, tmp_path):
    """Real abc_minimal test shape at grid 128 (the VERDICT-specified
    resolution): both pipelines over the full near-surface voxel set.
    The winding field's coin-flip signs on sub-voxel thin features make
    this a flood-regime propagation stress — the volumes must STILL agree
    voxel-for-voxel, and the two reconstructions must agree far more
    tightly than either matches ground truth."""
    from points2surf_tpu.data.shapes import ShapeStore
    from points2surf_tpu.utils import mesh_io

    grid = 128
    st = ShapeStore(
        ABC, "testset.txt", with_query=True, reconstruction=True,
        query_grid_resolution=grid, epsilon=3, cache_capacity=2,
    )
    q_pts = st.get(0).query_pts
    assert len(q_pts) > 50000  # full grid-128 near-surface set
    gt_v, gt_f = mesh_io.load_mesh(GT_MESH)
    q_dist = _winding_field(q_pts, gt_v, gt_f)

    mesh_ref, mesh_ours = _run_both_pipelines(
        ref_sdf, q_pts, q_dist, grid, tmp_path, "abc128"
    )
    ch_ref_ours = _chamfer(mesh_ref, mesh_ours, 17, 18)
    ch_ours_gt = _chamfer(mesh_ours, (gt_v, gt_f), 18, 19)
    ch_ref_gt = _chamfer(mesh_ref, (gt_v, gt_f), 17, 19)
    assert ch_ref_ours < 0.2 * min(ch_ours_gt, ch_ref_gt), (
        ch_ref_ours, ch_ours_gt, ch_ref_gt,
    )

    # adversarial variant: seeded near-surface sign flips + value jitter
    # (the round-3 flood mechanism, docs/VALIDATION.md) — parity must
    # survive the certainty-threshold iteration's worst case
    rng = np.random.RandomState(5)
    noisy = q_dist.copy()
    flip = (np.abs(q_dist) < 0.02) & (rng.rand(len(q_dist)) < 0.02)
    noisy[flip] = -noisy[flip]
    noisy = (noisy + rng.randn(len(q_dist)).astype(np.float32) * 0.002).astype(
        np.float32
    )
    mesh_ref_n, mesh_ours_n = _run_both_pipelines(
        ref_sdf, q_pts, noisy, grid, tmp_path, "abc128_noisy"
    )
    ch = _chamfer(mesh_ref_n, mesh_ours_n, 21, 22)
    ch_gt = _chamfer(mesh_ours_n, (gt_v, gt_f), 22, 19)
    assert ch < 0.2 * ch_gt, (ch, ch_gt)
