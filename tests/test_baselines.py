"""Baseline-comparison tooling (evalx/baselines.py) and the point-cloud-only
dataset factory (datagen/make_pc_dataset.py) — the two C18/C19 modules with
no direct tests until now."""

import os

import numpy as np
import pytest

from points2surf_tpu.utils import mesh_io


def _icosphere(radius=0.5, subdiv=2):
    from points2surf_tpu.datagen.procedural import icosphere

    v, f = icosphere(subdivisions=subdiv)
    return (v * radius).astype(np.float32), f


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_get_pts_normals_radial_on_sphere(tmp_path, rng):
    """Exact closest-face normals of points on a sphere must be radial
    (reference utils.get_pts_normals :109-164 via the exact primitive)."""
    from points2surf_tpu.evalx.baselines import get_pts_normals

    v, f = _icosphere()
    ds = tmp_path / "ds"
    (ds / "04_pts").mkdir(parents=True)
    (ds / "03_meshes").mkdir()
    mesh_io.write_ply(str(ds / "03_meshes" / "s.ply"), v, f)
    dirs = rng.randn(100, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = (0.5 * dirs).astype(np.float32)
    np.save(ds / "04_pts" / "s.xyz.npy", pts)

    get_pts_normals(str(tmp_path), "ds", "04_pts", "03_meshes", "06_normals")
    normals = np.load(ds / "06_normals" / "s.xyz.npy")
    assert normals.shape == (100, 3)
    # faceted icosphere: face normal vs radial direction within ~15 deg
    cos = np.abs((normals * dirs).sum(1))
    assert cos.min() > 0.96
    # xyz sidecar written with normals attached
    assert (ds / "06_normals" / "pts" / "s.xyz").is_file()

    # incremental: second call is a no-op (mtime preserved)
    m = os.path.getmtime(ds / "06_normals" / "s.xyz.npy")
    get_pts_normals(str(tmp_path), "ds", "04_pts", "03_meshes", "06_normals")
    assert os.path.getmtime(ds / "06_normals" / "s.xyz.npy") == m


def test_revert_atlasnet_transform_roundtrip(tmp_path, rng):
    """Applying AtlasNet's normalization then reverting must round-trip
    (reference figure/compare_dir_of_meshes.py:12-45)."""
    from points2surf_tpu.evalx.baselines import revert_atlasnet_transform

    pts = (rng.rand(500, 3) * np.array([2.0, 1.0, 3.0]) + 5.0).astype(
        np.float32
    )
    pts_file = str(tmp_path / "cloud.xyz.npy")
    np.save(pts_file, pts)

    lo, hi = pts.min(0), pts.max(0)
    center = (lo + hi) / 2.0
    scale = float(np.linalg.norm(pts - center, axis=1).max())
    verts_model = rng.rand(40, 3).astype(np.float32)
    verts_atlasnet = (verts_model - center) / scale
    back = revert_atlasnet_transform(verts_atlasnet, pts_file)
    np.testing.assert_allclose(back, verts_model, atol=1e-5)


def test_make_pc_dataset_pipeline(tmp_path, rng):
    """Raw clouds in mixed formats -> normalized sub-sampled 04_pts npys +
    testset.txt (reference make_pc_dataset.py)."""
    from points2surf_tpu.datagen.make_pc_dataset import make_pc_dataset

    ds = tmp_path / "pcds"
    raw = ds / "00_base_pc"
    raw.mkdir(parents=True)
    big = (rng.rand(3000, 3) * 4.0 + 10.0).astype(np.float32)
    np.save(raw / "a.npy", big)
    mesh_io.write_xyz(str(raw / "b.xyz"), rng.rand(50, 3).astype(np.float32))

    make_pc_dataset("pcds", base_dir=str(tmp_path), target_num_points=1000)

    a = np.load(ds / "04_pts" / "a.xyz.npy")
    b = np.load(ds / "04_pts" / "b.xyz.npy")
    assert a.shape == (1000, 3)  # sub-sampled
    assert b.shape == (50, 3)  # small cloud kept whole
    # unit-cube normalization: centered, max extent 1
    for arr in (a, b):
        lo, hi = arr.min(0), arr.max(0)
        assert np.abs(lo + hi).max() < 0.2
        assert 0.5 < (hi - lo).max() <= 1.0 + 1e-6
    ts = (ds / "testset.txt").read_text().split()
    assert sorted(ts) == ["a", "b"]


def test_compare_dirs_of_meshes_csv(tmp_path, rng):
    """Multi-method Chamfer CSV (reference compare_dir_of_meshes.py:48-104):
    a perfect copy must score ~0, a shifted copy worse."""
    from points2surf_tpu.evalx.baselines import compare_dirs_of_meshes

    v, f = _icosphere()
    ref = tmp_path / "ref"
    good = tmp_path / "good"
    bad = tmp_path / "bad"
    for d in (ref, good, bad):
        d.mkdir()
    mesh_io.write_ply(str(ref / "s.ply"), v, f)
    mesh_io.write_ply(str(good / "s.ply"), v, f)
    mesh_io.write_ply(str(bad / "s.ply"), v + 0.25, f)

    report = tmp_path / "cmp.csv"
    compare_dirs_of_meshes(
        {"good": str(good), "bad": str(bad)}, str(ref), str(report),
        samples_per_model=2000,
    )
    lines = report.read_text().strip().splitlines()
    assert lines[0] == "shape,good,bad"
    row = lines[1].split(",")
    assert row[0] == "s"
    assert float(row[1]) < float(row[2])
