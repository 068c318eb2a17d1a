"""Pipelined meshing directory driver (infer/meshing.py).

Covers the round-2 driver rewrite: query-count bucketing (_pad_queries),
f16 volume fetch, device/host pipelining, call_necessary skip, and the
all-zeros input guard — against the single-shape path as oracle
(reference sdf.py:241-266 semantics)."""

import os

import numpy as np
import pytest

from points2surf_tpu.infer import meshing
from points2surf_tpu.ops import voxel
from points2surf_tpu.utils import mesh_io

GRID = 32


def _sphere_queries(radius, n_pts=4000, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32)
    pts *= radius / np.linalg.norm(pts, axis=1, keepdims=True)
    q = voxel.grid_query_points(pts, GRID, 3)
    dist = (radius - np.linalg.norm(q, axis=1)).astype(np.float32)
    return q.astype(np.float32), dist


@pytest.fixture
def rec_dirs(tmp_path):
    dist_dir = tmp_path / "dist_ms"
    pts_dir = tmp_path / "query_pts_ms"
    dist_dir.mkdir()
    pts_dir.mkdir()
    for name, radius in (("a", 0.4), ("b", 0.55)):
        q, d = _sphere_queries(radius, seed=hash(name) % 1000)
        np.save(pts_dir / f"{name}.xyz.npy", q)
        np.save(dist_dir / f"{name}.xyz.npy", d)
    # an all-zeros shape must be skipped with a warning, not crash
    q, _ = _sphere_queries(0.3, seed=7)
    np.save(pts_dir / "zeros.xyz.npy", q)
    np.save(dist_dir / "zeros.xyz.npy", np.zeros(len(q), np.float32))
    return str(dist_dir), str(pts_dir), str(tmp_path / "vol"), str(tmp_path / "mesh")


def test_pad_queries_buckets():
    pts = np.zeros((1000, 3), np.float32)
    dist = np.ones(1000, np.float32)
    pp, dd, n = meshing._pad_queries(pts, dist)
    assert n == 1000
    assert pp.shape[0] == dd.shape[0] == 131072  # floor bucket
    assert (dd[:1000] == 1.0).all() and (dd[1000:] == 0.0).all()

    big = np.zeros((200_000, 3), np.float32)
    pp, _, _ = meshing._pad_queries(big, np.ones(200_000, np.float32))
    assert pp.shape[0] == 262144  # next power of two

    exact = np.zeros((131072, 3), np.float32)
    pp, _, _ = meshing._pad_queries(exact, np.ones(131072, np.float32))
    assert pp.shape[0] == 131072  # no copy needed


def test_directory_driver_matches_single_path(rec_dirs, tmp_path, capsys):
    dist_dir, pts_dir, vol_dir, mesh_dir = rec_dirs
    meshing.implicit_surface_to_mesh_directory(
        dist_dir, pts_dir, vol_dir, mesh_dir, GRID, 5, 13
    )
    # zeros shape skipped with a warning; the two real shapes meshed
    out = capsys.readouterr().out
    assert "contains only zeros" in out
    assert sorted(os.listdir(mesh_dir)) == ["a.ply", "b.ply"]
    assert sorted(os.listdir(vol_dir)) == ["a.off", "b.off"]

    for name, radius in (("a", 0.4), ("b", 0.55)):
        # oracle: the (committed, e2e-validated) single-shape path
        d = np.load(os.path.join(dist_dir, f"{name}.xyz.npy"))
        q = np.load(os.path.join(pts_dir, f"{name}.xyz.npy"))
        ok = meshing.implicit_surface_to_mesh(
            d, q, str(tmp_path / "o.off"), str(tmp_path / "o.ply"), GRID, 5, 13
        )
        assert ok
        v_dir, f_dir = mesh_io.load_mesh(os.path.join(mesh_dir, f"{name}.ply"))
        v_one, f_one = mesh_io.load_mesh(str(tmp_path / "o.ply"))
        # f16 volume fetch: iso-crossing shift < 0.002 voxel -> verts agree
        assert v_dir.shape == v_one.shape
        assert f_dir.shape == f_one.shape
        np.testing.assert_allclose(v_dir, v_one, atol=2e-3 * 2.0 / GRID)
        r = np.linalg.norm(v_dir, axis=1)
        assert abs(np.median(r) - radius) < 2.5 / GRID


def test_directory_driver_incremental_skip(rec_dirs, capsys):
    dist_dir, pts_dir, vol_dir, mesh_dir = rec_dirs
    meshing.implicit_surface_to_mesh_directory(
        dist_dir, pts_dir, vol_dir, mesh_dir, GRID, 5, 13
    )
    mtimes = {
        f: os.path.getmtime(os.path.join(mesh_dir, f))
        for f in os.listdir(mesh_dir)
    }
    capsys.readouterr()
    # second run: call_necessary sees fresh outputs and does nothing
    meshing.implicit_surface_to_mesh_directory(
        dist_dir, pts_dir, vol_dir, mesh_dir, GRID, 5, 13
    )
    assert "Isosurface extraction" not in capsys.readouterr().out
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(mesh_dir, f)) == m


def test_flood_warning_on_overflowing_reconstruction(tmp_path, capsys):
    """A reconstruction extending far beyond the queried volume prints
    the flood diagnostic (docs/VALIDATION.md round 3); a contained one
    does not."""
    import numpy as np

    from points2surf_tpu.infer.meshing import _extract_and_write

    res = 32
    vol = -np.ones((res, res, res), np.float32)
    vol[4:28, 4:28, 4:28] = 1.0  # big inside blob spanning most of grid
    out = str(tmp_path / "m.ply")
    # queried region is a tiny corner -> blob overflows it
    q = np.array([[-0.9, -0.9, -0.9], [-0.8, -0.8, -0.8]], np.float32)
    assert _extract_and_write(vol, out, res, q)
    assert "sign-propagation flooding" in capsys.readouterr().out
    # queried region covers the blob -> no warning
    q2 = np.array([[-0.95, -0.95, -0.95], [0.95, 0.95, 0.95]], np.float32)
    assert _extract_and_write(vol, str(tmp_path / "m2.ply"), res, q2)
    assert "flooding" not in capsys.readouterr().out


def test_seed_filter_env_lever(rec_dirs, monkeypatch, capsys):
    """P2S_SEED_FILTER reaches the directory driver's volume build
    (VERDICT round 4 weak #1: the containment pre-pass must be enablable
    on production evals without code changes): valid values are announced
    and passed to _build_volume; garbage falls back to off with a warning;
    an explicit seed_filter argument bypasses the env."""
    from points2surf_tpu.infer import meshing as m

    seen = []
    real = m._build_volume

    def spy(*a, **k):
        seen.append(a[6] if len(a) > 6 else k.get("seed_filter", 0))
        return real(*a, **k)

    monkeypatch.setattr(m, "_build_volume", spy)
    dist_dir, pts_dir, vol_dir, mesh_dir = rec_dirs

    monkeypatch.setenv("P2S_SEED_FILTER", "2")
    m.implicit_surface_to_mesh_directory(
        dist_dir, pts_dir, vol_dir, mesh_dir, GRID, 5, 13
    )
    assert seen and all(s == 2 for s in seen)
    assert "seed_filter=2" in capsys.readouterr().out
    assert sorted(os.listdir(mesh_dir)) == ["a.ply", "b.ply"]

    seen.clear()
    monkeypatch.setenv("P2S_SEED_FILTER", "nope")
    m.implicit_surface_to_mesh_directory(
        dist_dir, pts_dir, str(vol_dir) + "2", str(mesh_dir) + "2",
        GRID, 5, 13,
    )
    assert seen and all(s == 0 for s in seen)
    assert "not an integer" in capsys.readouterr().out

    seen.clear()
    m.implicit_surface_to_mesh_directory(
        dist_dir, pts_dir, str(vol_dir) + "3", str(mesh_dir) + "3",
        GRID, 5, 13, seed_filter=4,
    )
    assert seen and all(s == 4 for s in seen)
