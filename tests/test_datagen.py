import configparser
import os

import numpy as np
import pytest

from points2surf_tpu.datagen import make_dataset as mk
from points2surf_tpu.datagen import scanner
from points2surf_tpu.ops.marching_cubes import marching_tetrahedra
from points2surf_tpu.utils import mesh_io
from points2surf_tpu.utils.mesh import Mesh


def _analytic_mesh(kind, res=24):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    if kind == "sphere":
        vol = 0.5 - np.sqrt(x * x + y * y + z * z)
    elif kind == "box":
        vol = 0.4 - np.abs(np.stack([x, y, z])).max(axis=0)
    else:  # ellipsoid
        vol = 0.5 - np.sqrt(x * x + (y / 0.6) ** 2 + (z / 0.8) ** 2)
    v, f = marching_tetrahedra(vol.astype(np.float32), 0.0)
    v = v / (res - 1) * 2.0 - 1.0
    return Mesh(v.astype(np.float32), f)


@pytest.fixture(scope="module")
def raw_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("rawds")
    base = str(d)
    os.makedirs(os.path.join(base, "testds", "00_base_meshes"))
    for kind in ("sphere", "box", "ellipsoid"):
        m = _analytic_mesh(kind)
        mesh_io.write_off(
            os.path.join(base, "testds", "00_base_meshes", kind + ".off"),
            m.vertices, m.faces,
        )
    cfg = configparser.ConfigParser()
    cfg["general"] = {
        "only_for_evaluation": "0",
        "grid_resolution": "64",
        "epsilon": "3",
        "num_scans_per_mesh_min": "3",
        "num_scans_per_mesh_max": "5",
        "scanner_noise_sigma_min": "0.0",
        "scanner_noise_sigma_max": "0.0",
    }
    with open(os.path.join(base, "testds", "settings.ini"), "w") as f:
        cfg.write(f)
    return base


def test_scanner_hits_sphere(rng):
    mesh = _analytic_mesh("sphere")
    locs, rots, sigma = scanner.scan_poses("dummy.ply", 3, 5, 0.0, 0.02)
    assert 3 <= len(locs) <= 5
    assert 0.0 <= sigma <= 0.02
    pts, normals, hits = scanner.scan_mesh(
        mesh, locs[:2], rots[:2], 0.0, res_x=44, res_y=36
    )
    assert pts.shape[0] > 200
    assert pts.shape == normals.shape
    # all scan points lie on the sphere surface
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 0.5, atol=0.02)
    # normals roughly radial
    cos = np.abs(np.einsum("ij,ij->i", normals, pts / r[:, None]))
    assert cos.mean() > 0.95
    assert sum(hits) == pts.shape[0]


def test_scan_poses_deterministic():
    a = scanner.scan_poses("x/mesh_01.ply", 5, 30, 0.0, 0.05)
    b = scanner.scan_poses("y/mesh_01.ply", 5, 30, 0.0, 0.05)  # same basename
    np.testing.assert_array_equal(a[0], b[0])
    c = scanner.scan_poses("x/mesh_02.ply", 5, 30, 0.0, 0.05)
    assert a[0].shape != c[0].shape or not np.allclose(a[0], c[0])


@pytest.mark.slow
def test_make_dataset_pipeline(raw_dataset, monkeypatch):
    # shrink the scanner for test speed
    monkeypatch.setattr(scanner, "TOF_RES_X", 44)
    monkeypatch.setattr(scanner, "TOF_RES_Y", 36)
    mk.make_dataset("testds", base_dir=raw_dataset, num_processes=1,
                    num_query_pts=500)

    ds = os.path.join(raw_dataset, "testds")
    for sub in ("01_base_meshes_ply", "02_meshes_cleaned", "03_meshes",
                "04_pts", "05_query_pts", "05_query_dist"):
        assert os.path.isdir(os.path.join(ds, sub)), sub

    pts_files = sorted(os.listdir(os.path.join(ds, "04_pts")))
    assert len(pts_files) == 3
    pts = np.load(os.path.join(ds, "04_pts", pts_files[0]))
    assert pts.shape[1] == 6 and pts.dtype == np.float32  # xyz + normals
    assert np.abs(pts[:, :3]).max() <= 0.75  # normalized mesh + margin

    # GT signed distances of the sphere must match the analytic SDF
    qp = np.load(os.path.join(ds, "05_query_pts", "sphere.ply.npy"))
    qd = np.load(os.path.join(ds, "05_query_dist", "sphere.ply.npy"))
    # normalized sphere: diameter 1 -> radius 0.5 after unit-cube scaling
    want = 0.5 - np.linalg.norm(qp, axis=1)
    np.testing.assert_allclose(qd, want, atol=0.05)

    for split in ("trainset.txt", "valset.txt", "testset.txt"):
        assert os.path.isfile(os.path.join(ds, split))

    # resumability: second run is a no-op (mtimes satisfied)
    import time

    t0 = time.time()
    mk.make_dataset("testds", base_dir=raw_dataset, num_processes=1,
                    num_query_pts=500)
    assert time.time() - t0 < 5.0


def test_blensor_merge_back_roundtrip(tmp_path, rng):
    """Synthetic BlenSor scans fed through pcd_files_to_pts must land back
    in model space matching the native scanner's output convention
    (reference _pcd_files_to_pts + _blensor_vs_to_ws,
    make_dataset.py:124-239)."""
    import gzip

    from points2surf_tpu.datagen import blensor
    from points2surf_tpu.datagen.scanner import _quat_to_rotmat_np

    mesh = _analytic_mesh("sphere")
    mesh_file = str(tmp_path / "shape.ply")
    mesh_io.write_ply(mesh_file, mesh.vertices, mesh.faces)

    # known model-space surface points per scan + the poses that viewed them
    locations, rotations, _ = scanner.scan_poses(mesh_file, 2, 3, 0.0, 0.0)
    pts_ms, _ = mesh.sample_surface(40, rng)
    pcd_files = []
    for i, (loc, quat) in enumerate(zip(locations, rotations)):
        rot = _quat_to_rotmat_np(quat)
        world = pts_ms @ rot.T + loc  # object posed in front of the camera
        # inverse of right_handed_to_left_handed: (x, y, z) -> (x, z, -y)
        vs = np.stack([world[:, 0], world[:, 2], -world[:, 1]], axis=1)
        raw = np.zeros((len(vs) + 1, 16), np.float32)
        raw[:-1, 3] = 1.0  # hits; the extra row is a miss (distance 0)
        raw[:-1, 5:8] = vs
        raw[:-1, 8:11] = vs  # noise-free == noisy (sigma 0)
        path = str(tmp_path / f"scan_{i:05d}00000.numpy.gz")
        with gzip.GzipFile(path, "w") as fh:
            np.savetxt(fh, raw)
        pcd_files.append(path)

    out_npy = str(tmp_path / "04_pts" / "shape.xyz.npy")
    ok = blensor.pcd_files_to_pts(
        pcd_files, mesh_file,
        str(tmp_path / "shape.xyz.npz"), out_npy,
        str(tmp_path / "shape.xyz.ply"),
        list(locations), list(rotations),
        str(tmp_path / "shape_hits.npz"),
    )
    assert ok
    merged = np.load(out_npy)
    n_scans = len(pcd_files)
    assert merged.shape == (40 * n_scans, 6)
    want = np.tile(pts_ms, (n_scans, 1))
    np.testing.assert_allclose(merged[:, :3], want, atol=1e-4)
    # normals must be true face normals of faces near each point
    norms = np.linalg.norm(merged[:, 3:], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # for a sphere, normal ~ radial direction
    radial = want / np.linalg.norm(want, axis=1, keepdims=True)
    cos = np.abs(np.sum(merged[:, 3:] * radial, axis=1))
    assert cos.min() > 0.8
    hits = np.load(str(tmp_path / "shape_hits.npz"))["hits_per_scan"]
    assert (hits == 40).all()


def test_blensor_missing_scan_keeps_pose_pairing(tmp_path, rng, monkeypatch):
    """A missing scan file must drop ITS pose, not shift every later scan
    onto the previous scan's pose (scan index <-> pose pairing)."""
    from points2surf_tpu.datagen import blensor

    mesh = _analytic_mesh("sphere")
    dir_in = tmp_path / "ds" / "03_meshes"
    os.makedirs(dir_in)
    mesh_io.write_ply(str(dir_in / "shape.ply"), mesh.vertices, mesh.faces)

    locations, rotations, _ = scanner.scan_poses(
        str(dir_in / "shape.ply"), 4, 4, 0.0, 0.0
    )
    n_scans = len(locations)
    assert n_scans == 4

    # pretend Blender ran but scan 1 is missing
    pcd_dir = tmp_path / "ds" / "04_pcd"
    os.makedirs(pcd_dir)
    import gzip

    present = [0, 2, 3]
    for i in present:
        raw = np.zeros((3, 16), np.float32)
        raw[:, 3] = 1.0
        raw[:, 5:8] = raw[:, 8:11] = rng.rand(3, 3)
        with gzip.GzipFile(
            str(pcd_dir / f"shape_{i:05d}00000.numpy.gz"), "w"
        ) as fh:
            np.savetxt(fh, raw)

    captured = {}

    def fake_merge(pcd_files, mesh_file, raw, npy, vis, locs, rots, hits,
                   min_pts_size):
        captured["files"] = list(pcd_files)
        captured["locs"] = [np.asarray(l) for l in locs]
        captured["rots"] = [np.asarray(r) for r in rots]
        return True

    monkeypatch.setattr(blensor, "pcd_files_to_pts", fake_merge)
    monkeypatch.setattr(blensor, "run_blensor", lambda *a, **k: [])
    blensor.sample_blensor(
        str(tmp_path), "ds", "blender", "03_meshes", "04_pts", "04_pts_vis",
        4, 4, 0.0, 0.0, num_processes=1,
    )
    assert len(captured["files"]) == 3
    for j, i in enumerate(present):
        assert f"{i:05d}00000" in os.path.basename(captured["files"][j])
        np.testing.assert_array_equal(captured["locs"][j], locations[i])
        np.testing.assert_array_equal(captured["rots"][j], rotations[i])
