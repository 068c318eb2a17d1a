import os

import numpy as np

from points2surf_tpu.utils import file_utils, mesh_io


def test_ply_roundtrip_binary(tmp_path, rng):
    v = rng.rand(50, 3).astype(np.float32)
    f = rng.randint(0, 50, (30, 3)).astype(np.int64)
    p = str(tmp_path / "m.ply")
    mesh_io.write_ply(p, v, f)
    v2, f2 = mesh_io.read_ply(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_ply_roundtrip_ascii(tmp_path, rng):
    v = rng.rand(20, 3).astype(np.float32)
    f = rng.randint(0, 20, (10, 3)).astype(np.int64)
    p = str(tmp_path / "m.ply")
    mesh_io.write_ply(p, v, f, binary=False)
    v2, f2 = mesh_io.read_ply(p)
    np.testing.assert_allclose(v2, v, rtol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_ply_with_colors_and_normals(tmp_path, rng):
    v = rng.rand(20, 3).astype(np.float32)
    c = rng.rand(20, 3)
    n = rng.rand(20, 3).astype(np.float32)
    p = str(tmp_path / "c.ply")
    mesh_io.write_ply(p, v, colors=c, normals=n)
    v2, f2 = mesh_io.read_ply(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    assert len(f2) == 0


def test_off_roundtrip(tmp_path, rng):
    v = rng.rand(15, 3).astype(np.float32)
    f = rng.randint(0, 15, (8, 3)).astype(np.int64)
    p = str(tmp_path / "m.off")
    mesh_io.write_off(p, v, f)
    v2, f2 = mesh_io.read_off(p)
    np.testing.assert_allclose(v2, v, rtol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_coff_colors(tmp_path, rng):
    v = rng.rand(10, 3).astype(np.float32)
    colors = rng.rand(10, 3)
    p = str(tmp_path / "c.off")
    mesh_io.write_off(p, v, np.array([]), colors_vertex=colors)
    v2, f2 = mesh_io.read_off(p)
    np.testing.assert_allclose(v2, v, rtol=1e-5)


def test_xyz_roundtrip(tmp_path, rng):
    pts = rng.rand(25, 3).astype(np.float32)
    p = str(tmp_path / "p.xyz")
    mesh_io.write_xyz(p, pts)
    back = mesh_io.load_xyz(p)
    np.testing.assert_allclose(back, pts, rtol=1e-5)


def test_load_xyz_drops_nan_rows(tmp_path):
    p = str(tmp_path / "n.xyz")
    with open(p, "w") as f:
        f.write("0 0 0\n1 nan 1\n2 2 2\n")
    pts = mesh_io.load_xyz(p)
    assert pts.shape == (2, 3)


def test_pcd_reader(tmp_path):
    p = str(tmp_path / "s.pcd")
    with open(p, "w") as f:
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\nFIELDS x y z rgb label\nSIZE 4 4 4 4 4\n"
            "TYPE F F F F U\nCOUNT 1 1 1 1 1\nWIDTH 3\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 3\nDATA ascii\n"
            "1 2 3 0 0\nnan nan nan 0 0\n4 5 6 0 0\n"
        )
    pts, header = mesh_io.load_pcd(p)
    assert pts.shape == (2, 3)  # NaN row dropped
    assert header["POINTS"] == "3"


def test_call_necessary(tmp_path):
    a = tmp_path / "in.txt"
    b = tmp_path / "out.txt"
    a.write_text("x")
    assert file_utils.call_necessary(str(a), str(b))  # output missing
    import time

    time.sleep(0.01)
    b.write_text("y")
    assert not file_utils.call_necessary(str(a), str(b))
    time.sleep(0.01)
    a.write_text("xx")  # input newer again
    assert file_utils.call_necessary(str(a), str(b))


def test_filename_to_hash_deterministic():
    h1 = file_utils.filename_to_hash("/a/b/mesh_01.ply")
    h2 = file_utils.filename_to_hash("/other/path/mesh_01.ply")
    h3 = file_utils.filename_to_hash("/a/b/mesh_02.ply")
    assert h1 == h2  # basename-keyed
    assert h1 != h3
    assert 0 <= h1 < 2**32


def test_npz_helpers(tmp_path, rng):
    arr = rng.rand(10, 4)
    p = str(tmp_path / "a.npz")
    file_utils.save_npz(p, arr)
    np.testing.assert_allclose(file_utils.load_npz(p), arr)


def test_download_from_local_zip(tmp_path, monkeypatch):
    """--from_local_zip installs pre-staged reference zips into the
    dataset/model layout without network (the real-data readiness path;
    the actual zips are unreachable from this host)."""
    import io
    import zipfile

    import numpy as np

    from points2surf_tpu.cli import download

    # synthetic dataset zip with the reference's internal layout
    staging = tmp_path / "zips"
    staging.mkdir()
    pts = np.zeros((10, 3), np.float32)
    buf = io.BytesIO()
    np.save(buf, pts)
    with zipfile.ZipFile(staging / download.DATASETS["abc"], "w") as z:
        z.writestr("abc/04_pts/x.xyz.npy", buf.getvalue())
        z.writestr("abc/testset.txt", "x\n")
    with zipfile.ZipFile(staging / download.MODELS["vanilla"], "w") as z:
        z.writestr("vanilla_model_149.pth", b"stub")
        z.writestr("vanilla_params.pth", b"stub")

    monkeypatch.chdir(tmp_path)
    rc = download.main(["--from_local_zip", str(staging), "datasets", "abc"])
    assert rc == 0
    assert (tmp_path / "datasets" / "abc" / "04_pts" / "x.xyz.npy").is_file()
    assert (tmp_path / "datasets" / "abc" / "testset.txt").read_text() == "x\n"

    rc = download.main(["--from_local_zip", str(staging), "models", "vanilla"])
    assert rc == 0
    assert (tmp_path / "models" / "vanilla_model_149.pth").is_file()

    # missing zip -> non-zero rc, no crash
    rc = download.main(["--from_local_zip", str(staging), "models", "max"])
    assert rc == 1
    # unknown name -> usage error rc
    rc = download.main(["--from_local_zip", str(staging), "models", "nope"])
    assert rc == 2
