import os

import numpy as np

from points2surf_tpu.datagen.deepsdf import convert_sdfs, make_sdf_samples
from points2surf_tpu.evalx import figures, metrics
from points2surf_tpu.ops.marching_cubes import marching_tetrahedra
from points2surf_tpu.utils import mesh_io


def _sphere_mesh(res=24, radius=0.5):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = radius - np.sqrt(x * x + y * y + z * z)
    v, f = marching_tetrahedra(vol.astype(np.float32), 0.0)
    return (v / (res - 1) * 2.0 - 1.0).astype(np.float32), f


def test_chamfer_identical_meshes_is_small(rng):
    v, f = _sphere_mesh()
    a = metrics.sample_mesh_surface(v, f, 5000, np.random.RandomState(0))
    b = metrics.sample_mesh_surface(v, f, 5000, np.random.RandomState(1))
    cd = metrics.chamfer_distance(a, b)
    # identical surfaces: per-point NN distance ~ sampling density
    assert cd / 10000 < 0.02


def test_hausdorff_of_scaled_sphere(rng):
    v, f = _sphere_mesh()
    a = metrics.sample_mesh_surface(v, f, 8000)
    b = a * 1.2  # radius 0.5 -> 0.6
    d_ab, d_ba, d = metrics.hausdorff_distance(a, b)
    assert abs(d - 0.1) < 0.02
    assert d == max(d_ab, d_ba)


def test_mesh_comparison_csv(tmp_path, rng):
    v, f = _sphere_mesh()
    new_dir = tmp_path / "new"
    ref_dir = tmp_path / "ref"
    os.makedirs(new_dir)
    os.makedirs(ref_dir)
    mesh_io.write_ply(str(new_dir / "shape.ply"), v * 1.05, f)
    mesh_io.write_ply(str(new_dir / "norefmesh.ply"), v, f)
    mesh_io.write_ply(str(ref_dir / "shape.ply"), v, f)
    mesh_io.write_ply(str(ref_dir / "missing.ply"), v, f)
    setfile = tmp_path / "testset.txt"
    setfile.write_text("shape\nnorefmesh\nmissing\n")
    report = tmp_path / "report.csv"
    metrics.mesh_comparison(str(new_dir), str(ref_dir), 1, str(report),
                            samples_per_model=2000,
                            dataset_file_abs=str(setfile))
    lines = open(report).read().splitlines()
    assert lines[0].startswith("in mesh,ref mesh,Hausdorff")
    # header + matched + no-reconstruction (-1) + no-reference (-2)
    assert len(lines) == 4
    assert any("missing" in ln and ",-1,-1,-1,-1" in ln for ln in lines)
    assert any("norefmesh" in ln and ",-2,-2,-2,-2" in ln for ln in lines)


def test_eval_predictions_csv(tmp_path, rng):
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    os.makedirs(pred_dir)
    os.makedirs(gt_dir)
    gt = rng.randn(100).astype(np.float32)
    np.save(gt_dir / "s.ply.npy", gt)
    np.save(pred_dir / "s.xyz.npy", gt + 0.1)
    res = metrics.eval_predictions(
        str(pred_dir), str(gt_dir), str(tmp_path / "rme.csv")
    )
    assert abs(res[0]["mse"] - 0.01) < 1e-5
    assert os.path.isfile(tmp_path / "rme.csv")


def test_parula_colormap():
    cm = figures.parula_colormap()
    assert cm.shape == (256, 3)
    assert cm.min() >= 0.0 and cm.max() <= 1.0
    # monotonic red increase (blue -> yellow)
    assert cm[-1, 0] > cm[0, 0]
    assert cm[0, 2] > cm[-1, 2]


def test_distance_vis(tmp_path, rng):
    v, f = _sphere_mesh()
    a = tmp_path / "a.ply"
    b = tmp_path / "b.ply"
    mesh_io.write_ply(str(a), v * 1.1, f)
    mesh_io.write_ply(str(b), v, f)
    out = tmp_path / "vis.ply"
    vmax = figures.visualize_mesh_with_distances(
        str(a), str(b), str(out), samples_per_model=3000
    )
    assert os.path.isfile(out)
    assert 0.03 < vmax < 0.08  # ~0.05 radial offset


def test_deepsdf_export(tmp_path, rng):
    ds = tmp_path / "ds"
    os.makedirs(ds / "05_query_pts")
    os.makedirs(ds / "05_query_dist")
    pts = rng.rand(200, 3).astype(np.float32) - 0.5
    dist = rng.randn(200).astype(np.float32) * 0.1
    np.save(ds / "05_query_pts" / "shape.ply.npy", pts)
    np.save(ds / "05_query_dist" / "shape.ply.npy", dist)
    with open(ds / "trainset.txt", "w") as f:
        f.write("shape\n")
    with open(ds / "testset.txt", "w") as f:
        f.write("shape\n")

    out = tmp_path / "deepsdf"
    shapes = convert_sdfs(str(tmp_path), "ds", str(out))
    assert shapes == ["shape"]
    npz = np.load(out / "SdfSamples" / "ds" / "all" / "shape.npz")
    pos, neg = npz["pos"], npz["neg"]
    assert pos.shape[1] == 4 and neg.shape[1] == 4
    assert (pos[:, 3] >= 0).all() and (neg[:, 3] < 0).all()
    # sign flip: our positive-inside -> deepsdf negative-inside
    p, n = make_sdf_samples(pts, dist)
    assert len(p) + len(n) == 200
    inside = dist > 0
    assert len(n) == inside.sum()
    assert os.path.isfile(out / "specs.json")
    assert os.path.isfile(out / "splits" / "ds_train.json")


def test_deepsdf_full_export(tmp_path, rng):
    """Mesh half of the DeepSDF exporter: SurfaceSamples PLYs +
    reconstruction SDF samples from scans (reference
    dataset_for_deepsdf.py:15-165)."""
    from points2surf_tpu.datagen.deepsdf import export_for_deepsdf

    ds = tmp_path / "mini"
    (ds / "04_pts").mkdir(parents=True)
    (ds / "05_query_pts").mkdir()
    (ds / "05_query_dist").mkdir()
    (ds / "03_meshes").mkdir()
    v, f = _sphere_mesh()
    # two shapes: 't' goes to the train split (GT SdfSamples), 's' to the
    # test split (scan-synthesized SdfSamples) — the two kinds share the
    # SdfSamples dir and must NOT collide (reference
    # dataset_for_deepsdf.py:383-398 keeps the sets disjoint)
    for stem in ("s", "t"):
        mesh_io.write_ply(str(ds / "03_meshes" / f"{stem}.ply"), v, f)
        dirs = rng.randn(50, 3)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        pts_stem = 0.5 * dirs
        np.save(ds / "04_pts" / f"{stem}.xyz.npy",
                np.concatenate([pts_stem, dirs], axis=1).astype(np.float32))
        if stem == "s":
            pts = pts_stem
        q = rng.rand(30, 3).astype(np.float32) - 0.5
        np.save(ds / "05_query_pts" / f"{stem}.ply.npy", q)
        np.save(ds / "05_query_dist" / f"{stem}.ply.npy",
                (0.5 - np.linalg.norm(q, axis=1)).astype(np.float32))
    (ds / "trainset.txt").write_text("t\n")
    (ds / "testset.txt").write_text("s\n")

    out = tmp_path / "deepsdf"
    shapes = export_for_deepsdf(str(tmp_path), "mini", str(out))
    assert shapes == ["s", "t"]
    # train shape: GT query samples (pos/neg only, no far keys)
    zt = np.load(out / "SdfSamples" / "mini" / "all" / "t.npz")
    assert set(zt.files) == {"pos", "neg"}
    # SurfaceSamples PLY exists and parses back to the scan points
    ply = out / "SurfaceSamples" / "mini" / "all" / "s.ply"
    assert ply.is_file()
    vv, _ = mesh_io.read_ply(str(ply))
    np.testing.assert_allclose(vv, pts.astype(np.float32), atol=1e-6)
    # reconstruction SDF samples: near pairs at +-eta, far samples signed
    z = np.load(out / "SdfSamples" / "mini" / "all" / "s.npz")
    assert set(z.files) >= {"pos", "neg", "pos_far", "neg_far"}
    np.testing.assert_allclose(z["pos"][:, 3], 0.01, atol=1e-6)
    np.testing.assert_allclose(z["neg"][:, 3], -0.01, atol=1e-6)
    # outside offsets must be farther from origin than inside ones
    assert (np.linalg.norm(z["pos"][:, :3], axis=1) >
            np.linalg.norm(z["neg"][:, :3], axis=1)).all()
    # far samples: DeepSDF negative-inside convention on the sphere
    far = np.concatenate([z["pos_far"], z["neg_far"]])
    r = np.linalg.norm(far[:, :3], axis=1)
    want = r - 0.5  # negative inside radius 0.5
    np.testing.assert_allclose(far[:, 3], want, atol=0.02)
    # split JSONs must agree with what was exported: train split = shapes
    # with GT samples, test split = shapes with scan-synthesized samples +
    # SurfaceSamples (NOT all shapes)
    import json

    with open(out / "splits" / "mini_train.json") as fh:
        assert json.load(fh) == {"mini": {"all": ["t"]}}
    with open(out / "splits" / "mini_test.json") as fh:
        assert json.load(fh) == {"mini": {"all": ["s"]}}


def test_deepsdf_export_no_testset_consistent_splits(tmp_path, rng):
    """Without set files, everything is train (GT samples) and the test
    split must be EMPTY — not 'all shapes' (those would have no
    SurfaceSamples/scan inputs to reconstruct from)."""
    import json

    from points2surf_tpu.datagen.deepsdf import export_for_deepsdf

    ds = tmp_path / "mini"
    (ds / "04_pts").mkdir(parents=True)
    (ds / "05_query_pts").mkdir()
    (ds / "05_query_dist").mkdir()
    (ds / "03_meshes").mkdir()
    q = rng.rand(30, 3).astype(np.float32) - 0.5
    np.save(ds / "05_query_pts" / "a.ply.npy", q)
    np.save(ds / "05_query_dist" / "a.ply.npy",
            rng.randn(30).astype(np.float32) * 0.1)

    out = tmp_path / "deepsdf"
    export_for_deepsdf(str(tmp_path), "mini", str(out))
    with open(out / "splits" / "mini_train.json") as fh:
        assert json.load(fh) == {"mini": {"all": ["a"]}}
    with open(out / "splits" / "mini_test.json") as fh:
        assert json.load(fh) == {"mini": {"all": []}}
    # the GT npz was not overwritten by scan synthesis (no far keys)
    z = np.load(out / "SdfSamples" / "mini" / "all" / "a.npz")
    assert set(z.files) == {"pos", "neg"}
