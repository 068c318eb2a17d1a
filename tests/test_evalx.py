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
    mesh_io.write_ply(str(ref_dir / "shape.ply"), v, f)
    mesh_io.write_ply(str(ref_dir / "missing.ply"), v, f)
    report = tmp_path / "report.csv"
    metrics.mesh_comparison(str(new_dir), str(ref_dir), 1, str(report),
                            samples_per_model=2000)
    lines = open(report).read().splitlines()
    assert lines[0].startswith("in mesh,ref mesh,Hausdorff")
    assert len(lines) == 3  # header + matched + missing sentinel
    assert any(",-1,-1,-1,-1" in ln for ln in lines)


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
