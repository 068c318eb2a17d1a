"""End-to-end integration: train -> eval -> reconstruct -> compare, on a
synthetic analytic-SDF dataset (the role of the reference's full_run.py
smoke run + reconstruct_gt self-test)."""

import os

import numpy as np
import pytest

from points2surf_tpu.datagen.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(
        str(d / "sphere_ds"), shapes=("sphere",), n_points=4096, n_query=3000,
        query_band=0.15,
    )
    return str(d / "sphere_ds")


@pytest.mark.slow
def test_full_run_reconstructs_sphere(synth_dir, tmp_path):
    from points2surf_tpu.cli.full_run import full_run
    from points2surf_tpu.utils import mesh_io

    csv = full_run(
        base_dir=os.path.dirname(synth_dir),
        dataset=os.path.basename(synth_dir),
        model_name="sphere_t",
        out_root=str(tmp_path),
        nepoch=20,
        batch_size=64,
        grid_resolution=48,
        workers=0,
        net_size=64,
        points_per_patch=50,
        sub_sample_size=100,
        patches_per_shape=1500,
    )
    assert os.path.isfile(csv)
    lines = open(csv).read().strip().splitlines()
    assert len(lines) >= 2
    row = lines[1].split(",")
    hausdorff = float(row[4])
    chamfer = float(row[5])
    assert hausdorff > 0, "mesh missing (sentinel -1/-2)"
    # loose bounds: a 20-epoch toy model on an analytic sphere must get the
    # gross shape right (sphere radius 0.5, grid cell ~0.042)
    assert hausdorff < 0.25, f"hausdorff {hausdorff}"

    mesh_file = os.path.join(
        str(tmp_path), "results", "sphere_t",
        os.path.basename(synth_dir), "rec", "mesh", "synthetic_sphere.ply",
    )
    v, f = mesh_io.load_mesh(mesh_file)
    r = np.linalg.norm(v, axis=1)
    assert abs(np.median(r) - 0.5) < 0.08

    # eval pass must have written predictions + MSE csv
    eval_csv = os.path.join(
        str(tmp_path), "results", "sphere_t",
        os.path.basename(synth_dir), "eval", "rme_comp_res.csv",
    )
    assert os.path.isfile(eval_csv)


def test_reconstruct_gt_roundtrip(synth_dir, tmp_path):
    """Mesh the GT SDF samples directly — validates splat/propagate/marching
    independently of any network (reference make_dataset.py:649-712)."""
    from points2surf_tpu.infer.meshing import implicit_surface_to_mesh
    from points2surf_tpu.ops import voxel
    from points2surf_tpu.utils import mesh_io

    pts = np.load(os.path.join(synth_dir, "04_pts", "synthetic_sphere.xyz.npy"))
    # dense grid queries near the surface with analytic sphere SDF
    grid_res = 48
    q = voxel.grid_query_points(pts, grid_res, 3)
    dist = 0.5 - np.linalg.norm(q, axis=1)

    vol_file = str(tmp_path / "vol.off")
    mesh_file = str(tmp_path / "mesh.ply")
    ok = implicit_surface_to_mesh(
        dist.astype(np.float32), q, vol_file, mesh_file, grid_res,
        sigma=5, certainty_threshold=13,
    )
    assert ok
    v, f = mesh_io.load_mesh(mesh_file)
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 0.5) < 0.03
    assert r.std() < 0.02
    assert os.path.isfile(vol_file)
