"""Composed end-to-end parity: ONE mesh-level number covering extraction +
network + volume at once (the strongest egress-free stand-in for
BASELINE.md's within-1%-Chamfer north star).

A small model is trained through OUR production CLI (cli.full_run: train ->
eval -> reconstruct -> mesh) on a synthetic sphere dataset. The same
trained checkpoint is then exported to a torch state_dict
(models/import_torch.export_state_dict) and driven through the REFERENCE's
own eval stack, imported read-only from /root/reference:

  * its kd-tree patch extraction (source/data_loader.py:322-421),
  * its torch PointsToSurfModel forward (points_to_surf_model.py:296-352),
  * its eval post-processing semantics (points_to_surf_eval.py:174-196),
  * its volume splat + sign propagation verbatim (source/sdf.py:82-178),

producing a second reconstruction of the same shape from the same weights.
Both meshes are compared to the analytic ground-truth sphere: the
mesh-level Chamfer-to-GT of the two pipelines must agree to a few percent,
which composes the prediction-stage oracle (test_reference_parity.py) and
the volume-stage oracle (test_mesh_parity.py) into one number.

skimage is not installed here, so the reference volume is meshed by our
extractor with the reference's own voxel->model rescale (sdf.py:224) —
the same caveat and mitigation as tests/test_mesh_parity.py; the marcher
itself is cross-validated independently in tests/test_marching.py.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "source")),
        reason="reference repo not mounted",
    ),
]

GRID = 48
EPSILON = 3
SIGMA = 5
CERTAINTY = 13
NET = 64
PATCH_K = 50
SUB_N = 100
RADIUS = 0.5  # synthetic sphere radius (datagen/synthetic.py)


def _import_reference():
    """numpy>=1.24 aliases + trimesh stub, then the reference modules."""
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
    import source.data_loader as dl
    import source.sdf as ref_sdf

    return dl, ref_sdf


class _KDTreeShim:
    """scipy >= 1.9 renamed cKDTree.query's n_jobs kwarg to workers; the
    reference passes n_jobs (point_cloud.py:175,177)."""

    def __init__(self, tree):
        self._tree = tree

    def query(self, x, k, n_jobs=1, **kw):
        return self._tree.query(x=x, k=k, workers=n_jobs, **kw)

    def query_ball_point(self, x, r, n_jobs=1, **kw):
        return self._tree.query_ball_point(x=x, r=r, workers=n_jobs, **kw)

    def __getattr__(self, name):
        return getattr(self._tree, name)


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """Train + reconstruct through the production CLI on a synthetic
    sphere; returns (dataset_dir, out_root)."""
    from points2surf_tpu.cli.full_run import full_run
    from points2surf_tpu.datagen.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("composed")
    ds_dir = str(root / "sphere_ds")
    make_synthetic_dataset(
        ds_dir, shapes=("sphere",), n_points=4096, n_query=3000,
        query_band=0.15,
    )
    full_run(
        base_dir=str(root),
        dataset="sphere_ds",
        model_name="sphere_cp",
        out_root=str(root),
        nepoch=20,
        batch_size=64,
        grid_resolution=GRID,
        workers=0,
        net_size=NET,
        points_per_patch=PATCH_K,
        sub_sample_size=SUB_N,
        patches_per_shape=1500,
    )
    return ds_dir, str(root)


def _reference_predictions(ds_dir, models_dir):
    """The reference's own eval stack end-to-end: checkpoint (exported from
    our trained npz) -> data_loader extraction -> torch forward ->
    post-process. Returns (query_pts_ms, dist_ms)."""
    import torch

    from points2surf_tpu.cli import eval_args
    from points2surf_tpu.infer.evaluator import load_model_for_eval
    from points2surf_tpu.models.import_torch import export_state_dict

    dl, _ = _import_reference()
    from source.points_to_surf_model import PointsToSurfModel as TorchP2S

    eval_opt = eval_args.parse_arguments(
        ["--indir", ds_dir, "--outdir", "/tmp/unused",
         "--models", "sphere_cp", "--modeldir", models_dir]
    )
    _, params, batch_stats, train_opt = load_model_for_eval(
        eval_opt, "sphere_cp"
    )
    sd = export_state_dict(params, batch_stats)
    tm = TorchP2S(
        net_size_max=NET, num_points=PATCH_K, output_dim=2,
        use_point_stn=bool(train_opt.use_point_stn), use_feat_stn=True,
        sym_op="max", sub_sample_size=SUB_N,
        single_transformer=0, shared_transformation=False,
    )
    tm.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True,
    )
    tm.eval()

    ds = dl.PointcloudPatchDataset(
        root=ds_dir, shape_list_filename="testset.txt",
        points_per_patch=PATCH_K, patch_radius=0.0,
        patch_features=["imp_surf"], epsilon=EPSILON, seed=40938661,
        center="mean", cache_capacity=2, query_grid_resolution=GRID,
        sub_sample_size=SUB_N, reconstruction=True,
        uniform_subsample=False, fixed_subsample=False,
    )
    shape = ds.shape_cache.get(0)
    shape.kdtree = _KDTreeShim(shape.kdtree)
    q_pts = np.asarray(shape.imp_surf_query_point_ms, np.float32)

    dists = []
    batch, radii = [], []

    def flush():
        if not batch:
            return
        bt = {
            k: torch.stack([torch.from_numpy(np.asarray(it[k])) for it in batch])
            for k in ("patch_pts_ps", "pts_sub_sample_ms",
                      "imp_surf_query_point_ms")
        }
        with torch.no_grad():
            pred = tm(bt).numpy()
        rad = np.asarray(radii, np.float32)
        mag = np.tanh(pred[:, 0]) ** 2 * rad  # kNN mode: scale by radius
        sign = np.where(pred[:, 1] >= 0.0, 1.0, -1.0)
        dists.append(mag * sign)
        batch.clear()
        radii.clear()

    for i in range(len(ds)):
        item = ds[i]
        batch.append(item)
        radii.append(float(item["patch_radius_ms"]))
        if len(batch) == 512:
            flush()
    flush()
    return q_pts, np.concatenate(dists).astype(np.float32)


def _chamfer_to_gt_sphere(verts, faces, seed):
    from points2surf_tpu.evalx import metrics

    s = metrics.sample_mesh_surface(verts, faces, 10000,
                                    np.random.RandomState(seed))
    gt_dirs = np.random.RandomState(99).randn(10000, 3)
    gt_dirs /= np.linalg.norm(gt_dirs, axis=1, keepdims=True)
    return metrics.chamfer_distance(s, gt_dirs * RADIUS)


def test_composed_mesh_level_chamfer_parity(trained_run):
    ds_dir, out_root = trained_run
    from points2surf_tpu.utils import mesh_io

    # our pipeline's mesh, produced by the production CLI in the fixture
    our_mesh_file = os.path.join(
        out_root, "results", "sphere_cp", "sphere_ds", "rec", "mesh",
        "synthetic_sphere.ply",
    )
    v_ours, f_ours = mesh_io.load_mesh(our_mesh_file)

    # the reference stack's reconstruction from the same weights
    q_pts, dist = _reference_predictions(
        ds_dir, os.path.join(out_root, "models")
    )
    _, ref_sdf = _import_reference()
    vol = np.zeros((GRID, GRID, GRID))
    vol = ref_sdf.add_samples_to_volume(
        vol, q_pts.astype(np.float64), dist.astype(np.float64)
    )
    vol = ref_sdf.propagate_sign(vol, SIGMA, CERTAINTY)
    vol = np.clip(vol, -1.0, 1.0)
    from points2surf_tpu.ops import marching_cubes

    v_ref, f_ref = marching_cubes.extract_isosurface(
        vol.astype(np.float32), 0.0
    )
    v_ref = (((v_ref + 0.5) / float(GRID)) - 0.5) * 2.0  # sdf.py:224
    assert len(v_ref) and len(f_ref), "reference pipeline produced no mesh"

    ch_ours = _chamfer_to_gt_sphere(v_ours, f_ours, 11)
    ch_ref = _chamfer_to_gt_sphere(v_ref, f_ref, 12)

    # both pipelines must reconstruct the sphere at grid-cell accuracy...
    r_ours = np.linalg.norm(v_ours, axis=1)
    r_ref = np.linalg.norm(v_ref, axis=1)
    assert abs(np.median(r_ours) - RADIUS) < 2.0 / GRID
    assert abs(np.median(r_ref) - RADIUS) < 2.0 / GRID
    # ...and the one composed number: mesh-level Chamfer-to-GT through the
    # two full stacks (extraction + network + volume + marching) agrees to
    # a few percent. Residual = the global sub-sample draw (the one
    # intentionally stochastic stage) + 10k-sample Chamfer noise.
    rel = abs(ch_ours - ch_ref) / max(ch_ours, ch_ref)
    assert rel < 0.05, (ch_ours, ch_ref, rel)
