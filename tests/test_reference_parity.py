"""End-to-end parity oracle against the reference pipeline.

The released checkpoints are unreachable from this host (no egress — the
download attempt and its DNS failure are recorded in docs/VALIDATION.md),
so checkpoint parity is established against a recorded-activation oracle:
the ACTUAL reference data pipeline + torch model run read-only from
/root/reference on the bundled abc_minimal data, compared with our full
eval path (ShapeStore -> extract_patches -> forward -> post-process).

Reconstruction mode is used for the deterministic comparisons because the
reference augments every non-reconstruction pass with a random rotation
(data_loader.py:381-393). trimesh is not installed here; it is stubbed
before importing the reference (only the augmentation path touches it).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
ABC = "/root/repo/datasets/abc_minimal"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "source")),
    reason="reference repo not mounted",
)

GRID_RES = 32
EPSILON = 3
SUB_N = 64
PATCH_K = 48
NET = 128


def _import_reference_loader():
    # the reference predates numpy 1.24: restore the removed aliases it uses
    for alias, real in (("int", int), ("float", float), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, real)
    if "trimesh" not in sys.modules:
        fake = types.ModuleType("trimesh")
        fake.Trimesh = type("Trimesh", (), {})  # annotations in sdf.py
        fake.transformations = types.ModuleType("trimesh.transformations")
        sys.modules["trimesh"] = fake
        sys.modules["trimesh.transformations"] = fake.transformations
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import source.data_loader as dl

    return dl


class _KDTreeShim:
    """scipy >= 1.9 renamed cKDTree.query's n_jobs kwarg to workers; the
    reference passes n_jobs (point_cloud.py:175,177). Pure API adapter."""

    def __init__(self, tree):
        self._tree = tree

    def query(self, x, k, n_jobs=1, **kw):
        return self._tree.query(x=x, k=k, workers=n_jobs, **kw)

    def query_ball_point(self, x, r, n_jobs=1, **kw):
        return self._tree.query_ball_point(x=x, r=r, workers=n_jobs, **kw)

    def __getattr__(self, name):
        return getattr(self._tree, name)


def _make_ref_dataset(**overrides):
    dl = _import_reference_loader()
    kw = dict(
        root=ABC,
        shape_list_filename="testset.txt",
        points_per_patch=PATCH_K,
        patch_radius=0.0,
        patch_features=["imp_surf"],
        epsilon=EPSILON,
        seed=42,
        center="point",
        cache_capacity=2,
        query_grid_resolution=GRID_RES,
        sub_sample_size=SUB_N,
        reconstruction=True,
        uniform_subsample=False,
        fixed_subsample=False,
    )
    kw.update(overrides)
    ds = dl.PointcloudPatchDataset(**kw)
    shape = ds.shape_cache.get(0)
    shape.kdtree = _KDTreeShim(shape.kdtree)
    return ds


@pytest.fixture(scope="module")
def ref_dataset():
    return _make_ref_dataset()


@pytest.fixture(scope="module")
def our_store():
    from points2surf_tpu.data.shapes import ShapeStore

    return ShapeStore(
        ABC, "testset.txt", with_query=True, reconstruction=True,
        query_grid_resolution=GRID_RES, epsilon=EPSILON, cache_capacity=2,
    )


def test_reconstruction_grid_matches_reference(ref_dataset, our_store):
    """Our near-surface voxel-center set must equal the reference's
    (sdf.py:46-70 + data_loader.py:300-310) exactly, as a set."""
    ref_shape = ref_dataset.shape_cache.get(0)
    ref_q = np.asarray(ref_shape.imp_surf_query_point_ms, np.float32)
    our_q = our_store.get(0).query_pts
    assert ref_q.shape == our_q.shape

    def key(qs):
        ids = np.round((qs + 1.0) / 2.0 * GRID_RES - 0.5).astype(np.int64)
        return set(map(tuple, ids))

    assert key(ref_q) == key(our_q)


def test_patch_extraction_parity(ref_dataset, our_store):
    """Exact-mode on-device extraction must reproduce the reference's
    scipy-kd-tree patches: same adaptive radius, same point set in patch
    space (order may differ; the encoder is permutation-invariant)."""
    import jax
    import jax.numpy as jnp

    from points2surf_tpu.ops.patches import PatchConfig, extract_patches

    n_queries = 48
    ref_shape = ref_dataset.shape_cache.get(0)
    queries = np.asarray(
        ref_shape.imp_surf_query_point_ms[:n_queries], np.float32
    )

    pts = our_store.get(0).pts
    pts_dev, n_valid = our_store.device_points(0)
    cfg = PatchConfig(
        points_per_patch=PATCH_K, patch_radius=0.0,
        sub_sample_size=SUB_N, exact=True,
    )
    batch = extract_patches(
        pts_dev, jnp.asarray(queries), n_valid, jax.random.key(0),
        cfg=cfg, train=False, coherent=False,
    )
    got_patches = np.asarray(batch["patch_pts_ps"])
    got_radius = np.asarray(batch["patch_radius_ms"])

    for i in range(n_queries):
        ref_item = ref_dataset[i]
        want_patch = ref_item["patch_pts_ps"].numpy()
        want_radius = float(ref_item["patch_radius_ms"])
        assert abs(got_radius[i] - want_radius) < 1e-5, i
        a = np.array(sorted(map(tuple, np.round(got_patches[i], 5))))
        b = np.array(sorted(map(tuple, np.round(want_patch, 5))))
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=f"query {i}")


def _e2e_oracle(ref_ds, our_store, *, outputs=("imp_surf_magnitude",
                                               "imp_surf_sign"),
                sym_op="max", patch_radius=0.0, uniform_subsample=False,
                points_per_patch=PATCH_K, n_queries=128):
    """Full-path oracle for one experiment config: a seeded torch
    checkpoint evaluated through the REFERENCE pipeline (data_loader
    batch -> torch forward -> eval.py post-processing) vs OUR fused
    production path (extract_patches -> converted flax forward ->
    on-device post-proc) on the same reconstruction queries. The only
    stochastic difference is the global sub-sample draw (and, for
    over-full ball patches, the in-ball subset draw), so predictions must
    agree closely."""
    import torch

    import jax
    import jax.numpy as jnp

    from points2surf_tpu.infer.query import make_sdf_query_fn
    from points2surf_tpu.models.import_torch import convert_state_dict
    from points2surf_tpu.models.p2s import PointsToSurfModel
    from points2surf_tpu.ops.patches import PatchConfig
    from source.points_to_surf_model import PointsToSurfModel as TorchP2S

    fixed_radius = patch_radius > 0.0
    output_dim = len(outputs)
    torch.manual_seed(7)
    tm = TorchP2S(
        net_size_max=NET, num_points=points_per_patch,
        output_dim=output_dim,
        use_point_stn=True, use_feat_stn=True, sym_op=sym_op,
        sub_sample_size=SUB_N, single_transformer=0,
        shared_transformation=True,
    )
    tm.eval()

    # reference path: dataset batch -> torch forward -> post-process
    # (points_to_surf_eval.py:174-196)
    items = [ref_ds[i] for i in range(n_queries)]
    batch_t = {
        k: torch.stack([it[k] for it in items])
        for k in ("patch_pts_ps", "pts_sub_sample_ms",
                  "imp_surf_query_point_ms")
    }
    radius = np.array(
        [float(it["patch_radius_ms"]) for it in items], np.float32
    )
    with torch.no_grad():
        pred_t = tm(batch_t).numpy()
    if outputs == ("imp_surf",):
        want = np.tanh(pred_t[:, 0]) ** 2 * np.sign(pred_t[:, 0])
        if not fixed_radius:
            want = want * radius
    else:
        mag = np.tanh(pred_t[:, 0]) ** 2
        if not fixed_radius:
            mag = mag * radius
        sign = np.where(pred_t[:, 1] >= 0.0, 1.0, -1.0)
        want = mag * sign

    # our path: fused extraction + converted checkpoint + post-proc
    params, batch_stats = convert_state_dict(tm.state_dict())
    jm = PointsToSurfModel(
        net_size_max=NET, output_dim=output_dim, use_point_stn=True,
        use_feat_stn=True, sym_op=sym_op, shared_transformation=True,
    )
    cfg = PatchConfig(
        points_per_patch=points_per_patch, patch_radius=patch_radius,
        sub_sample_size=SUB_N, exact=True,
        uniform_subsample=uniform_subsample,
    )
    query_fn = make_sdf_query_fn(
        jm, tuple(outputs), cfg,
        fixed_radius=fixed_radius, augment=False, coherent=False,
    )
    ref_shape = ref_ds.shape_cache.get(0)
    queries = np.asarray(
        ref_shape.imp_surf_query_point_ms[:n_queries], np.float32
    )
    pts_dev, n_valid = our_store.device_points(0)
    got = np.asarray(
        query_fn(
            params, batch_stats, pts_dev, jnp.asarray(queries), n_valid,
            jax.random.key(3),
        )
    )

    # same scale, tightly correlated; residual = sampling stochasticity.
    # When the config collapses prediction VARIANCE across queries (e.g.
    # fixed-radius + seeded untrained weights: spread ~1e-5 around the
    # mean), correlation is noise-dominated — the near-zero rms_diff is
    # then the meaningful parity signal.
    corr = np.corrcoef(got, want)[0, 1]
    rms_ref = float(np.sqrt(np.mean(want**2)))
    rms_diff = float(np.sqrt(np.mean((got - want) ** 2)))
    assert rms_diff < 0.25 * rms_ref, (corr, rms_diff, rms_ref)
    assert corr > 0.95 or rms_diff < 0.05 * rms_ref, (
        corr, rms_diff, rms_ref,
    )


def test_ball_patch_extraction_parity(our_store):
    """Over-full ball patches against the reference pipeline: both draws
    are random subsets of the SAME in-ball pool (point_cloud.py:177-183),
    so our exact-mode selection must (a) pass the fixed radius through,
    (b) pick only in-ball ids, (c) keep min(k, |in-ball|) points — with
    the reference's own kd-tree pool as the ground truth."""
    import jax
    import jax.numpy as jnp

    from points2surf_tpu.ops.patches import PatchConfig, extract_patches

    radius = 0.1
    ref_ds = _make_ref_dataset(patch_radius=radius)
    ref_shape = ref_ds.shape_cache.get(0)
    queries = np.asarray(
        ref_shape.imp_surf_query_point_ms[:32], np.float32
    )

    cfg = PatchConfig(
        points_per_patch=PATCH_K, patch_radius=radius,
        sub_sample_size=SUB_N, exact=True,
    )
    pts_dev, n_valid = our_store.device_points(0)
    batch = extract_patches(
        pts_dev, jnp.asarray(queries), n_valid, jax.random.key(1),
        cfg=cfg, train=False, coherent=False,
    )
    ids = np.asarray(batch["patch_pts_ids"])
    patch_ps = np.asarray(batch["patch_pts_ps"])
    np.testing.assert_allclose(
        np.asarray(batch["patch_radius_ms"]), radius, rtol=1e-6
    )
    for i in range(len(queries)):
        pool = set(
            ref_shape.kdtree.query_ball_point(queries[i], radius)
        )
        # the reference's own patch is a random subset of this pool
        # (point_cloud.py:177-183); its point count matches min(k, pool)
        ref_patch = np.asarray(ref_ds[i]["patch_pts_ps"])
        ref_real = ref_patch[np.linalg.norm(ref_patch, axis=-1) > 1e-7]
        assert abs(len(ref_real) - min(PATCH_K, len(pool))) <= 2
        real = ids[i][np.linalg.norm(patch_ps[i], axis=-1) > 1e-7]
        got = set(real.tolist())
        assert got <= pool, f"query {i}: out-of-ball points selected"
        want_n = min(PATCH_K, len(pool))
        assert len(got) >= want_n - 2, (i, len(got), want_n)


def test_end_to_end_sdf_prediction_parity(ref_dataset, our_store):
    """The kNN-vanilla config (magnitude+sign heads, max pool,
    distance-weighted sub-sample)."""
    _e2e_oracle(ref_dataset, our_store)


def test_end_to_end_parity_ball_radius(our_store):
    """Fixed-radius ball-patch config (train_p2s_small/medium_radius.sh):
    reference point_cloud.py:177-183 takes a random in-ball subset.
    points_per_patch is set above typical in-ball counts so both pipelines
    keep EVERY in-ball point (deterministic patch sets; predictions then
    differ only by sub-sample noise)."""
    ref_ds = _make_ref_dataset(patch_radius=0.05, points_per_patch=800)
    _e2e_oracle(
        ref_ds, our_store, patch_radius=0.05, points_per_patch=800,
        n_queries=64,
    )


def test_end_to_end_parity_uniform_subsample(our_store):
    """--uniform_subsample 1 (train_p2s_max.sh / _uniform.sh): global
    sub-sample drawn with replacement, utils.py:213-216."""
    ref_ds = _make_ref_dataset(uniform_subsample=True)
    _e2e_oracle(ref_ds, our_store, uniform_subsample=True)


def test_end_to_end_parity_sym_op_sum(ref_dataset, our_store):
    """sym_op=sum encoder pooling (reference model.py:219-230 branch)."""
    _e2e_oracle(ref_dataset, our_store, sym_op="sum")


def test_end_to_end_parity_regression_output(ref_dataset, our_store):
    """The regression variant (train_p2s_regression.sh): a single
    'imp_surf' output, post-processed tanh^2 * sign (sdf_nn.py:6-8)."""
    _e2e_oracle(ref_dataset, our_store, outputs=("imp_surf",))
