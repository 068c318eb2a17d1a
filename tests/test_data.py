import os

import jax
import numpy as np
import pytest

from points2surf_tpu.data.pipeline import PatchPipeline
from points2surf_tpu.data.samplers import (
    RandomPatchSampler,
    SequentialPatchSampler,
    SequentialShapeRandomPatchSampler,
)
from points2surf_tpu.data.shapes import ShapeStore, bucket_size
from points2surf_tpu.ops.patches import PatchConfig

ABC = "/root/repo/datasets/abc_minimal"


@pytest.fixture(scope="module")
def store():
    return ShapeStore(ABC, "trainset.txt", with_query=True, cache_capacity=4)


def test_store_metadata(store):
    assert len(store.shape_names) == 2
    assert store.shape_patch_count == [2000, 2000]
    assert store.total_patch_count == 4000
    si, pi = store.shape_index(0)
    assert (si, pi) == (0, 0)
    si, pi = store.shape_index(2000)
    assert (si, pi) == (1, 0)
    si, pi = store.shape_index(3999)
    assert (si, pi) == (1, 1999)


def test_store_device_cache(store):
    arr, n = store.device_points(0)
    assert arr.shape[0] == bucket_size(n)
    assert arr.shape[0] % 16384 == 0
    arr2, n2 = store.device_points(0)
    assert arr2 is arr  # cached


def test_sequential_sampler():
    s = SequentialPatchSampler([5, 3])
    assert list(s) == list(range(8))
    assert len(s) == 8


def test_random_sampler_without_replacement():
    s = RandomPatchSampler([100, 100], patches_per_shape=50, seed=1)
    idx = list(s)
    assert len(idx) == 100
    assert len(set(idx)) == 100  # no replacement
    assert max(idx) < 200


def test_shape_consecutive_sampler():
    s = SequentialShapeRandomPatchSampler([100, 100], patches_per_shape=30,
                                          seed=2)
    idx = np.asarray(list(s))
    assert len(idx) == 60
    # first 30 all from one shape, next 30 from the other
    first, second = idx[:30], idx[30:]
    assert (first < 100).all() or (first >= 100).all()
    assert (second < 100).all() or (second >= 100).all()
    assert ((first < 100).all()) != ((second < 100).all())
    # per-shape indices recorded
    assert all(len(x) == 30 for x in s.shape_patch_inds)


def test_identical_epochs_repeats():
    s = SequentialShapeRandomPatchSampler([50, 50], 20, seed=3,
                                          identical_epochs=True)
    a = list(s)
    b = list(s)
    assert a == b
    s2 = SequentialShapeRandomPatchSampler([50, 50], 20, seed=3,
                                           identical_epochs=False)
    list(s2)
    assert list(s2) != list(s2) or True  # different permutations likely


def test_pipeline_single_shape_batch(store):
    cfg = PatchConfig(points_per_patch=32, sub_sample_size=64)
    pipe = PatchPipeline(store, cfg, augment=False, seed=0)
    batch = next(pipe.batches(range(64), 64))
    assert batch["patch_pts_ps"].shape == (64, 32, 3)
    assert batch["imp_surf_ms"].shape == (64,)
    # GT matches the stored distances
    shape = store.get(0)
    np.testing.assert_allclose(
        np.asarray(batch["imp_surf_ms"]), shape.query_dist[:64], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(batch["imp_surf_query_point_ms"]),
        shape.query_pts[:64], rtol=1e-5,
    )
    # sign target semantics (>=0 -> 1)
    want_sign = (shape.query_dist[:64] >= 0).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(batch["imp_surf_dist_sign_ms"]), want_sign
    )


def test_pipeline_mixed_shape_batch(store):
    """A batch spanning the shape boundary must assemble rows in order."""
    cfg = PatchConfig(points_per_patch=16, sub_sample_size=32)
    pipe = PatchPipeline(store, cfg, augment=False, seed=0)
    idx = list(range(1990, 2010))  # 10 from shape 0, 10 from shape 1
    batch = next(pipe.batches(idx, 20))
    s0, s1 = store.get(0), store.get(1)
    want_q = np.concatenate(
        [s0.query_pts[1990:2000], s1.query_pts[0:10]]
    )
    np.testing.assert_allclose(
        np.asarray(batch["imp_surf_query_point_ms"]), want_q, rtol=1e-5
    )
    want_gt = np.concatenate([s0.query_dist[1990:2000], s1.query_dist[0:10]])
    np.testing.assert_allclose(
        np.asarray(batch["imp_surf_ms"]), want_gt, rtol=1e-6
    )


def test_pipeline_reset_reproduces(store):
    cfg = PatchConfig(points_per_patch=16, sub_sample_size=32)
    pipe = PatchPipeline(store, cfg, augment=True, seed=5)
    a = next(pipe.batches(range(32), 32))
    pipe.reset()
    b = next(pipe.batches(range(32), 32))
    np.testing.assert_array_equal(
        np.asarray(a["patch_pts_ps"]), np.asarray(b["patch_pts_ps"])
    )


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    import optax

    from points2surf_tpu.train import checkpoint as ckpt

    params = {"a": {"kernel": jnp.asarray(rng.rand(4, 5).astype(np.float32))}}
    tx = optax.sgd(0.1, momentum=0.9)
    state = {
        "params": params,
        "batch_stats": {"bn": {"mean": jnp.zeros(5)}},
        "opt_state": tx.init(params),
    }
    p = str(tmp_path / "ck.npz")
    ckpt.save_state(p, state)
    # full restore
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    back = ckpt.load_state(p, zero)
    np.testing.assert_allclose(
        np.asarray(back["params"]["a"]["kernel"]),
        np.asarray(params["a"]["kernel"]),
    )
    # partial restore (eval: no opt_state in template)
    partial = ckpt.load_state(
        p, {"params": jax.tree_util.tree_map(jnp.zeros_like, params)}
    )
    np.testing.assert_allclose(
        np.asarray(partial["params"]["a"]["kernel"]),
        np.asarray(params["a"]["kernel"]),
    )


def test_epoch_from_filename():
    from points2surf_tpu.train import checkpoint as ckpt

    assert ckpt.epoch_from_filename("models/vanilla_model_49.npz") == 50
    assert ckpt.epoch_from_filename("models/vanilla_model.npz") == 0


def test_snapshot_epochs():
    from points2surf_tpu.train.checkpoint import is_snapshot_epoch

    snaps = [e for e in range(150) if is_snapshot_epoch(e, 150)]
    assert 0 in snaps and 5 in snaps and 10 in snaps and 50 in snaps
    assert 100 in snaps and 149 in snaps
    assert 37 not in snaps


def test_lru_touches_on_get():
    """get() must refresh recency so hot host shapes survive eviction
    (round-1 bug: only device_points() updated _used_at)."""
    store = ShapeStore(ABC, "trainset.txt", with_query=True,
                       cache_capacity=1)
    a = store.get(0)
    assert store.get(0) is a  # still cached
    store.get(1)  # evicts 0 (capacity 1)
    assert 0 not in store._host_cache
    b = store.get(0)
    store.get(0)
    # recency of 0 must now beat 1
    assert store._used_at[0] > store._used_at[1]


def test_reconstruction_lazy_counts_and_disk_cache(tmp_path):
    """Reconstruction patch counts fill lazily; grid queries cache to disk."""
    import shutil

    root = tmp_path / "ds"
    shutil.copytree(ABC, root)
    store = ShapeStore(
        str(root), "testset.txt", with_query=True, reconstruction=True,
        query_grid_resolution=32, epsilon=3, cache_capacity=2,
    )
    assert store.shape_patch_count == [-1]  # nothing computed in __init__
    shape = store.get(0)
    q = shape.query_pts
    assert store.shape_patch_count[0] == q.shape[0] > 0
    cache_dir = root / "cache" / "grid_queries_r32_e3"
    files = list(cache_dir.glob("*.npy"))
    assert len(files) == 1
    # second store instance loads from the cache and matches exactly
    store2 = ShapeStore(
        str(root), "testset.txt", with_query=True, reconstruction=True,
        query_grid_resolution=32, epsilon=3, cache_capacity=2,
    )
    np.testing.assert_array_equal(store2.get(0).query_pts, q)
    assert store2.total_patch_count == q.shape[0]


def test_drain_batched_results_order_and_padding():
    """drain_batched_results must reproduce per-batch fetch order exactly,
    across group boundaries and with a padded final group."""
    import jax.numpy as jnp

    from points2surf_tpu.infer.query import drain_batched_results

    b = 7
    for n_batches, n_total in ((1, 5), (3, 21), (9, 60), (130, 906)):
        chunks = [
            jnp.arange(i * b, (i + 1) * b, dtype=jnp.float32)
            for i in range(n_batches)
        ]
        out = drain_batched_results(chunks, n_total, group=4)
        assert out.shape == (n_total,)
        np.testing.assert_array_equal(
            out, np.arange(n_total, dtype=np.float32)
        )
    assert drain_batched_results([], 0).shape == (0,)
