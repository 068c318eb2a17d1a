import jax
import jax.numpy as jnp
import numpy as np
from scipy import spatial

from points2surf_tpu.ops.patches import PatchConfig, extract_patches


def _cloud(rng, n=2000):
    return (rng.rand(n, 3).astype(np.float32) * 1.6) - 0.8


def test_knn_patch_matches_reference_pipeline(rng):
    """Eval-mode (no augmentation) patches must match the reference's
    __getitem__ numpy pipeline (data_loader.py:322-361) for kNN mode."""
    pts = _cloud(rng)
    q = _cloud(rng, 5)
    cfg = PatchConfig(points_per_patch=32, patch_radius=0.0,
                      sub_sample_size=64)
    out = extract_patches(
        jnp.asarray(pts), jnp.asarray(q), pts.shape[0], jax.random.key(0),
        cfg=cfg, train=False,
    )
    tree = spatial.cKDTree(pts)
    ref_d, ref_i = tree.query(q, 32)
    radius = np.asarray(out["patch_radius_ms"])
    np.testing.assert_allclose(radius, ref_d.max(1), rtol=1e-4)
    patch_ps = np.asarray(out["patch_pts_ps"])
    want_ps = (pts[ref_i] - q[:, None, :]) / radius[:, None, None]
    # sort rows (selection order may differ under ties)
    got_sorted = np.sort(patch_ps.reshape(5, -1), axis=1)
    want_sorted = np.sort(want_ps.reshape(5, -1), axis=1)
    np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-4)
    # patch space is normalized: all points within unit ball
    norms = np.linalg.norm(patch_ps, axis=-1)
    assert (norms <= 1.0 + 1e-4).all()
    np.testing.assert_allclose(norms.max(axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["imp_surf_query_point_ps"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["imp_surf_query_point_ms"]), q)


def test_ball_patch_pads_with_query(rng):
    pts = _cloud(rng)
    q = np.array([[0.75, 0.75, 0.75]], np.float32)  # sparse corner
    cfg = PatchConfig(points_per_patch=64, patch_radius=0.05,
                      sub_sample_size=0)
    out = extract_patches(
        jnp.asarray(pts), jnp.asarray(q), pts.shape[0], jax.random.key(0),
        cfg=cfg, train=False,
    )
    patch_ps = np.asarray(out["patch_pts_ps"])[0]
    tree = spatial.cKDTree(pts)
    n_in_ball = len(tree.query_ball_point(q[0], 0.05))
    n_origin = (np.abs(patch_ps).sum(1) == 0).sum()
    assert n_origin >= 64 - n_in_ball  # padding slots at the origin
    np.testing.assert_allclose(
        np.asarray(out["patch_radius_ms"]), 0.05, rtol=1e-6
    )


def test_train_mode_applies_consistent_rotation(rng):
    pts = _cloud(rng)
    q = _cloud(rng, 3)
    cfg = PatchConfig(points_per_patch=16, sub_sample_size=32)
    key = jax.random.key(7)
    a = extract_patches(jnp.asarray(pts), jnp.asarray(q), pts.shape[0], key,
                        cfg=cfg, train=False)
    b = extract_patches(jnp.asarray(pts), jnp.asarray(q), pts.shape[0], key,
                        cfg=cfg, train=True)
    # rotation preserves distances to the query / origin
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(np.asarray(b["patch_pts_ps"]), axis=-1), 1),
        np.sort(np.linalg.norm(np.asarray(a["patch_pts_ps"]), axis=-1), 1),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b["imp_surf_query_point_ms"]), axis=-1),
        np.linalg.norm(q, axis=-1),
        rtol=1e-4,
    )
    # but actually rotates (points differ)
    assert np.abs(
        np.asarray(b["patch_pts_ps"]) - np.asarray(a["patch_pts_ps"])
    ).max() > 1e-3
    # radius unaffected by rotation
    np.testing.assert_allclose(
        np.asarray(b["patch_radius_ms"]), np.asarray(a["patch_radius_ms"]),
        rtol=1e-5,
    )


def test_batch_keys_and_shapes(rng):
    pts = _cloud(rng, 600)
    q = _cloud(rng, 9)
    cfg = PatchConfig(points_per_patch=20, sub_sample_size=30)
    out = extract_patches(
        jnp.asarray(pts), jnp.asarray(q), 600, jax.random.key(0),
        cfg=cfg, train=True,
    )
    assert out["patch_pts_ps"].shape == (9, 20, 3)
    assert out["pts_sub_sample_ms"].shape == (9, 30, 3)
    assert out["patch_radius_ms"].shape == (9,)
    assert out["imp_surf_query_point_ms"].shape == (9, 3)
    assert out["patch_pts_ids"].shape == (9, 20)


def test_spread_queries_stay_exact(rng):
    """Regression guard: spatially spread query batches (training/GT-eval
    patterns) must not lose recall through the tiled fast path — the
    certificate fallback has to engage. An early tile version silently
    dropped to recall 0.37 here."""
    from scipy import spatial as sp

    u = rng.uniform(0, 2 * np.pi, 15000)
    v = rng.uniform(0, 2 * np.pi, 15000)
    r = 0.45 + 0.2 * np.cos(v)
    pts = np.stack(
        [r * np.cos(u), r * np.sin(u), 0.2 * np.sin(v)], 1
    ).astype(np.float32)
    pad = np.zeros((16384, 3), np.float32)
    pad[:15000] = pts
    q = pts[rng.choice(15000, 512)] + rng.randn(512, 3).astype(np.float32) * 0.02

    tree = sp.cKDTree(pts)
    _, refi = tree.query(q, 64)
    cfg = PatchConfig(points_per_patch=64, sub_sample_size=0)
    for train in (False, True):
        out = extract_patches(
            jnp.asarray(pad), jnp.asarray(q), 15000, jax.random.key(0),
            cfg=cfg, train=train,
        )
        ids = np.asarray(out["patch_pts_ids"])
        recall = np.mean(
            [len(np.intersect1d(ids[i], refi[i])) / 64 for i in range(512)]
        )
        assert recall > 0.93, f"train={train}: recall {recall}"


def test_ball_tiles_select_exact_in_ball_subsets(rng):
    """Grid-coherent ball-mode batches go through the tile path; certified
    tiles must behave exactly like the reference's random in-ball subset
    (point_cloud.py:177-183): every selected id is in-radius, and when the
    ball holds <= k points ALL of them are selected."""
    from scipy import spatial as sp

    from points2surf_tpu.ops.voxel import grid_query_points

    pts = (rng.rand(20000, 3).astype(np.float32) * 1.2) - 0.6
    pad = np.zeros((32768, 3), np.float32)
    pad[:20000] = pts
    q = grid_query_points(pts, 64, 3)[:512]

    tree = sp.cKDTree(pts)
    radius = 0.1
    cfg = PatchConfig(points_per_patch=48, patch_radius=radius,
                      sub_sample_size=0)
    out = extract_patches(
        jnp.asarray(pad), jnp.asarray(q), 20000, jax.random.key(3),
        cfg=cfg, train=False,
    )
    ids = np.asarray(out["patch_pts_ids"])
    patch_ps = np.asarray(out["patch_pts_ps"])
    for i in range(q.shape[0]):
        in_ball = set(tree.query_ball_point(q[i], radius * (1 + 1e-5)))
        got = ids[i]
        # pad slots sit at the patch origin; real slots carry in-ball ids
        real = got[np.linalg.norm(patch_ps[i], axis=-1) > 1e-7]
        assert set(real.tolist()) <= in_ball
        want_n = min(48, len(in_ball))
        # ties at the radius boundary allow off-by-a-few
        assert len(np.unique(real)) >= want_n - 2
    # fixed radius is passed through
    np.testing.assert_allclose(
        np.asarray(out["patch_radius_ms"]), radius, rtol=1e-6
    )


def test_ball_tiles_randomize_overfull_patches(rng):
    """When the ball holds more than k points, the tile path must return a
    RANDOM k-subset (different keys -> different subsets), matching the
    reference's rng.choice sub-select (point_cloud.py:181-183)."""
    from points2surf_tpu.ops.voxel import grid_query_points

    pts = (rng.rand(20000, 3).astype(np.float32) * 0.4) - 0.2  # dense blob
    pad = np.zeros((32768, 3), np.float32)
    pad[:20000] = pts
    q = grid_query_points(pts, 32, 3)[:128]
    cfg = PatchConfig(points_per_patch=16, patch_radius=0.1,
                      sub_sample_size=0)
    a = extract_patches(jnp.asarray(pad), jnp.asarray(q), 20000,
                        jax.random.key(0), cfg=cfg, train=False)
    b = extract_patches(jnp.asarray(pad), jnp.asarray(q), 20000,
                        jax.random.key(1), cfg=cfg, train=False)
    ia, ib = np.asarray(a["patch_pts_ids"]), np.asarray(b["patch_pts_ids"])
    overlap = np.mean([
        len(np.intersect1d(ia[i], ib[i])) / 16 for i in range(128)
    ])
    assert overlap < 0.9  # dense blob: balls hold thousands of points


def test_ball_candidate_depth_scales_with_cloud_density(rng):
    """_ball_tile_candidates derives depth from n * r^2 density instead of
    a hard-coded 60k-cloud threshold: a 150k-point cloud at r=0.1 must
    still produce exact in-ball subsets through the tile path (previously
    the fixed 16384 depth left dense-cloud tiles uncertified -> silent
    whole-batch fallback)."""
    from scipy import spatial as sp

    from points2surf_tpu.ops.patches import _ball_tile_candidates
    from points2surf_tpu.ops.voxel import grid_query_points

    # depth grows with cloud size at fixed radius
    cfg_r1 = PatchConfig(patch_radius=0.1)
    assert _ball_tile_candidates(cfg_r1, 163840) >= 2 * _ball_tile_candidates(
        cfg_r1, 65536
    )
    # small radii keep the configured floor
    assert (
        _ball_tile_candidates(PatchConfig(patch_radius=0.02), 65536)
        == PatchConfig().tile_candidates
    )
    # never exceeds the cloud
    assert _ball_tile_candidates(cfg_r1, 4096) == 4096

    # dense 150k surface cloud — a thin plate (disc), whose in-ball
    # counts far exceed the old fixed 16384 depth: tiles must certify
    n_real = 150_000
    rr = 0.35 * np.sqrt(rng.rand(n_real))
    th = rng.rand(n_real) * 2 * np.pi
    pts = np.stack(
        [rr * np.cos(th), rr * np.sin(th),
         0.002 * rng.randn(n_real)], axis=1
    ).astype(np.float32)
    n_pad = 163840
    pad = np.zeros((n_pad, 3), np.float32)
    pad[:n_real] = pts
    # a spatially tight query cluster (one reconstruction work block):
    # the 256 near-surface grid queries closest to a seed surface point
    grid_q = np.asarray(grid_query_points(pts, 128, 3))
    seed = pts[0]
    q = grid_q[np.argsort(np.linalg.norm(grid_q - seed, axis=1))[:256]]

    tree = sp.cKDTree(pts)
    radius = 0.1
    cfg = PatchConfig(points_per_patch=32, patch_radius=radius,
                      sub_sample_size=0)

    from points2surf_tpu.ops.patches import _ball_tile_candidates, _tile_select

    m = _ball_tile_candidates(cfg, n_pad)
    # the density really does exceed the old fixed depth: the candidate
    # set must cover every point within max|q-c| + r of the tile centroid
    for t in range(2):
        qt = q[t * 128:(t + 1) * 128]
        c = qt.mean(0)
        need = len(
            tree.query_ball_point(
                c, np.linalg.norm(qt - c, axis=1).max() + radius
            )
        )
        assert need > 16384  # old hard-coded depth -> uncertified cliff
        assert m >= need

    # the tiles themselves must certify (exactness via the FALLBACK would
    # also pass the set assertions below)
    _, _, _, all_cert = _tile_select(
        jnp.asarray(pad), jnp.asarray(q), n_real, 32, cfg, 128,
        jax.random.key(5), m=m,
    )
    assert bool(all_cert)

    out = extract_patches(
        jnp.asarray(pad), jnp.asarray(q), n_real, jax.random.key(5),
        cfg=cfg, train=False,
    )
    ids = np.asarray(out["patch_pts_ids"])
    patch_ps = np.asarray(out["patch_pts_ps"])
    for i in range(q.shape[0]):
        in_ball = set(tree.query_ball_point(q[i], radius * (1 + 1e-5)))
        real = ids[i][np.linalg.norm(patch_ps[i], axis=-1) > 1e-7]
        assert set(real.tolist()) <= in_ball
        assert len(np.unique(real)) >= min(32, len(in_ball)) - 2


def test_coherent_queries_use_certified_tiles(rng):
    """Grid-coherent batches must produce exact results via the tile path."""
    from scipy import spatial as sp

    from points2surf_tpu.ops.voxel import grid_query_points

    pts = (rng.rand(20000, 3).astype(np.float32) * 1.2) - 0.6
    pad = np.zeros((32768, 3), np.float32)
    pad[:20000] = pts
    q = grid_query_points(pts, 128, 3)[:1024]

    tree = sp.cKDTree(pts)
    _, refi = tree.query(q, 32)
    cfg = PatchConfig(points_per_patch=32, sub_sample_size=0)
    out = extract_patches(
        jnp.asarray(pad), jnp.asarray(q), 20000, jax.random.key(0),
        cfg=cfg, train=False,
    )
    ids = np.asarray(out["patch_pts_ids"])
    recall = np.mean(
        [len(np.intersect1d(ids[i], refi[i])) / 32 for i in range(1024)]
    )
    assert recall > 0.999


def test_eval_approx_select_lever(rng, monkeypatch):
    """Approximate top-k selection is the DEFAULT for coherent kNN eval
    sweeps since the round-5 reconstruction-grade gate (docs/VALIDATION.md
    round 5); P2S_EVAL_APPROX_SELECT=0 restores exact selection, and
    spread GT-eval callers (coherent=False) stay exact regardless.
    Observed by intercepting jax.lax.approx_max_k at trace time (fresh
    cloud sizes force fresh traces that re-read the env)."""
    calls = []
    lever_recalls = []
    real = jax.lax.approx_max_k

    def spy(*a, **k):
        calls.append(1)
        lever_recalls.append(k.get("recall_target"))
        return real(*a, **k)

    monkeypatch.setattr(jax.lax, "approx_max_k", spy)
    # b < 64 keeps the tile path off either way (extract_patches use_tiles)
    q = _cloud(rng, 5)
    cfg = PatchConfig(points_per_patch=33, patch_radius=0.0,
                      sub_sample_size=0)
    monkeypatch.delenv("P2S_EVAL_APPROX_SELECT", raising=False)
    pts = _cloud(rng, 531)
    out = extract_patches(jnp.asarray(pts), jnp.asarray(q), pts.shape[0],
                          jax.random.key(0), cfg=cfg, train=False)
    assert calls  # default: approximate selection (gated round 5)
    assert np.asarray(out["patch_pts_ps"]).shape == (5, 33, 3)
    monkeypatch.setenv("P2S_EVAL_APPROX_SELECT", "0")
    calls.clear()
    pts2 = _cloud(rng, 532)
    extract_patches(jnp.asarray(pts2), jnp.asarray(q), pts2.shape[0],
                    jax.random.key(0), cfg=cfg, train=False)
    assert not calls  # opt-out restores exact selection
    # spread GT-eval callers (coherent=False) keep exact selection even
    # with the default-on lever
    monkeypatch.delenv("P2S_EVAL_APPROX_SELECT", raising=False)
    calls.clear()
    pts3 = _cloud(rng, 533)
    extract_patches(jnp.asarray(pts3), jnp.asarray(q), pts3.shape[0],
                    jax.random.key(0), cfg=cfg, train=False, coherent=False)
    assert not calls
    # the TRAINING extraction (fused train step calls coherent=True) must
    # not pick up the eval lever — the round-5 gate covered eval sweeps
    # only. Train legitimately uses dense-approx draws at recall 0.95;
    # the lever's per-query selection is recognizable by recall 0.999.
    calls.clear()
    lever_recalls.clear()
    pts4 = _cloud(rng, 534)
    extract_patches(jnp.asarray(pts4), jnp.asarray(q), pts4.shape[0],
                    jax.random.key(0), cfg=cfg, train=True)
    assert 0.999 not in lever_recalls


def test_eval_approx_select_lever_tile_path(rng, monkeypatch):
    """The lever must also reach the Morton-TILE kNN path (the production
    grid-sweep route): per-tile selection switches from exact top-k (the
    single largest extraction stage, docs/PERFORMANCE.md round 4) to
    approx_max_k at recall 0.999, while keeping >= 0.95 measured recall
    against the scipy oracle."""
    import scipy.spatial as sp

    from points2surf_tpu.ops.voxel import grid_query_points

    calls = []
    real = jax.lax.approx_max_k

    def spy(*a, **k):
        calls.append(k.get("recall_target"))
        return real(*a, **k)

    monkeypatch.setattr(jax.lax, "approx_max_k", spy)
    monkeypatch.setenv("P2S_EVAL_APPROX_SELECT", "1")

    pts = (rng.rand(20000, 3).astype(np.float32) * 1.2) - 0.6
    pad = np.zeros((32768, 3), np.float32)
    pad[:20000] = pts
    q = grid_query_points(pts, 128, 3)[:256]
    cfg = PatchConfig(points_per_patch=32, sub_sample_size=0)
    out = extract_patches(
        jnp.asarray(pad), jnp.asarray(q), 20000, jax.random.key(0),
        cfg=cfg, train=False,
    )
    assert 0.999 in calls  # the per-tile selection engaged the lever
    ids = np.asarray(out["patch_pts_ids"])
    _, refi = sp.cKDTree(pts).query(q, 32)
    recall = np.mean(
        [len(np.intersect1d(ids[i], refi[i])) / 32 for i in range(len(q))]
    )
    assert recall > 0.95, recall


def test_subsample_candidates_env_lever(monkeypatch, capsys):
    """P2S_SUBSAMPLE_CANDIDATES (eval-throughput lever) feeds the eval
    PatchConfig: valid integers override the default (and are announced),
    garbage falls back to the default with a warning instead of crashing
    (advisor round 4)."""
    from points2surf_tpu.infer.evaluator import (
        EVAL_SUBSAMPLE_CANDIDATES,
        _subsample_candidates_from_env,
    )

    # the eval-path default is the round-5 gated depth, NOT the library-
    # wide PatchConfig default the training path keeps
    default = EVAL_SUBSAMPLE_CANDIDATES
    assert default == 4 and PatchConfig.subsample_candidates == 8
    monkeypatch.delenv("P2S_SUBSAMPLE_CANDIDATES", raising=False)
    assert _subsample_candidates_from_env() == default

    monkeypatch.setenv("P2S_SUBSAMPLE_CANDIDATES", "8")
    assert _subsample_candidates_from_env() == 8
    assert "subsample_candidates=8" in capsys.readouterr().out

    monkeypatch.setenv("P2S_SUBSAMPLE_CANDIDATES", "fast")
    assert _subsample_candidates_from_env() == default
    assert "WARNING" in capsys.readouterr().out

    # wiring: the override changes which candidate depth the extraction
    # actually uses (n_cand scales with the decimation factor)
    monkeypatch.setenv("P2S_SUBSAMPLE_CANDIDATES", "2")
    cfg = PatchConfig(points_per_patch=33, patch_radius=0.0,
                      sub_sample_size=64,
                      subsample_candidates=_subsample_candidates_from_env())
    assert cfg.subsample_candidates == 2
