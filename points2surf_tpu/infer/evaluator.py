"""Evaluation / reconstruction driver (reference source/points_to_surf_eval.py).

Evaluates the trained SDF regressor over GT query points (eval mode) or over
all near-surface grid voxel centers (reconstruction mode). The inner loop is
the fused single-program SDF query (infer/query.py): per shape, fixed-size
query batches stream through patch extraction + forward + post-processing in
one XLA dispatch, and model-space distances accumulate on host.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.data.shapes import ShapeStore
from points2surf_tpu.infer.query import (
    drain_batched_results,
    make_sdf_query_fn,
)
from points2surf_tpu.ops.patches import PatchConfig
from points2surf_tpu.train import checkpoint as ckpt
from points2surf_tpu.train.trainer import build_model, output_spec
from points2surf_tpu.utils import file_utils, mesh_io


def visualize_query_points(query_pts_ms, query_dist_ms, file_out):
    """Red = outside, green = inside colored cloud (reference sdf.py:269-285)."""
    dist_abs = np.abs(query_dist_ms)
    dist_norm = dist_abs / max(float(dist_abs.max()), 1e-12)
    colors = np.zeros((query_dist_ms.shape[0], 3))
    neg = query_dist_ms < 0.0
    pos = query_dist_ms > 0.0
    colors[neg, 0] = 0.5 + 0.5 * dist_norm[neg]
    colors[pos, 1] = 0.5 + 0.5 * dist_norm[pos]
    mesh_io.write_ply(file_out, query_pts_ms, colors=colors)


#: Eval-path default for the Gumbel-subsample candidate decimation depth.
#: 4 (vs the library-wide PatchConfig default of 8) halves the subsample
#: selection cost (~14 ms/batch at batch 4096) and passed the
#: reconstruction-grade quality gate on the round-5 flagship: 12-shape
#: grid-256 A/B, per-shape HD/Chamfer within sampling noise (means
#: 0.0509/200.0 vs 0.0524/200.2) and GT-eval MSE bit-identical
#: (docs/VALIDATION.md round 5). The training path keeps the PatchConfig
#: default. Override with P2S_SUBSAMPLE_CANDIDATES.
EVAL_SUBSAMPLE_CANDIDATES = 4


def _subsample_candidates_from_env() -> int:
    """Parse the P2S_SUBSAMPLE_CANDIDATES eval lever, falling back to the
    gated eval default (with a warning) on a non-integer value, and
    announcing a non-default depth so it is visible in the run output."""
    default = EVAL_SUBSAMPLE_CANDIDATES
    raw = os.environ.get("P2S_SUBSAMPLE_CANDIDATES")
    if raw is None:
        return default
    try:
        value = int(raw)
    except ValueError:
        print(f"WARNING: P2S_SUBSAMPLE_CANDIDATES={raw!r} is not an "
              f"integer; using default {default}")
        return default
    if value != default:
        print(f"eval lever: subsample_candidates={value} "
              f"(P2S_SUBSAMPLE_CANDIDATES, default {default})")
    return value


def post_process(pred: np.ndarray, outputs, patch_radius, fixed_radius):
    """tanh^2 scaling back to model space + sign binarization
    (reference points_to_surf_eval.py:174-196). Kept for API parity and
    tests; the fused query path applies the same math on device."""
    pred = np.asarray(pred).copy()
    dim = 0
    for o in outputs:
        if o == "imp_surf":
            d = np.tanh(pred[:, dim]) ** 2 * np.sign(pred[:, dim])
            if not fixed_radius:
                d = d * patch_radius
            pred[:, dim] = d
            dim += 1
        elif o == "imp_surf_magnitude":
            m = np.tanh(pred[:, dim]) ** 2
            if not fixed_radius:
                m = m * patch_radius
            pred[:, dim] = m
            dim += 1
        elif o == "imp_surf_sign":
            pred[:, dim] = np.where(pred[:, dim] >= 0.0, 1.0, -1.0)
            dim += 1
    return pred


def load_model_for_eval(eval_opt, model_name):
    """Load params json + checkpoint -> (model, params, batch_stats,
    train_opt). Accepts reference .pth checkpoints transparently."""
    model_file = os.path.join(
        eval_opt.modeldir, model_name + eval_opt.modelpostfix
    )
    param_file = os.path.join(
        eval_opt.modeldir, model_name + eval_opt.parampostfix
    )
    if param_file.endswith(".pth"):
        from points2surf_tpu.models.import_torch import (
            convert_params_namespace,
        )

        train_opt = convert_params_namespace(param_file)
    else:
        train_opt = ckpt.load_params_namespace(param_file)
    # backward-compat defaults (reference eval.py:317-320)
    for attr, default in (
        ("single_transformer", 0),
        ("shared_transformer", 0),
        ("uniform_subsample", 0),
        ("fixed_subsample", 0),
        ("net_size", 1024),
    ):
        if not hasattr(train_opt, attr):
            setattr(train_opt, attr, default)

    pred_dim, _, _ = output_spec(train_opt.outputs)
    # inference dtype override (--eval_dtype / P2S_EVAL_DTYPE): activations
    # only — stored params and the checkpoint stay f32. 'auto' keeps the
    # checkpoint's training dtype (build_model's mapping).
    req = getattr(eval_opt, "eval_dtype", "auto")
    if req == "auto":
        req = os.environ.get("P2S_EVAL_DTYPE", "auto")
    if req in ("float32", "bfloat16"):
        orig_dtype = getattr(train_opt, "train_dtype", "float32")
        train_opt.train_dtype = req
        model = build_model(train_opt, pred_dim)
        train_opt.train_dtype = orig_dtype
    else:
        model = build_model(train_opt, pred_dim)
    if os.environ.get("P2S_EVAL_TAIL_BF16", "0") == "1":
        # engages in models/pointnet._pooled_tail at trace time
        print("eval lever: trunk-tail matmuls in bf16 (P2S_EVAL_TAIL_BF16)")

    if model_file.endswith(".pth"):
        from points2surf_tpu.models.import_torch import load_torch_checkpoint

        params, batch_stats = load_torch_checkpoint(model_file)
    else:
        dummy = {
            "patch_pts_ps": jnp.zeros((2, train_opt.points_per_patch, 3)),
            "pts_sub_sample_ms": jnp.zeros(
                (2, max(train_opt.sub_sample_size, 1), 3)
            ),
            "imp_surf_query_point_ms": jnp.zeros((2, 3)),
        }
        variables = model.init(jax.random.key(0), dummy, False)
        template = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        state = ckpt.load_state(model_file, template)
        params, batch_stats = state["params"], state["batch_stats"]
    # commit the loaded weights to device ONCE: checkpoint loaders return
    # host numpy leaves, and passing those to a jitted function re-uploads
    # the full ~25 MB parameter set on EVERY batch call (measured 3x
    # slower grid sweeps through the tunnel)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return model, params, batch_stats, train_opt


def points_to_surf_eval(eval_opt):
    models = eval_opt.models.split()

    for model_name in models:
        print(f"Random Seed: {eval_opt.seed}")
        model, params, batch_stats, train_opt = load_model_for_eval(
            eval_opt, model_name
        )
        batch_size = (
            eval_opt.batchSize if eval_opt.batchSize else train_opt.batchSize
        )
        fixed_radius = train_opt.patch_radius > 0.0

        store = ShapeStore(
            eval_opt.indir,
            eval_opt.dataset,
            with_query=True,
            reconstruction=bool(eval_opt.reconstruction),
            query_grid_resolution=eval_opt.query_grid_resolution,
            epsilon=eval_opt.epsilon,
            cache_capacity=eval_opt.cache_capacity,
        )
        patch_cfg = PatchConfig(
            points_per_patch=train_opt.points_per_patch,
            patch_radius=train_opt.patch_radius,
            sub_sample_size=train_opt.sub_sample_size,
            uniform_subsample=bool(train_opt.uniform_subsample),
            fixed_subsample=bool(train_opt.fixed_subsample),
            exact=bool(getattr(eval_opt, "exact_patch_sampling", 0)),
            # Gumbel-subsample candidate decimation depth: eval default 4
            # (reconstruction-grade gate passed, docs/VALIDATION.md round
            # 5; ~14 ms/batch saved at batch 4096); P2S_SUBSAMPLE_CANDIDATES
            # overrides, training keeps the PatchConfig default of 8.
            subsample_candidates=_subsample_candidates_from_env(),
        )
        # the reference augments any non-reconstruction pass
        # (data_loader.py:381-393); queries shard over the device mesh.
        # Multi-host runs split work per SHAPE across hosts (below), so
        # the sweep itself shards over the LOCAL chips only — a global
        # mesh would require all hosts to run identical programs.
        from points2surf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.local_devices())
        query_fn = make_sdf_query_fn(
            model, tuple(train_opt.outputs), patch_cfg, fixed_radius,
            augment=not eval_opt.reconstruction,
            mesh=mesh if mesh.devices.size > 1 else None,
            # reconstruction grids are Morton-ordered (tiles certify);
            # GT eval points are spread surface samples
            coherent=bool(eval_opt.reconstruction),
        )

        model_out_dir = os.path.join(
            eval_opt.outdir, "rec" if eval_opt.reconstruction else "eval"
        )
        os.makedirs(model_out_dir, exist_ok=True)

        rng = np.random.RandomState(eval_opt.seed)
        base_key = jax.random.key(eval_opt.seed)
        if eval_opt.reconstruction:
            # patch counts are lazy in reconstruction mode (grid queries are
            # computed per shape on first touch) — don't force a full scan
            print(f"reconstructing {len(store.shape_names)} shapes")
        else:
            print(f"evaluating {store.total_patch_count} patches")
        step = 0
        # host-side result writing (colored vis PLYs are slow IO) runs on a
        # background thread so the device starts the next shape immediately
        from concurrent.futures import ThreadPoolExecutor

        saver = ThreadPoolExecutor(max_workers=1)
        save_futures = []
        # multi-host eval parallelism is per-SHAPE: reconstruction shapes
        # are independent, so each host takes a round-robin share and
        # writes its own result files (SURVEY §2.4 sharded inference; the
        # within-host sweep is already sharded over local chips via
        # query_fn's mesh). full_eval barriers before the CSV reports.
        n_proc = jax.process_count()
        proc = jax.process_index()
        for shape_ind, name in enumerate(store.shape_names):
            if n_proc > 1 and shape_ind % n_proc != proc:
                continue
            shape = store.get(shape_ind)
            pts_dev, n_valid = store.device_points(shape_ind)
            small = n_valid < max(train_opt.sub_sample_size, 1)
            queries = shape.query_pts
            patch_inds = None
            if eval_opt.sampling == "sequential_shapes_random_patches":
                take = min(eval_opt.patches_per_shape, len(queries))
                patch_inds = rng.choice(len(queries), take, replace=False)
                queries = queries[patch_inds]
            elif eval_opt.sampling != "full":
                raise ValueError(
                    f"Unknown sampling strategy: {eval_opt.sampling}"
                )

            # dispatch all batches asynchronously, concatenate the per-batch
            # results ON DEVICE, and fetch ONE array per shape: per-batch
            # np.asarray costs a full host<->device round-trip each (~27 ms
            # tunneled), which at 500 batches/shape on large grids would be
            # ~13 s/shape of pure latency
            pending = []
            for s in range(0, len(queries), batch_size):
                q = queries[s : s + batch_size]
                n_q = len(q)
                if n_q < batch_size:
                    q = np.concatenate(
                        [q, np.repeat(q[:1], batch_size - n_q, axis=0)]
                    )
                step += 1
                d = query_fn(
                    params, batch_stats, pts_dev, jnp.asarray(q), n_valid,
                    jax.random.fold_in(base_key, step),
                    small_cloud=small,
                )
                pending.append(d)
            dists = drain_batched_results(pending, len(queries))

            # hand the writer plain arrays — touching the store from the
            # worker thread would race the main thread's LRU bookkeeping
            save_futures.append(saver.submit(
                _save_shape, name, queries, dists, eval_opt, model_out_dir
            ))
            if patch_inds is not None:
                np.savetxt(
                    os.path.join(model_out_dir, name + ".idx"),
                    patch_inds, fmt="%d",
                )
        for f in save_futures:
            f.result()  # surface any writer exception
        saver.shutdown()


def _save_shape(name, queries, dist, eval_opt, model_out_dir):
    """Write per-shape predictions (reference eval.py:199-294).

    Takes plain arrays (the queries actually evaluated — subsampled when
    ``sequential_shapes_random_patches``) so it can run on a writer thread
    without touching the ShapeStore."""

    if eval_opt.reconstruction:
        # NaN -> 1.0 (tanh cannot produce > 1; reference eval.py:205-207)
        dist = np.where(np.isnan(dist), 1.0, dist)
        qdir = os.path.join(model_out_dir, "query_pts_ms")
        ddir = os.path.join(model_out_dir, "dist_ms")
        os.makedirs(qdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)
        np.save(os.path.join(qdir, name + ".xyz.npy"), queries)
        np.save(os.path.join(ddir, name + ".xyz.npy"), dist)
        vdir = os.path.join(model_out_dir, "query_pts_ms_vis")
        os.makedirs(vdir, exist_ok=True)
        visualize_query_points(
            queries, dist, os.path.join(vdir, name + ".ply")
        )
    else:
        edir = os.path.join(model_out_dir, "eval")
        os.makedirs(edir, exist_ok=True)
        np.save(os.path.join(edir, name + ".xyz.npy"), dist)
        np.savetxt(os.path.join(edir, name + ".xyz.txt"), dist)
        vis = os.path.join(model_out_dir, "vis", name + ".ply")
        file_utils.make_dir_for_file(vis)
        visualize_query_points(queries, dist, vis)
