"""Evaluation / reconstruction driver (reference source/points_to_surf_eval.py).

Evaluates the trained SDF regressor over GT query points (eval mode) or over
all near-surface grid voxel centers (reconstruction mode), streaming
fixed-size query batches through the fused on-device patch extractor + model
forward, and accumulating per-shape predictions across batch boundaries.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.data.pipeline import PatchPipeline
from points2surf_tpu.data.samplers import SequentialPatchSampler
from points2surf_tpu.data.shapes import ShapeStore
from points2surf_tpu.models import losses as L
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


def get_output_ids(outputs):
    """(reference points_to_surf_eval.py:68-78)"""
    return {
        "imp": [i for i, o in enumerate(outputs) if o == "imp_surf"],
        "ism": [i for i, o in enumerate(outputs) if o == "imp_surf_magnitude"],
        "iss": [i for i, o in enumerate(outputs) if o == "imp_surf_sign"],
    }


def post_process(pred: np.ndarray, outputs, patch_radius, fixed_radius):
    """tanh^2 scaling back to model space + sign binarization
    (reference points_to_surf_eval.py:174-196). pred modified out-of-place."""
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


def points_to_surf_eval(eval_opt):
    models = eval_opt.models.split()

    for model_name in models:
        print(f"Random Seed: {eval_opt.seed}")
        model_file = os.path.join(
            eval_opt.modeldir, model_name + eval_opt.modelpostfix
        )
        param_file = os.path.join(
            eval_opt.modeldir, model_name + eval_opt.parampostfix
        )
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
        model = build_model(train_opt, pred_dim)

        # template init + checkpoint load
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
        )
        # the reference augments any non-reconstruction pass
        # (data_loader.py:381-393)
        pipe = PatchPipeline(
            store,
            patch_cfg,
            augment=not eval_opt.reconstruction,
            seed=eval_opt.seed,
        )
        sampler = SequentialPatchSampler(store.shape_patch_count)

        model_out_dir = os.path.join(
            eval_opt.outdir, "rec" if eval_opt.reconstruction else "eval"
        )
        os.makedirs(model_out_dir, exist_ok=True)

        @jax.jit
        def forward(batch):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, False
            )

        print(f"evaluating {store.total_patch_count} patches")
        shape_ind = 0
        shape_offset = 0
        shape_count = store.shape_patch_count[shape_ind]
        shape_values = np.zeros((shape_count, pred_dim), np.float32)

        for batch in pipe.batches(iter(sampler), batch_size, with_gt=False):
            pred = forward(batch)
            radius = np.asarray(batch["patch_radius_ms"])
            pred_np = post_process(
                np.asarray(pred), train_opt.outputs, radius, fixed_radius
            )

            batch_offset = 0
            n = pred_np.shape[0]
            while batch_offset < n:
                take = min(shape_count - shape_offset, n - batch_offset)
                shape_values[shape_offset : shape_offset + take] = pred_np[
                    batch_offset : batch_offset + take
                ]
                batch_offset += take
                shape_offset += take
                if shape_offset == shape_count:
                    _save_shape(
                        store, shape_ind, shape_values, train_opt, eval_opt,
                        model_out_dir,
                    )
                    if shape_ind + 1 < len(store.shape_names):
                        shape_ind += 1
                        shape_offset = 0
                        shape_count = store.shape_patch_count[shape_ind]
                        shape_values = np.zeros(
                            (shape_count, pred_dim), np.float32
                        )


def _save_shape(store, shape_ind, shape_values, train_opt, eval_opt,
                model_out_dir):
    """Write per-shape predictions (reference eval.py:199-294)."""
    outputs = train_opt.outputs
    ids = get_output_ids(outputs)
    pred_dims = []
    d = 0
    for o in outputs:
        if o in ("imp_surf", "imp_surf_magnitude", "imp_surf_sign"):
            pred_dims.append(d)
            d += 1
        else:
            pred_dims.append(d)

    name = store.shape_names[shape_ind]
    if len(ids["imp"]) == 1:
        dist = shape_values[:, pred_dims[ids["imp"][0]]]
    elif len(ids["ism"]) == 1 and len(ids["iss"]) == 1:
        mag = shape_values[:, pred_dims[ids["ism"][0]]]
        sign = shape_values[:, pred_dims[ids["iss"][0]]]
        dist = mag * sign
    else:
        raise ValueError("No implicit surface outputs to save.")

    if eval_opt.reconstruction:
        shape = store.get(shape_ind)
        # NaN -> 1.0 (tanh cannot produce > 1; reference eval.py:205-207)
        dist = np.where(np.isnan(dist), 1.0, dist)
        qdir = os.path.join(model_out_dir, "query_pts_ms")
        ddir = os.path.join(model_out_dir, "dist_ms")
        os.makedirs(qdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)
        np.save(os.path.join(qdir, name + ".xyz.npy"), shape.query_pts)
        np.save(os.path.join(ddir, name + ".xyz.npy"), dist)
        vdir = os.path.join(model_out_dir, "query_pts_ms_vis")
        os.makedirs(vdir, exist_ok=True)
        visualize_query_points(
            shape.query_pts, dist, os.path.join(vdir, name + ".ply")
        )
    else:
        edir = os.path.join(model_out_dir, "eval")
        os.makedirs(edir, exist_ok=True)
        np.save(os.path.join(edir, name + ".xyz.npy"), dist)
        np.savetxt(os.path.join(edir, name + ".xyz.txt"), dist)
        shape = store.get(shape_ind)
        vis = os.path.join(model_out_dir, "vis", name + ".ply")
        file_utils.make_dir_for_file(vis)
        visualize_query_points(shape.query_pts, dist, vis)
