"""Training driver: pjit-style data-parallel train step + epoch loop.

TPU-native re-design of the reference training loop
(source/points_to_surf_train.py:167-534):

* one jitted train step — forward (batch-stats mode), loss, backward, SGD —
  with the batch sharded over the mesh's ``data`` axis and parameters
  replicated; XLA emits the gradient all-reduce over ICI (replacing
  torch.nn.DataParallel, :413-414);
* SGD momentum 0.9 + multi-step LR decay x0.1 at the configured epochs
  (:406-410), expressed as an optax piecewise-constant schedule in steps;
* interleaved test evaluation paced by training progress (:480-509);
* TensorBoard-compatible scalars with the reference's tag names (:137-164);
* checkpoints every save_interval epochs + log-spaced immutable snapshots
  (:511-517), including optimizer state (an improvement — the reference
  drops it).
"""

from __future__ import annotations

import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from points2surf_tpu.data.pipeline import PatchPipeline
from points2surf_tpu.data.samplers import (
    RandomPatchSampler,
    SequentialShapeRandomPatchSampler,
)
from points2surf_tpu.data.shapes import ShapeStore
from points2surf_tpu.models import losses as L
from points2surf_tpu.models.p2s import PointsToSurfModel
from points2surf_tpu.ops.patches import PatchConfig
from points2surf_tpu.parallel import make_mesh, replicate, shard_batch
from points2surf_tpu.parallel.distributed import (
    is_main_process,
    shard_host_batch,
    shard_host_tree,
)
from points2surf_tpu.train import checkpoint as ckpt

GREEN = "\033[92m"
BLUE = "\033[94m"


def _lookahead(it):
    """Yield (item, next_item) pairs; next_item is None at the end."""
    prev = None
    have_prev = False
    for item in it:
        if have_prev:
            yield prev, item
        prev = item
        have_prev = True
    if have_prev:
        yield prev, None
ENDC = "\033[0m"


def output_spec(outputs):
    """Map the `outputs` flag list to prediction dims / names / weights
    (reference points_to_surf_train.py:200-249)."""
    pred_dim = 0
    names = []
    weights = {}
    for o in outputs:
        if o in ("imp_surf", "imp_surf_magnitude", "imp_surf_sign"):
            names.append(o)
            weights[o] = 1.0
            pred_dim += 1
        elif o in ("p_index", "patch_pts_ids"):
            pass  # debug plumbing, no prediction dims (:235-244)
        else:
            raise ValueError(f"Unknown output: {o}")
    if pred_dim <= 0:
        raise ValueError("Prediction is empty for the given outputs.")
    return pred_dim, names, weights


def build_model(opt, pred_dim: int) -> PointsToSurfModel:
    # float32 activations are the production default: bf16 training
    # (~1.5x epoch speed) matches f32 on interleaved test f1 but
    # degrades sign acuity at the reconstruction grid near thin
    # features, which sign propagation can amplify into flooded
    # volumes — and a trailing f32 polish does not repair it
    # (docs/VALIDATION.md round 3). bfloat16 remains available for
    # f1-level experimentation. Params/batch-stats/loss stay f32.
    dtype = (
        jnp.bfloat16
        if getattr(opt, "train_dtype", "float32") == "bfloat16"
        else None
    )
    return PointsToSurfModel(
        net_size_max=opt.net_size,
        output_dim=pred_dim,
        use_point_stn=bool(opt.use_point_stn),
        use_feat_stn=bool(opt.use_feat_stn),
        sym_op=opt.sym_op,
        single_transformer=bool(opt.single_transformer),
        shared_transformation=bool(opt.shared_transformer),
        dtype=dtype,
    )


class Trainer:
    def __init__(self, opt, log_writer=None):
        self.opt = opt
        self.pred_dim, self.output_names, self.loss_weights = output_spec(
            opt.outputs
        )
        self.model = build_model(opt, self.pred_dim)
        self.fixed_radius = opt.patch_radius > 0.0
        self.mesh = make_mesh()
        # multi-host (DCN): every host runs the SAME deterministic sampler/
        # pipeline plan (seeded RNGs) but loads + uploads only its slice of
        # each global batch; jax assembles global arrays from the per-host
        # shards (parallel/mesh.shard_batch). Writers (TensorBoard,
        # checkpoints) stay on process 0.
        self.multi_host = jax.process_count() > 1
        self.host_multiple = (
            self.mesh.shape["data"] // jax.process_count()
            if self.multi_host else 1
        )
        self.log_writer = log_writer if is_main_process() else None

        self.patch_cfg = PatchConfig(
            points_per_patch=opt.points_per_patch,
            patch_radius=opt.patch_radius,
            sub_sample_size=opt.sub_sample_size,
            uniform_subsample=bool(opt.uniform_subsample),
            fixed_subsample=bool(opt.fixed_subsample),
        )

        self.train_store = ShapeStore(
            opt.indir,
            opt.trainset,
            with_query=True,
            cache_capacity=opt.cache_capacity,
        )
        self.test_store = ShapeStore(
            opt.indir,
            opt.testset,
            with_query=True,
            cache_capacity=opt.cache_capacity,
        )
        if self.multi_host:
            # cloud uploads must be GLOBAL (replicated) arrays — a plain
            # committed single-device array is not a legal pjit input when
            # the mesh spans processes
            self.train_store.mesh = self.mesh
            self.test_store.mesh = self.mesh
        # the reference applies rotation augmentation to train AND its
        # interleaved test batches (any non-reconstruction __getitem__,
        # data_loader.py:381-393)
        self.train_pipe = PatchPipeline(
            self.train_store, self.patch_cfg, augment=True, seed=opt.seed
        )
        self.test_pipe = PatchPipeline(
            self.test_store, self.patch_cfg, augment=True, seed=opt.seed + 1
        )

        self.train_sampler = self._make_sampler(self.train_store)
        self.test_sampler = self._make_sampler(self.test_store)

        self.steps_per_epoch = max(
            1, math.ceil(len(self.train_sampler) / opt.batchSize)
        )
        boundaries = {
            int(e) * self.steps_per_epoch: 0.1 for e in opt.scheduler_steps
        }
        self.lr_schedule = optax.piecewise_constant_schedule(opt.lr, boundaries)
        self.tx = optax.sgd(self.lr_schedule, momentum=opt.momentum)

        self._init_state()
        self._build_steps()

    # -- state ------------------------------------------------------------

    def _make_sampler(self, store):
        opt = self.opt
        if opt.training_order == "random":
            return RandomPatchSampler(
                store.shape_patch_count,
                opt.patches_per_shape,
                seed=opt.seed,
                identical_epochs=bool(opt.identical_epochs),
            )
        if opt.training_order == "random_shape_consecutive":
            return SequentialShapeRandomPatchSampler(
                store.shape_patch_count,
                opt.patches_per_shape,
                seed=opt.seed,
                identical_epochs=bool(opt.identical_epochs),
            )
        raise ValueError(f"Unknown training order: {opt.training_order}")

    def _init_state(self):
        opt = self.opt
        b = min(2, opt.batchSize)
        dummy = {
            "patch_pts_ps": jnp.zeros((b, opt.points_per_patch, 3)),
            "pts_sub_sample_ms": jnp.zeros((b, max(opt.sub_sample_size, 1), 3)),
            "imp_surf_query_point_ms": jnp.zeros((b, 3)),
        }
        variables = self.model.init(jax.random.key(opt.seed), dummy, True)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        self.global_step = 0
        self.start_epoch = 0

        if getattr(opt, "refine", ""):
            print(f"Refining weights from {opt.refine}")
            state = ckpt.load_state(opt.refine, self.state_dict())
            self.params = state["params"]
            self.batch_stats = state["batch_stats"]
            self.opt_state = state["opt_state"]
            self.start_epoch = ckpt.epoch_from_filename(opt.refine)
            self.global_step = self.start_epoch * self.steps_per_epoch
            if self.start_epoch:
                print(f"Continuing training from epoch {self.start_epoch}")

        self.params = replicate(self.params, self.mesh)
        self.batch_stats = replicate(self.batch_stats, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)

    def state_dict(self):
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
        }

    @property
    def num_params(self) -> int:
        return sum(
            x.size for x in jax.tree_util.tree_leaves(self.params)
        )

    # -- jitted steps ------------------------------------------------------

    def _build_steps(self):
        model = self.model
        outputs = tuple(self.opt.outputs)
        weights = dict(self.loss_weights)
        fixed_radius = self.fixed_radius
        tx = self.tx

        def loss_fn(params, batch_stats, batch):
            pred, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                True,
                mutable=["batch_stats"],
            )
            # loss/metrics always in f32 (no-op unless train_dtype=bfloat16)
            pred = pred.astype(jnp.float32)
            loss_list = L.compute_loss(pred, batch, outputs, weights, fixed_radius)
            total = sum(loss_list)
            return total, (jnp.stack(loss_list), pred, mutated["batch_stats"])

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch):
            (_, (loss_list, pred, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = L.calc_metrics(outputs, pred, batch)
            return params, new_bs, opt_state, loss_list, metrics

        @jax.jit
        def eval_step(params, batch_stats, batch):
            pred = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, False
            )
            loss_list = L.compute_loss(pred, batch, outputs, weights, fixed_radius)
            metrics = L.calc_metrics(outputs, pred, batch)
            return jnp.stack(loss_list), metrics

        # fused step: patch extraction INSIDE the train program — one
        # dispatch per step, and XLA overlaps extraction with the model
        # graph. Used whenever a batch comes from a single shape (always,
        # under random_shape_consecutive ordering).
        import functools

        from points2surf_tpu.ops.patches import extract_patches

        patch_cfg = self.patch_cfg

        @functools.partial(jax.jit, static_argnames=("small_cloud",))
        def train_step_fused(params, batch_stats, opt_state, points, queries,
                             n_valid, gt, key, small_cloud: bool = False):
            batch = extract_patches(
                points, queries, n_valid, key,
                cfg=patch_cfg, train=True, small_cloud=small_cloud,
            )
            batch["imp_surf_ms"] = gt
            batch["imp_surf_magnitude_ms"] = jnp.abs(gt)
            batch["imp_surf_dist_sign_ms"] = (gt >= 0.0).astype(jnp.float32)
            return train_step(params, batch_stats, opt_state, batch)

        self._train_step = train_step
        self._train_step_fused = train_step_fused
        self._eval_step = eval_step

    # -- logging -----------------------------------------------------------

    def _log(self, prefix, train, epoch, batchind, fraction_done, num_batch,
             loss_list, metrics):
        """Fetch + log one step's scalars.

        NOTE: fetching forces a device sync, so the trainer only calls this
        every ``--debug_interval`` steps (the reference prints at the same
        cadence but syncs every step implicitly; skipping the off-interval
        TensorBoard points buys pipelined steps in between).

        All scalars are packed into ONE device array before fetching: each
        separate ``float(x)``/``np.asarray(x)`` costs a full tunnel
        round-trip (~27 ms), and the 6-7 per-log fetches of the naive form
        measured +155 ms/batch at debug_interval=1 (the r4gate runs'
        274 ms/batch vs the 119 ms step, docs/PERFORMANCE.md round 4).
        """
        opt = self.opt
        mkeys = tuple(sorted(metrics)) if metrics else ()
        flat = jnp.concatenate(
            [jnp.asarray(loss_list).reshape(-1)]
            + ([jnp.stack([metrics[k] for k in mkeys])] if mkeys else [])
        )
        flat_np = np.asarray(flat)  # one fetch for loss components + metrics
        n_loss = flat_np.shape[0] - len(mkeys)
        loss_np = flat_np[:n_loss]
        metrics = {k: flat_np[n_loss + i] for i, k in enumerate(mkeys)}
        loss_sum = float(loss_np.sum())
        current_step = (epoch + fraction_done) * num_batch * opt.batchSize
        w = self.log_writer
        if w is not None:
            tag = "train" if train else "eval"
            w.add_scalar(f"loss/{tag}/total", loss_sum, current_step)
            if len(loss_np) > 1:
                for wi, v in enumerate(loss_np):
                    w.add_scalar(
                        f"loss/{tag}/comp_{self.output_names[wi]}",
                        float(v),
                        current_step,
                    )
            for k in ("abs_dist_rms", "accuracy", "precision", "recall",
                      "f1_score"):
                if k in metrics:
                    v = float(metrics[k])
                    w.add_scalar(
                        f"metrics/{tag}/{k}",
                        0.0 if math.isnan(v) else v,
                        current_step,
                    )
        if batchind % opt.debug_interval == 0 and is_main_process():
            rmse = float(metrics.get("abs_dist_rms", float("nan")))
            f1 = float(metrics.get("f1_score", float("nan")))
            print(
                f"[{opt.name} {epoch}: {batchind}/{num_batch - 1}] {prefix} "
                f"loss: {loss_sum:+.2f}, rmse: {rmse:+.2f}, f1: {f1:+.2f}"
            )

    # -- main loop ----------------------------------------------------------

    def train(self):
        opt = self.opt
        model_filename = os.path.join(opt.outdir, f"{opt.name}_model.npz")
        if is_main_process():
            os.makedirs(opt.outdir, exist_ok=True)
            ckpt.save_params_namespace(
                os.path.join(opt.outdir, f"{opt.name}_params.json"), opt
            )
            with open(
                os.path.join(opt.outdir, f"{opt.name}_description.txt"), "w"
            ) as f:
                print(opt.desc, file=f)

        train_num_batch = self.steps_per_epoch
        test_num_batch = max(
            1, math.ceil(len(self.test_sampler) / opt.batchSize)
        )

        # opt-in profiler trace (aux subsystem; SURVEY §5 'tracing'):
        # set P2S_PROFILE_DIR to capture a jax.profiler trace of steps 5-10
        profile_dir = os.environ.get("P2S_PROFILE_DIR", "")
        profile_window = (5, 10) if profile_dir else None

        # deferred logging: fetching a step's scalars immediately would
        # sync the device queue every step (the round-1 throughput cap at
        # debug_interval=1); holding fetches back a few steps lets the
        # fetched step already be complete while later steps stay enqueued
        from collections import deque

        log_lag = 4
        pending_logs: deque = deque()

        def flush_logs(limit=None):
            while pending_logs and (
                limit is None or len(pending_logs) > limit
            ):
                self._log(*pending_logs.popleft())

        # precision annealing: with --train_dtype bfloat16 and
        # --f32_finetune_epochs N, the final N epochs rebuild the jitted
        # steps with float32 activations. Params/optimizer state are f32
        # storage either way, so the switch is just a re-jit; the f32
        # programs come out of the persistent compile cache. N = -1 (the
        # CLI default) resolves to max(5, nepoch // 5) — the 40/10 split
        # validated by the round-3 gates (docs/VALIDATION.md).
        f32_tail = int(getattr(opt, "f32_finetune_epochs", 0))
        if f32_tail < 0:
            f32_tail = max(5, opt.nepoch // 5)
        dtype_switch_epoch = opt.nepoch - f32_tail

        for epoch in range(self.start_epoch, opt.nepoch):
            t_epoch = time.time()
            if (
                self.model.dtype is not None
                and epoch >= dtype_switch_epoch
            ):
                print(
                    f"precision annealing: switching to float32 steps at "
                    f"epoch {epoch}"
                )
                self.model = self.model.clone(dtype=None)
                self._build_steps()
            if opt.identical_epochs:
                self.train_pipe.reset()
                self.test_pipe.reset()
            test_iter = self.test_pipe.batches(
                iter(self.test_sampler), opt.batchSize
            )
            test_batchind = -1
            test_fraction_done = 0.0

            for batchind, (item, next_item) in enumerate(
                _lookahead(
                    self.train_pipe.plan(
                        iter(self.train_sampler), opt.batchSize
                    )
                )
            ):
                if profile_window is not None:
                    if self.global_step == profile_window[0]:
                        jax.profiler.start_trace(profile_dir)
                    elif self.global_step == profile_window[1]:
                        jax.profiler.stop_trace()
                        profile_window = None
                if item[0] == "single":
                    # extraction fused into the train step: one dispatch
                    _, si, local_inds, gt = item
                    pts_dev, n_valid = self.train_store.device_points(si)
                    shape = self.train_store.get(si)
                    if self.multi_host:
                        # identical plan on every host; each host gathers
                        # and uploads only its slice of the global batch
                        local_inds = shard_host_batch(
                            local_inds, self.host_multiple
                        )
                        gt = shard_host_batch(gt, self.host_multiple)
                        if len(local_inds) == 0:
                            continue  # ragged tail smaller than the mesh
                    q = shape.query_pts[local_inds]
                    fused_in = shard_batch(
                        {"q": q, "gt": gt}, self.mesh,
                        from_host_shard=self.multi_host,
                    )
                    key = self.train_pipe.next_key()
                    (
                        self.params,
                        self.batch_stats,
                        self.opt_state,
                        loss_list,
                        metrics,
                    ) = self._train_step_fused(
                        self.params, self.batch_stats, self.opt_state,
                        pts_dev, fused_in["q"], n_valid, fused_in["gt"], key,
                        small_cloud=n_valid
                        < max(self.patch_cfg.sub_sample_size, 1),
                    )
                else:
                    b = (
                        shard_host_tree(item[1], self.host_multiple)
                        if self.multi_host else item[1]
                    )
                    batch = shard_batch(
                        b, self.mesh, from_host_shard=self.multi_host
                    )
                    (
                        self.params,
                        self.batch_stats,
                        self.opt_state,
                        loss_list,
                        metrics,
                    ) = self._train_step(
                        self.params, self.batch_stats, self.opt_state, batch
                    )
                # prefetch the NEXT shape's cloud (host load + async H2D)
                # while this step's work is still enqueued on device —
                # sampler order is known ahead (shape-consecutive), so the
                # upload hides behind compute instead of stalling the next
                # step at the shape switch
                if (
                    next_item is not None
                    and next_item[0] == "single"
                    and (item[0] != "single" or next_item[1] != item[1])
                ):
                    self.train_store.device_points(next_item[1])
                self.global_step += 1
                fraction_done = (batchind + 1) / train_num_batch
                # --log_every_batch restores the reference's TensorBoard
                # cadence (one scalar point per train batch,
                # points_to_surf_train.py:474-478) at the cost of a device
                # fetch per step; default logs at --debug_interval cadence
                if (
                    getattr(opt, "log_every_batch", 0)
                    or batchind % opt.debug_interval == 0
                    or batchind == train_num_batch - 1
                ):
                    pending_logs.append((
                        GREEN + "train" + ENDC, True, epoch, batchind,
                        fraction_done, train_num_batch, loss_list, metrics,
                    ))
                    flush_logs(limit=log_lag)

                # interleave test batches paced by train progress (:480-509)
                while (
                    test_fraction_done <= fraction_done
                    and test_batchind + 1 < test_num_batch
                ):
                    tb = next(test_iter, None)
                    if tb is None:
                        break
                    test_batchind += 1
                    if self.multi_host:
                        tb = shard_host_tree(tb, self.host_multiple)
                    tb = shard_batch(
                        tb, self.mesh, from_host_shard=self.multi_host
                    )
                    loss_t, metrics_t = self._eval_step(
                        self.params, self.batch_stats, tb
                    )
                    test_fraction_done = (test_batchind + 1) / test_num_batch
                    pending_logs.append((
                        BLUE + "test" + ENDC, False, epoch, test_batchind,
                        test_fraction_done, train_num_batch, loss_t, metrics_t,
                    ))
                    flush_logs(limit=log_lag)

            flush_logs()  # drain deferred scalars before checkpointing
            # process 0 writes checkpoints; params are replicated, so its
            # local shards carry the full state
            if is_main_process():
                if epoch % opt.save_interval == 0 or epoch == opt.nepoch - 1:
                    ckpt.save_state(model_filename, self.state_dict())
                if ckpt.is_snapshot_epoch(epoch, opt.nepoch):
                    ckpt.save_state(
                        os.path.join(
                            opt.outdir, f"{opt.name}_model_{epoch}.npz"
                        ),
                        self.state_dict(),
                    )

            lr_now = float(self.lr_schedule(self.global_step))
            if self.log_writer is not None:
                self.log_writer.add_scalar(
                    "LR", lr_now,
                    (epoch + 1) * train_num_batch * opt.batchSize - 1,
                )
                self.log_writer.flush()
            print(
                f"epoch {epoch} done in {time.time() - t_epoch:.1f}s "
                f"(lr {lr_now:g})"
            )
