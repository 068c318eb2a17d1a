"""Trainer behavior: refine/resume, LR schedule, checkpoint artifacts."""

import argparse
import os

import numpy as np
import pytest


def _opt(tmp, **kw):
    d = dict(
        name="t", desc="t", indir="/root/repo/datasets/abc_minimal",
        outdir=os.path.join(tmp, "models"),
        logdir=os.path.join(tmp, "logs"),
        trainset="trainset.txt", testset="valset.txt",
        save_interval=1, debug_interval=100, refine="",
        patch_radius=0.0, net_size=32, nepoch=1, batchSize=32,
        patch_center="mean", patch_point_count_std=0,
        patches_per_shape=48, sub_sample_size=32, workers=0,
        cache_capacity=4, seed=11, single_transformer=0,
        uniform_subsample=0, fixed_subsample=0, shared_transformer=0,
        training_order="random_shape_consecutive", identical_epochs=0,
        lr=0.01, scheduler_steps=[2, 4], momentum=0.9,
        normal_loss="ms_euclidean",
        outputs=["imp_surf_magnitude", "imp_surf_sign", "patch_pts_ids",
                 "p_index"],
        use_point_stn=0, use_feat_stn=0, sym_op="max",
        points_per_patch=16, debug=0,
    )
    d.update(kw)
    return argparse.Namespace(**d)


def test_train_and_refine_resume(tmp_path):
    from points2surf_tpu.train.trainer import Trainer

    opt = _opt(str(tmp_path), nepoch=2)
    tr = Trainer(opt)
    tr.train()
    snap = os.path.join(str(tmp_path), "models", "t_model_1.npz")
    assert os.path.isfile(snap)
    assert os.path.isfile(
        os.path.join(str(tmp_path), "models", "t_params.json")
    )

    # resume from the epoch-1 snapshot: starts at epoch 2
    opt2 = _opt(str(tmp_path), nepoch=3, refine=snap)
    tr2 = Trainer(opt2)
    assert tr2.start_epoch == 2
    # optimizer momentum restored (non-zero after prior steps)
    leaves = [
        np.asarray(x)
        for x in __import__("jax").tree_util.tree_leaves(tr2.opt_state)
        if hasattr(x, "shape") and getattr(x, "size", 0) > 1
    ]
    assert any(np.abs(l).max() > 0 for l in leaves)
    tr2.train()  # one more epoch runs


def test_log_every_batch_restores_reference_cadence(tmp_path):
    """--log_every_batch 1 must emit one train total-loss scalar per train
    batch (reference points_to_surf_train.py:474-478); default cadence is
    every --debug_interval batches."""
    from points2surf_tpu.train.trainer import Trainer

    class CountingWriter:
        def __init__(self):
            self.tags = []

        def add_scalar(self, tag, value, step):
            self.tags.append(tag)

        def flush(self):
            pass

    for every_batch, expect_all in ((1, True), (0, False)):
        w = CountingWriter()
        opt = _opt(str(tmp_path), debug_interval=100,
                   log_every_batch=every_batch, nepoch=1)
        tr = Trainer(opt, log_writer=w)
        tr.train()
        n_train_scalars = sum(
            1 for t in w.tags if t == "loss/train/total"
        )
        if expect_all:
            assert n_train_scalars == tr.steps_per_epoch
        else:
            # debug_interval=100 > steps_per_epoch: only batch 0 and the
            # final batch log
            assert n_train_scalars < tr.steps_per_epoch
            assert n_train_scalars >= 1


def test_lr_schedule_steps(tmp_path):
    from points2surf_tpu.train.trainer import Trainer

    opt = _opt(str(tmp_path), scheduler_steps=[2, 4], lr=0.01)
    tr = Trainer(opt)
    s = tr.steps_per_epoch
    assert float(tr.lr_schedule(0)) == pytest.approx(0.01)
    assert float(tr.lr_schedule(2 * s)) == pytest.approx(0.001)
    assert float(tr.lr_schedule(4 * s)) == pytest.approx(1e-4)


def test_output_spec_regression_variant():
    from points2surf_tpu.train.trainer import output_spec

    dim, names, w = output_spec(["imp_surf", "patch_pts_ids", "p_index"])
    assert dim == 1 and names == ["imp_surf"]
    dim, names, w = output_spec(
        ["imp_surf_magnitude", "imp_surf_sign", "patch_pts_ids", "p_index"]
    )
    assert dim == 2
    with pytest.raises(ValueError):
        output_spec(["patch_pts_ids"])
    with pytest.raises(ValueError):
        output_spec(["bogus"])


def test_eval_loader_commits_weights_to_device(tmp_path):
    """load_model_for_eval must return device-committed jax Arrays, not
    host numpy: numpy leaves are re-uploaded on every jitted batch call
    (measured 3x slower grid sweeps through the TPU tunnel)."""
    import argparse as ap

    import jax

    from points2surf_tpu.infer.evaluator import load_model_for_eval
    from points2surf_tpu.train.trainer import Trainer

    Trainer(_opt(str(tmp_path))).train()
    eval_opt = ap.Namespace(
        modeldir=os.path.join(str(tmp_path), "models"),
        modelpostfix="_model.npz", parampostfix="_params.json",
    )
    _, params, batch_stats, _ = load_model_for_eval(eval_opt, "t")
    for leaf in jax.tree_util.tree_leaves((params, batch_stats)):
        assert isinstance(leaf, jax.Array)


def test_train_dtype_bfloat16(tmp_path):
    """--train_dtype bfloat16: activations bf16, but params, batch stats,
    checkpoints, and reported losses stay float32."""
    import jax
    import jax.numpy as jnp

    from points2surf_tpu.train.trainer import Trainer

    opt = _opt(str(tmp_path), train_dtype="bfloat16")
    tr = Trainer(opt)
    assert tr.model.dtype == jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(tr.params):
        assert leaf.dtype == jnp.float32
    tr.train()
    for leaf in jax.tree_util.tree_leaves(tr.batch_stats):
        assert leaf.dtype == jnp.float32
    state = np.load(
        os.path.join(str(tmp_path), "models", "t_model.npz")
    )
    assert all(state[k].dtype != np.dtype("bfloat16") for k in state.files
               if state[k].dtype.kind == "f")
    # default stays float32 (reference-parity conservative default)
    tr32 = Trainer(_opt(str(tmp_path), name="t32"))
    assert tr32.model.dtype is None


def test_f32_finetune_epochs_anneals_dtype(tmp_path, capsys):
    """--f32_finetune_epochs N: with bf16 training, the final N epochs
    rebuild the jitted steps with float32 activations (precision
    annealing). Earlier epochs stay bf16."""
    import jax.numpy as jnp

    from points2surf_tpu.train.trainer import Trainer

    opt = _opt(str(tmp_path), train_dtype="bfloat16", nepoch=3,
               f32_finetune_epochs=1)
    tr = Trainer(opt)
    assert tr.model.dtype == jnp.bfloat16
    tr.train()
    # after training the model must have been switched to f32 for epoch 2
    assert tr.model.dtype is None
    out = capsys.readouterr().out
    assert "switching to float32 steps at epoch 2" in out
    # no-op when training is already float32
    tr32 = Trainer(_opt(str(tmp_path), name="t32f", nepoch=1,
                        f32_finetune_epochs=1))
    tr32.train()
    assert tr32.model.dtype is None
    # -1 = auto: max(5, nepoch//5) f32 tail epochs; with tiny nepoch the
    # polish covers the whole run (switch fires at the first epoch)
    tra = Trainer(_opt(str(tmp_path), name="tauto", nepoch=1,
                       train_dtype="bfloat16", f32_finetune_epochs=-1))
    tra.train()
    assert tra.model.dtype is None
    assert "switching to float32 steps at epoch 0" in capsys.readouterr().out


def test_eval_dtype_override(tmp_path):
    """--eval_dtype / P2S_EVAL_DTYPE (eval-throughput lever): overrides the
    inference activation dtype without touching the stored f32 params;
    'auto' keeps the checkpoint's training dtype (cli/eval_args.py)."""
    import jax
    import jax.numpy as jnp

    from points2surf_tpu.infer.evaluator import load_model_for_eval
    from points2surf_tpu.train.trainer import Trainer

    Trainer(_opt(str(tmp_path))).train()
    base = dict(
        modeldir=os.path.join(str(tmp_path), "models"),
        modelpostfix="_model.npz", parampostfix="_params.json",
    )
    model, _, _, _ = load_model_for_eval(
        argparse.Namespace(eval_dtype="auto", **base), "t"
    )
    assert model.dtype is None  # f32 checkpoint -> f32 activations
    model_bf, params_bf, _, _ = load_model_for_eval(
        argparse.Namespace(eval_dtype="bfloat16", **base), "t"
    )
    assert model_bf.dtype == jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(params_bf):
        assert leaf.dtype == jnp.float32  # storage stays f32
    # override must not leak back into the saved train opt namespace
    model_f32, _, _, topt = load_model_for_eval(
        argparse.Namespace(eval_dtype="float32", **base), "t"
    )
    assert model_f32.dtype is None
    assert getattr(topt, "train_dtype", "float32") == "float32"
