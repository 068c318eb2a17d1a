"""Training entry point (reference full_train.py / points_to_surf_train.py).

Usage: python -m points2surf_tpu.cli.full_train --name vanilla --indir ...
"""

from __future__ import annotations

import os
import shutil


def points_to_surf_train(opt):
    from points2surf_tpu.train.trainer import Trainer

    log_dirname = os.path.join(opt.logdir, opt.name)
    model_filename = os.path.join(opt.outdir, f"{opt.name}_model.npz")

    # run-collision handling (reference train.py:183-198); non-interactive:
    # 'test' and fresh runs overwrite silently, matching automated use
    if os.path.exists(log_dirname):
        shutil.rmtree(log_dirname, ignore_errors=True)
    if os.path.exists(model_filename) and not getattr(opt, "refine", ""):
        pass  # overwrite on save

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(log_dirname, comment=opt.name)
        writer.add_scalar("LR", opt.lr, 0)
    except Exception:
        pass

    trainer = Trainer(opt, log_writer=writer)
    print(
        f"Training set: {len(trainer.train_sampler)} patches "
        f"({trainer.steps_per_epoch} batches) | "
        f"Test set: {len(trainer.test_sampler)} patches | "
        f"model: {trainer.num_params / 1e6:.1f}M params"
    )
    trainer.train()
    if writer is not None:
        writer.close()


def main(args=None):
    from points2surf_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    # multi-host (DCN) launch: wires the hosts into one SPMD program when
    # coordinator env vars / a TPU pod are present, else a no-op
    # (role of the reference's single-process DataParallel setup,
    # points_to_surf_train.py:413-414; SURVEY §2.4)
    from points2surf_tpu.parallel import distributed

    if distributed.initialize():
        import jax

        print(
            f"multi-host: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    from points2surf_tpu.cli.train_args import parse_arguments

    opt = parse_arguments(args)
    points_to_surf_train(opt)


if __name__ == "__main__":
    main()
