"""Worker process for the 2-process multi-host CPU test.

Launched by tests/test_multiprocess.py with:
    python _mp_worker.py <process_id> <num_processes> <coordinator> <outdir>

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent) and
runs the REAL Trainer end-to-end on abc_minimal: deterministic per-host
batch slicing (shard_host_batch), global-array assembly
(make_array_from_process_local_data), replicated params via callback, and
process-0-only checkpoint writing.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("process_id", type=int)
    ap.add_argument("num_processes", type=int)
    ap.add_argument("coordinator")
    ap.add_argument("outdir")
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from points2surf_tpu.parallel import distributed

    assert distributed.initialize(
        coordinator_address=a.coordinator,
        num_processes=a.num_processes,
        process_id=a.process_id,
    )
    assert jax.process_count() == a.num_processes
    assert jax.device_count() == a.num_processes * jax.local_device_count()

    from points2surf_tpu.train.trainer import Trainer

    opt = argparse.Namespace(
        name="mp", desc="mp", indir="datasets/abc_minimal",
        outdir=os.path.join(a.outdir, "models"),
        logdir=os.path.join(a.outdir, "logs"),
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
        outputs=["imp_surf_magnitude", "imp_surf_sign"],
        use_point_stn=0, use_feat_stn=0, sym_op="max",
        points_per_patch=16, debug=0,
    )
    tr = Trainer(opt)
    assert tr.multi_host, "trainer must detect the multi-process launch"
    tr.train()

    # the final params are identical on every host (all-reduced grads)
    import numpy as np

    leaves = jax.tree_util.tree_leaves(tr.params)
    digest = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
    print(f"WORKER_OK pid={a.process_id} digest={digest:.6f}")


if __name__ == "__main__":
    main()
