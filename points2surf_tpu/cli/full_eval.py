"""Full evaluation + reconstruction driver (reference full_eval.py).

Per dataset: SDF evaluation against GT query distances (when available) +
MSE CSV, grid reconstruction, volume -> mesh extraction, and
Hausdorff/Chamfer comparison CSVs.
"""

from __future__ import annotations

import os
import time


def full_eval(opt):
    import jax

    from points2surf_tpu.evalx import metrics
    from points2surf_tpu.infer import meshing
    from points2surf_tpu.infer.evaluator import points_to_surf_eval

    # multi-host: shapes round-robin across hosts (evaluator + meshing),
    # barriers between stages, CSV reports on process 0 only
    n_proc = jax.process_count()
    proc = jax.process_index()

    def barrier(name):
        if n_proc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    indir_root = opt.indir
    outdir_root = os.path.join(
        opt.outdir, opt.models + os.path.splitext(opt.modelpostfix)[0]
    )
    datasets = opt.dataset if isinstance(opt.dataset, list) else [opt.dataset]
    for dataset in datasets:
        print(f"Evaluating on dataset {dataset}")
        opt.indir = os.path.join(indir_root, os.path.dirname(dataset))
        opt.outdir = os.path.join(outdir_root, os.path.dirname(dataset))
        opt.dataset = os.path.basename(dataset)

        if os.path.exists(os.path.join(opt.indir, "05_query_dist")):
            opt.reconstruction = False
            points_to_surf_eval(opt)
            barrier("eval_done")
            res_dir_eval = os.path.join(opt.outdir, "eval")
            if proc == 0:
                metrics.eval_predictions(
                    os.path.join(res_dir_eval, "eval"),
                    os.path.join(opt.indir, "05_query_dist"),
                    os.path.join(res_dir_eval, "rme_comp_res.csv"),
                    unsigned=False,
                )

        start = time.time()
        opt.reconstruction = True
        points_to_surf_eval(opt)
        barrier("reconstruction_done")
        res_dir_rec = os.path.join(opt.outdir, "rec")
        print(f"Inference of SDF took: {time.time() - start}")

        start = time.time()
        meshing.implicit_surface_to_mesh_directory(
            os.path.join(res_dir_rec, "dist_ms"),
            os.path.join(res_dir_rec, "query_pts_ms"),
            os.path.join(res_dir_rec, "vol"),
            os.path.join(res_dir_rec, "mesh"),
            opt.query_grid_resolution,
            opt.sigma,
            opt.certainty_threshold,
            opt.workers,
            shard=(proc, n_proc) if n_proc > 1 else None,
        )
        barrier("meshing_done")
        print(f"Meshing took: {time.time() - start}")

        if proc == 0:
            metrics.mesh_comparison(
                new_meshes_dir_abs=os.path.join(res_dir_rec, "mesh"),
                ref_meshes_dir_abs=os.path.join(opt.indir, "03_meshes"),
                num_processes=opt.workers,
                report_name=os.path.join(
                    res_dir_rec, "hausdorff_dist_pred_rec.csv"
                ),
                samples_per_model=10000,
                dataset_file_abs=os.path.join(opt.indir, opt.dataset),
            )


def main(args=None):
    from points2surf_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    from points2surf_tpu.parallel import distributed

    if distributed.initialize():
        import jax

        print(
            f"multi-host: process {jax.process_index()}/"
            f"{jax.process_count()}, shapes round-robin across hosts"
        )
    from points2surf_tpu.cli.eval_args import parse_arguments

    full_eval(parse_arguments(args))
    print("points2surf_tpu eval is finished!")


if __name__ == "__main__":
    main()
