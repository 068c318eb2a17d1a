# Round-4 flagship: ~1k procedural shapes, vanilla architecture.
#
# The reference's flagship trains on ~5k ABC shapes for 150 epochs
# (reference README.md:119, experiments/train_p2s_vanilla.sh). This run
# keeps the vanilla protocol (lr 0.01, multistep 0.1 decay at 50%/83% of
# the run, batch ~1000, 1000 patches/shape/epoch) on the proc_1k
# procedural dataset; epoch count is wall-clock-bounded on the tunneled
# single-chip rig (snapshots every 2 epochs make any cutoff evaluable).
# NEPOCH/SCHED env override the epoch budget while keeping the decay
# points at 50%/83% of the run (defaults: 40 epochs, decay at 20/33).
#
# Dataset (deterministic; ~11 min CPU base meshes + ~75 min device
# scan/GT-SDF on the tunneled chip; 917 shapes survive the reference's
# 50k-face clean stage, splits 825 train / 90 test + valset_small = the
# first 8 test shapes):
#   python -m points2surf_tpu.cli.make_dataset --name proc_1k \
#       --procedural 1000 --workers 2 \
#       --procedural_styles csg csg bumpy hull csg thin bumpy hull
#   head -8 datasets/proc_1k/testset.txt > datasets/proc_1k/valset_small.txt
# The style cycle mixes all generator families INCLUDING 12.5% deliberate
# thin shapes (plates/rods/rings) alongside csg-incidental thin features —
# the cross-generator thin mix from docs/ROADMAP.md item 4.
#
# cache_capacity 1200 > shape count: every cloud stays device-resident
# after its first upload, so steady-state epochs pay zero cloud H2D
# through the ~25 ms tunnel (the dominant per-step overhead at 1k scale;
# docs/PERFORMANCE.md round 4).
python -m points2surf_tpu.cli.full_train \
    --name r4flagship_1k \
    --desc "round-4 flagship: 1k procedural shapes, vanilla protocol" \
    --indir 'datasets/proc_1k' \
    --outdir 'models' \
    --logdir 'logs' \
    --trainset 'trainset.txt' \
    --testset 'valset_small.txt' \
    --nepoch ${NEPOCH:-40} \
    --lr 0.01 \
    --scheduler_steps ${SCHED:-20 33} \
    --save_interval 2 \
    --debug 0 \
    --workers 2 \
    --batchSize 1000 \
    --points_per_patch 300 \
    --patches_per_shape 1000 \
    --sub_sample_size 1000 \
    --cache_capacity 1200 \
    --patch_radius 0.0 \
    --single_transformer 0 \
    --shared_transformer 1 \
    --uniform_subsample 0 \
    --fixed_subsample 0 \
    --use_point_stn 1 \
    --net_size 1024 \
    --patch_center 'mean' \
    --training_order 'random_shape_consecutive' \
    --outputs 'imp_surf_magnitude' 'imp_surf_sign' 'patch_pts_ids' 'p_index'
