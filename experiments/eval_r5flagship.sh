# Round-5 flagship eval: grid-256 reconstruction + mesh metrics on the
# proc_1k test split (91 shapes) and the proc_120-draw OOD set
# (scripts/make_oodeval.py — the round-3 thin-feature outlier shapes,
# regenerated deterministically for apples-to-apples comparison).
#
# Vanilla eval protocol (reference experiments/eval_p2s_vanilla.sh:
# grid 256, epsilon 3, certainty 13, sigma 5). CKPT overrides the
# checkpoint postfix (default: the rolling final model).
#
# Usage:
#   bash experiments/eval_r5flagship.sh                    # default path
#   LEVERS=1 bash experiments/eval_r5flagship.sh           # throughput levers
#   DATASETS="proc_oodeval/testset.txt" bash ...           # OOD only
# The round-5 gate made the throughput levers (decimation-4 subsample +
# approx coherent selection) the eval DEFAULTS; LEVERS=0 restores the
# exact pre-gate path for A/B reruns.
if [ "${LEVERS:-1}" = "0" ]; then
    export P2S_SUBSAMPLE_CANDIDATES=8
    export P2S_EVAL_APPROX_SELECT=0
    OUTDIR=${OUTDIR:-results_exact}
else
    OUTDIR=${OUTDIR:-results}
fi

python -m points2surf_tpu.cli.full_eval \
    --indir 'datasets' \
    --outdir "${OUTDIR}" \
    --modeldir 'models' \
    --dataset ${DATASETS:-proc_1k/testset.txt proc_oodeval/testset.txt} \
    --models r4flagship_1k \
    --modelpostfix "${CKPT:-_model.npz}" \
    --batchSize 4096 \
    --workers 7 \
    --cache_capacity 5 \
    --query_grid_resolution 256 \
    --epsilon 3 \
    --certainty_threshold 13 \
    --sigma 5
