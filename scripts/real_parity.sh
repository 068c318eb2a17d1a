#!/usr/bin/env bash
# Released-checkpoint Chamfer parity, one command (BASELINE.md north star).
#
# This host has no egress (docs/VALIDATION.md), so stage the reference
# zips on any connected machine first:
#   https://www.cg.tuwien.ac.at/research/publications/2020/erler-2020-p2s/
#     erler-2020-p2s-{abc,famous,thingi10k,real_world}.zip
#     erler-2020-p2s-vanilla_model.zip  (and optionally max_model)
# then:
#   bash scripts/real_parity.sh /path/to/zips [vanilla|max] [dataset ...]
#
# Installs the zips into the reference layout, runs the vanilla eval
# protocol (grid 256, epsilon 3, sigma 5, certainty 13) straight from the
# released .pth checkpoint (no conversion step needed — the evaluator
# imports DataParallel state_dicts directly), and prints the per-set mean
# Chamfer from the generated CSVs for comparison against the paper's
# numbers.
set -euo pipefail

ZIP_DIR=${1:?usage: real_parity.sh ZIP_DIR [vanilla|max] [dataset ...]}
MODEL=${2:-vanilla}
shift || true
shift || true
DATASETS=("$@")
if [ ${#DATASETS[@]} -eq 0 ]; then
    DATASETS=(abc/testset.txt famous_original/testset.txt
              famous_noisefree/testset.txt famous_dense/testset.txt
              famous_sparse/testset.txt famous_extra_noisy/testset.txt
              thingi10k_scans_original/testset.txt)
fi

POSTFIX=_model_149.pth
[ "$MODEL" = max ] && POSTFIX=_model_249.pth

cd "$(dirname "$0")/.."

python -m points2surf_tpu.cli.download --from_local_zip "$ZIP_DIR" \
    datasets abc famous thingi10k
python -m points2surf_tpu.cli.download --from_local_zip "$ZIP_DIR" \
    models "$MODEL"

python -m points2surf_tpu.cli.full_eval \
    --indir datasets \
    --outdir results \
    --modeldir models \
    --dataset "${DATASETS[@]}" \
    --models "$MODEL" \
    --modelpostfix "$POSTFIX" \
    --parampostfix _params.pth \
    --batchSize 2048 \
    --workers 7 \
    --cache_capacity 5 \
    --query_grid_resolution 256 \
    --epsilon 3 \
    --certainty_threshold 13 \
    --sigma 5

echo "== mean Chamfer per test set (compare against BASELINE.md) =="
python - "$MODEL" "$POSTFIX" "${DATASETS[@]}" <<'EOF'
import csv, os, sys
model, postfix = sys.argv[1], sys.argv[2]
# full_eval writes under results/<models + modelpostfix-sans-ext>/
out_root = model + os.path.splitext(postfix)[0]
for ds in sys.argv[3:]:
    ds_dir = os.path.dirname(ds)
    path = os.path.join(
        "results", out_root, ds_dir, "rec",
        "hausdorff_dist_pred_rec.csv",
    )
    if not os.path.isfile(path):
        print(f"{ds_dir}: MISSING {path}")
        continue
    with open(path) as fh:
        rows = list(csv.DictReader(fh))
    key = [k for k in rows[0] if k.lower().startswith("chamfer")][0]
    vals = [float(r[key]) for r in rows if float(r[key]) >= 0.0]
    print(f"{ds_dir}: mean Chamfer {sum(vals)/max(len(vals),1):.6g} "
          f"over {len(vals)} shapes")
EOF
