#!/usr/bin/env bash
# Full Cable pipeline: train-original -> visualize -> train-full -> visualize.
# Mirrors reference training/maskdino/run_train.sh:15-39 (with the filename
# drift fixed: that script calls 1_train_original.py etc. which don't exist).
set -uo pipefail
cd "$(dirname "$0")"

DATA_ROOT="${VIST_DATA_ROOT:-./data}"
OUT="${VIST_OUTPUT_ROOT:-./output}"
mkdir -p "$OUT/logs"

echo "=== step 1/4: train on original images ==="
python train_original.py --data-root "$DATA_ROOT" \
    --output-dir "$OUT/maskdino_original" "$@" \
    2>&1 | tee "$OUT/logs/train_original.log"

echo "=== step 2/4: visualize original model ==="
python visualize.py --model "$OUT/maskdino_original/checkpoints/ckpt_final" \
    --data-root "$DATA_ROOT" --output-dir "$OUT/vis_original" --comparison \
    2>&1 | tee "$OUT/logs/visualize_original.log"

echo "=== step 3/4: train on full set ==="
python train_full.py --data-root "$DATA_ROOT" \
    --output-dir "$OUT/maskdino_full" "$@" \
    2>&1 | tee "$OUT/logs/train_full.log"

echo "=== step 4/4: visualize full model ==="
python visualize.py --model "$OUT/maskdino_full/checkpoints/ckpt_final" \
    --data-root "$DATA_ROOT" --output-dir "$OUT/vis_full" --comparison \
    2>&1 | tee "$OUT/logs/visualize_full.log"

echo "=== results ==="
for f in "$OUT"/maskdino_*/results.json; do
  [ -f "$f" ] && echo "--- $f" && cat "$f"
done
