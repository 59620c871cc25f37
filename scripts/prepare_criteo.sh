#!/usr/bin/env bash
# Raw Criteo logs -> libsvm + feature_map -> DeepFM training — the full
# Feature_pipeline -> Model_pipeline flow of the reference
# (deep_ctr/README.md:19: Feature_pipeline -> Model_pipeline ->
# Serving_pipeline), on the new stack.
#
#   RAW_DIR=/path/with/train.txt[,test.txt] OUT_DIR=/path/out bash scripts/prepare_criteo.sh
set -euo pipefail
cd "$(dirname "$0")/.."

RAW_DIR="${RAW_DIR:?set RAW_DIR to the directory containing criteo train.txt}"
OUT_DIR="${OUT_DIR:-$RAW_DIR/processed}"
CUTOFF="${CUTOFF:-200}"   # long-tail categorical cutoff (reference default)
MODEL_DIR="${MODEL_DIR:-$OUT_DIR/deepfm_model/}"

# 1. preprocess (prints "feature_size N field_size 39")
info=$(python -m tf_repos_tpu.features.criteo \
    --input_dir "$RAW_DIR/" --output_dir "$OUT_DIR/" --cutoff "$CUTOFF")
echo "$info"
FEATURE_SIZE=$(echo "$info" | awk '{print $2}')

# 2. feature statistics (long-tail profile)
python -m tf_repos_tpu.features.stats --input_glob "$OUT_DIR/tr.libsvm" --format libsvm | head -5

# 3. train DeepFM with the reference's same-hyper settings
#    (--packed_cache: parse the text once, memmap packed arrays on every
#    later epoch/run; --static_fields=13 matches the preprocessor's
#    constant-id continuous layout)
python -m tf_repos_tpu.main --model=DeepFM --task_type=train \
    --feature_size="$FEATURE_SIZE" --field_size=39 --embedding_size=16 \
    --deep_layers=400,400,400 --dropout=0.5,0.5,0.5 \
    --batch_size=4096 --learning_rate=0.0005 --optimizer=Adam --l2_reg=0.0001 \
    --num_epochs=1 --log_steps=100 --packed_cache=True --static_fields=13 \
    --data_dir="$OUT_DIR" --model_dir="$MODEL_DIR" "$@"

# 4. evaluate + export a servable
python -m tf_repos_tpu.main --model=DeepFM --task_type=eval \
    --feature_size="$FEATURE_SIZE" --field_size=39 --embedding_size=16 \
    --deep_layers=400,400,400 --data_dir="$OUT_DIR" --model_dir="$MODEL_DIR" "$@"
python -m tf_repos_tpu.main --model=DeepFM --task_type=export \
    --feature_size="$FEATURE_SIZE" --field_size=39 --embedding_size=16 \
    --deep_layers=400,400,400 --data_dir="$OUT_DIR" --model_dir="$MODEL_DIR" \
    --servable_model_dir="$OUT_DIR/servable" "$@"
echo "DONE: servable under $OUT_DIR/servable"
