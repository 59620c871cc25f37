#!/usr/bin/env bash
# Smoke-run the whole model zoo end-to-end at 1 epoch each — parity with
# the reference's run.sh (/root/reference/deep_ctr/run.sh executes every
# model against Criteo with full hyperparameter sets). Uses synthetic
# Criteo-shaped data unless DATA_DIR points at a real preprocessed set
# (features/criteo.py output).
#
#   DATA_DIR=/path/to/criteo FEATURE_SIZE=117581 bash scripts/run.sh
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR="${DATA_DIR:-/tmp/tf_repos_tpu_smoke/criteo}"
FEATURE_SIZE="${FEATURE_SIZE:-100000}"
MODEL_ROOT="${MODEL_ROOT:-/tmp/tf_repos_tpu_smoke/models}"
EPOCHS="${EPOCHS:-1}"
BATCH="${BATCH:-256}"
TRAIN_LINES="${TRAIN_LINES:-5000}"
# MODELS: space-separated subset of the libsvm zoo (CI fast mode runs
# MODELS="DeepFM" TRAIN_LINES=500); SKIP_CSV/SKIP_ALICCP skip those legs
MODELS="${MODELS:-LR FNN IPNN OPNN DeepFM NFM AFM DCN DeepMVM}"

if [ ! -f "$DATA_DIR/tr.libsvm" ]; then
  python -m tf_repos_tpu.data.synthetic --out_dir "$DATA_DIR" \
      --format libsvm --feature_size "$FEATURE_SIZE" --train "$TRAIN_LINES" --valid 500 --test 500
fi
CSV_DIR="$DATA_DIR/csv"
if [ ! -f "$CSV_DIR/tr.csv" ]; then
  python -m tf_repos_tpu.data.synthetic --out_dir "$CSV_DIR" --format csv
fi
ALICCP_DIR="$DATA_DIR/aliccp"
if [ ! -f "$ALICCP_DIR/tr.samples.txt" ]; then
  python -m tf_repos_tpu.data.synthetic --out_dir "$ALICCP_DIR" \
      --format aliccp --feature_size 5000
fi

common="--feature_size=$FEATURE_SIZE --field_size=39 --embedding_size=16 \
  --deep_layers=256,128,64 --dropout=0.8,0.8,0.8 --num_epochs=$EPOCHS \
  --batch_size=$BATCH --learning_rate=0.0005 --optimizer=Adam --l2_reg=0.0001 \
  --log_steps=10 --eval_throttle_secs=0 --dt_dir=smoke"

# libsvm zoo (reference run.sh order: LR ... DCN, deep_ctr/run.sh:7-24)
for model in $MODELS; do
  echo "==== $model ===="
  python -m tf_repos_tpu.main --model="$model" --task_type=train \
      --data_dir="$DATA_DIR" --model_dir="$MODEL_ROOT/$model/" $common
  python -m tf_repos_tpu.main --model="$model" --task_type=infer \
      --data_dir="$DATA_DIR" --model_dir="$MODEL_ROOT/$model/" $common
done

if [ -z "${SKIP_CSV:-}" ]; then
echo "==== wide_n_deep (csv) ===="
python -m tf_repos_tpu.main --model=wide_n_deep --task_type=train \
    --data_dir="$CSV_DIR" --model_dir="$MODEL_ROOT/wdl/" \
    --field_size=39 --embedding_size=16 --deep_layers=128,64 --dropout=0.8,0.8 \
    --num_epochs="$EPOCHS" --batch_size="$BATCH" --log_steps=10 \
    --eval_throttle_secs=0 --dt_dir=smoke
fi

if [ -z "${SKIP_ALICCP:-}" ]; then
for model in DIN ESMM; do
  echo "==== $model (aliccp) ===="
  python -m tf_repos_tpu.main --model="$model" --task_type=train \
      --data_dir="$ALICCP_DIR" --model_dir="$MODEL_ROOT/$model/" \
      --feature_size=5000 --field_size=11 --embedding_size=16 \
      --deep_layers=128,64 --dropout=0.8,0.8 --multi_hot_pad=32 \
      --num_epochs="$EPOCHS" --batch_size="$BATCH" --log_steps=10 \
      --eval_throttle_secs=0 --dt_dir=smoke
done
fi

echo "ALL MODELS OK"
