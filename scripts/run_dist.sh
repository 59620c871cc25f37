#!/usr/bin/env bash
# Localhost multi-process distributed training — parity with the
# reference's run_dist.sh (spawns 1 ps + 3 workers on localhost,
# /root/reference/deep_ctr/run_dist.sh:6-37). Here there are no roles:
# each process is an identical SPMD worker wired by jax.distributed
# (dist_mode=2, worker_hosts list, task_index per process), each given 2
# virtual CPU devices so the test runs anywhere; on a real TPU pod drop
# the JAX_PLATFORMS/XLA_FLAGS overrides and run one process per host.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR="${DATA_DIR:-/tmp/tf_repos_tpu_smoke/criteo_dist}"
FEATURE_SIZE="${FEATURE_SIZE:-100000}"
MODEL_DIR="${MODEL_DIR:-/tmp/tf_repos_tpu_smoke/dist_model/}"
PORT="${PORT:-12355}"
NPROC="${NPROC:-2}"

if [ ! -f "$DATA_DIR/tr.part0.libsvm" ]; then
  python -m tf_repos_tpu.data.synthetic --out_dir "$DATA_DIR" \
      --format libsvm --feature_size "$FEATURE_SIZE" --train 5000 --valid 1000 --test 1000 \
      --shards 4
fi

hosts="127.0.0.1:$PORT"
for ((i = 1; i < NPROC; i++)); do hosts="$hosts,127.0.0.1:$((PORT + i))"; done

pids=()
for ((i = 0; i < NPROC; i++)); do
  JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=2" \
  python -m tf_repos_tpu.main --model=DeepFM --task_type=train \
      --dist_mode=2 --worker_hosts="$hosts" --job_name=worker --task_index="$i" \
      --data_dir="$DATA_DIR" --model_dir="$MODEL_DIR" --dt_dir=dist \
      --feature_size="$FEATURE_SIZE" --field_size=39 --embedding_size=16 \
      --deep_layers=256,128,64 --dropout=0.8,0.8,0.8 --num_epochs=1 \
      --batch_size=128 --log_steps=10 --eval_throttle_secs=0 \
      --mesh_model=2 "$@" &
  pids+=($!)
  sleep 2
done

status=0
for pid in "${pids[@]}"; do wait "$pid" || status=1; done
exit $status
