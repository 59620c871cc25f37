#!/bin/bash
# Hadoop-streaming launcher for the Ali-CCP JOIN stage — the wrapper the
# reference ships as DeepMTL/Feature_pipeline/get_join_sample.sh:21-39.
# The mapper/reducer are the stdin/stdout stage modes of
# tf_repos_tpu/features/aliccp.py (behavior-parity tested locally via
# tests/test_features.py); this script only supplies the job plumbing.
#
#   get_join_sample.sh [tr|te]            # Hadoop cluster
#   LOCAL=1 get_join_sample.sh [tr|te]    # local pipe-through (no Hadoop)
set -euo pipefail

HADOOP_ROOT=${HADOOP_ROOT:-/user/ctr/aliccp}
HADOOP_BIN=${HADOOP_BIN:-hadoop}
HADOOP_STREAMING=${HADOOP_STREAMING:-/usr/lib/hadoop-mapreduce/hadoop-streaming.jar}
PKG_DIR="$(cd "$(dirname "$0")/../.." && pwd)"

task_type=${1:-tr}

if [ -n "${LOCAL:-}" ]; then
  # local equivalent of one map+reduce wave: sort(1) is the shuffle
  PYTHONPATH="$PKG_DIR" python -m tf_repos_tpu.features.aliccp --mode join_map \
    | sort -k1,1 \
    | PYTHONPATH="$PKG_DIR" python -m tf_repos_tpu.features.aliccp --mode join_reduce
  exit $?
fi

INPUT_PATH=${HADOOP_ROOT}/${task_type}/*
OUTPUT_PATH=${HADOOP_ROOT}/${task_type}/sample

${HADOOP_BIN} fs -rm -r -f "${OUTPUT_PATH}/"

${HADOOP_BIN} jar "${HADOOP_STREAMING}" \
  -input "${INPUT_PATH}" \
  -output "${OUTPUT_PATH}" \
  -mapper "python aliccp.py --mode join_map" \
  -reducer "python aliccp.py --mode join_reduce" \
  -file "${PKG_DIR}/tf_repos_tpu/features/aliccp.py" \
  -jobconf mapreduce.job.priority=HIGH \
  -jobconf mapreduce.map.memory.mb=8192 \
  -jobconf mapreduce.reduce.memory.mb=8192 \
  -jobconf mapred.task.timeout=7200000 \
  -jobconf mapreduce.job.maps=500 \
  -jobconf mapreduce.job.reduces=100 \
  -jobconf mapreduce.job.name="aliccp_make_sample_${task_type}"
