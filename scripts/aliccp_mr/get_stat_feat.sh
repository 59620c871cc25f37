#!/bin/bash
# Hadoop-streaming launcher for the Ali-CCP feature-count STAT stage —
# parity with DeepMTL/Feature_pipeline/get_stat_feat.sh. Stages are the
# stdin/stdout modes of tf_repos_tpu/features/aliccp.py.
#
#   get_stat_feat.sh            # Hadoop cluster
#   LOCAL=1 get_stat_feat.sh    # local pipe-through (no Hadoop)
set -euo pipefail

HADOOP_ROOT=${HADOOP_ROOT:-/user/ctr/aliccp}
HADOOP_BIN=${HADOOP_BIN:-hadoop}
HADOOP_STREAMING=${HADOOP_STREAMING:-/usr/lib/hadoop-mapreduce/hadoop-streaming.jar}
PKG_DIR="$(cd "$(dirname "$0")/../.." && pwd)"

if [ -n "${LOCAL:-}" ]; then
  PYTHONPATH="$PKG_DIR" python -m tf_repos_tpu.features.aliccp --mode stat_map \
    | sort -k1,1 \
    | PYTHONPATH="$PKG_DIR" python -m tf_repos_tpu.features.aliccp --mode stat_reduce
  exit $?
fi

INPUT_PATH=${HADOOP_ROOT}/tr/sample
OUTPUT_PATH=${HADOOP_ROOT}/tr/feat_cnts

${HADOOP_BIN} fs -rm -r -f "${OUTPUT_PATH}/"

${HADOOP_BIN} jar "${HADOOP_STREAMING}" \
  -input "${INPUT_PATH}" \
  -output "${OUTPUT_PATH}" \
  -mapper "python aliccp.py --mode stat_map" \
  -reducer "python aliccp.py --mode stat_reduce" \
  -file "${PKG_DIR}/tf_repos_tpu/features/aliccp.py" \
  -jobconf mapreduce.job.maps=500 \
  -jobconf mapreduce.job.reduces=100 \
  -jobconf mapreduce.job.name="aliccp_stat_feat"
