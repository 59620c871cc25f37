#!/bin/bash
# Hadoop-streaming launcher for the Ali-CCP REMAP + global-shuffle stage —
# parity with DeepMTL/Feature_pipeline/get_remap_fid.sh. The remap mapper
# needs the feat_cnts side file (distributed-cache analog: -file upload).
#
#   get_remap_fid.sh [tr|te] [feat_cnts_file]
#   LOCAL=1 get_remap_fid.sh tr feat_cnts.txt   # local pipe-through
set -euo pipefail

HADOOP_ROOT=${HADOOP_ROOT:-/user/ctr/aliccp}
HADOOP_BIN=${HADOOP_BIN:-hadoop}
HADOOP_STREAMING=${HADOOP_STREAMING:-/usr/lib/hadoop-mapreduce/hadoop-streaming.jar}
PKG_DIR="$(cd "$(dirname "$0")/../.." && pwd)"

task_type=${1:-tr}
feat_cnts=${2:-feat_cnts.txt}

if [ -n "${LOCAL:-}" ]; then
  PYTHONPATH="$PKG_DIR" python -m tf_repos_tpu.features.aliccp \
      --mode remap_map --feat_cnts_file "$feat_cnts" --cutoff "${CUTOFF:-20}" \
    | sort -k1,1 \
    | PYTHONPATH="$PKG_DIR" python -m tf_repos_tpu.features.aliccp --mode shuffle_reduce
  exit $?
fi

INPUT_PATH=${HADOOP_ROOT}/${task_type}/sample
OUTPUT_PATH=${HADOOP_ROOT}/${task_type}/sample_remap

${HADOOP_BIN} fs -rm -r -f "${OUTPUT_PATH}/"

${HADOOP_BIN} jar "${HADOOP_STREAMING}" \
  -input "${INPUT_PATH}" \
  -output "${OUTPUT_PATH}" \
  -mapper "python aliccp.py --mode remap_map --feat_cnts_file $(basename "$feat_cnts")" \
  -reducer "python aliccp.py --mode shuffle_reduce" \
  -file "${PKG_DIR}/tf_repos_tpu/features/aliccp.py" \
  -file "${feat_cnts}" \
  -jobconf mapreduce.job.maps=500 \
  -jobconf mapreduce.job.reduces=400 \
  -jobconf mapreduce.job.name="aliccp_remap_fid_${task_type}"
