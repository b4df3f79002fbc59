#!/bin/bash
# Predict PPMs for every structure in a CSV shard (role of reference
# predict_specificities.sh). Usage: sbatch --array=0-N \
#   predict_specificities.sh CSV OUTPUT_DIR METHOD NUM_SAMPLES TEMPERATURE [MODEL]
set -euo pipefail
source "$(dirname "$0")/../_shard.sh"
CSV=$1; OUTPUT_DIR=$2; METHOD=${3:-na_mpnn}; NUM_SAMPLES=${4:-10}
TEMPERATURE=${5:-}; NA_MPNN_MODEL_PATH=${6:-}
mapfile -t PATHS < <(csv_column "$CSV" structure_path)
shard_range ${#PATHS[@]}
for (( i=START_IDX; i<=END_IDX; i++ )); do
    cmd=(python -m na_mpnn_tpu.eval.harness
         --function_name predict_nucleic_acid_ppm
         --structure_path "${PATHS[i]}"
         --overall_output_directory "$OUTPUT_DIR"
         --num_samples "$NUM_SAMPLES" --method "$METHOD")
    [[ -n "$TEMPERATURE" ]] && cmd+=(--temperature "$TEMPERATURE")
    [[ -n "$NA_MPNN_MODEL_PATH" ]] && cmd+=(--na_mpnn_model_path "$NA_MPNN_MODEL_PATH")
    "${cmd[@]}"
done
