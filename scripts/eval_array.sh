#!/bin/bash
# Shard an evaluation function over a CSV of structures across a Slurm array
# (role of the reference evaluation/*/design_sequences.sh etc).
#
# Usage:
#   FUNCTION_NAME=design_nucleic_acid_sequence CSV=structures.csv \
#   OUTPUT_DIR=out NUM_SAMPLES=10 NA_MPNN_MODEL_PATH=model.npz \
#   sbatch --array=0-199 scripts/eval_array.sh
# The CSV must have a structure_path column (header row required).
set -euo pipefail

FUNCTION_NAME=${FUNCTION_NAME:?set FUNCTION_NAME}
CSV=${CSV:?set CSV}
OUTPUT_DIR=${OUTPUT_DIR:?set OUTPUT_DIR}
NUM_SAMPLES=${NUM_SAMPLES:-10}
METHOD=${METHOD:-na_mpnn}
TEMPERATURE=${TEMPERATURE:-}
NA_MPNN_MODEL_PATH=${NA_MPNN_MODEL_PATH:-}

mapfile -t STRUCTURE_PATHS < <(python - "$CSV" <<'PY'
import csv, sys
with open(sys.argv[1]) as f:
    for row in csv.DictReader(f):
        print(row["structure_path"])
PY
)

total=${#STRUCTURE_PATHS[@]}
if (( total == 0 )); then
    echo "No data rows found in CSV." >&2
    exit 1
fi

TASK_ID=${SLURM_ARRAY_TASK_ID:-0}
NUM_JOBS=${SLURM_ARRAY_TASK_COUNT:-1}
CHUNK_SIZE=$(( (total + NUM_JOBS - 1) / NUM_JOBS ))
START_IDX=$(( TASK_ID * CHUNK_SIZE ))
END_IDX=$(( START_IDX + CHUNK_SIZE - 1 ))
(( END_IDX >= total )) && END_IDX=$(( total - 1 ))

for (( idx=START_IDX; idx<=END_IDX; idx++ )); do
    structure_path=${STRUCTURE_PATHS[idx]}
    cmd=(python -m na_mpnn_tpu.eval.harness
         --function_name "$FUNCTION_NAME"
         --structure_path "$structure_path"
         --overall_output_directory "$OUTPUT_DIR"
         --num_samples "$NUM_SAMPLES"
         --method "$METHOD")
    [[ -n "$TEMPERATURE" ]] && cmd+=(--temperature "$TEMPERATURE")
    [[ -n "$NA_MPNN_MODEL_PATH" ]] && cmd+=(--na_mpnn_model_path "$NA_MPNN_MODEL_PATH")
    "${cmd[@]}"
done
