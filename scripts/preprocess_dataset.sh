#!/bin/bash
# Shard offline preprocessing across a Slurm array (role of the reference
# data/preprocess_dataset.sh).
# Usage: sbatch --array=1-100 scripts/preprocess_dataset.sh input.csv outdir [config.json]
set -euo pipefail
INPUT_CSV=$1
OUTPUT_DIR=$2
CONFIG=${3:-}
MODULO=${SLURM_ARRAY_TASK_COUNT:-1}
REMAINDER=$(( ${SLURM_ARRAY_TASK_ID:-1} % MODULO ))
python -m na_mpnn_tpu.cli.preprocess "$INPUT_CSV" "$OUTPUT_DIR" "$MODULO" "$REMAINDER" $CONFIG
