#!/bin/bash
# EternaFold/RibonanzaNet/AF3-process every design JSON under
# DESIGN_DIR/*/design_json/ (role of reference process_designs.sh).
# Usage: sbatch --array=0-N process_designs.sh DESIGN_DIR OUTPUT_DIR
set -euo pipefail
source "$(dirname "$0")/../_shard.sh"
DESIGN_DIR=$1; OUTPUT_DIR=$2
shopt -s nullglob
json_files=( "$DESIGN_DIR"/*/design_json/*.json )
(( ${#json_files[@]} > 0 )) || { echo "no design JSONs under $DESIGN_DIR" >&2; exit 1; }
shard_range ${#json_files[@]}
for (( i=START_IDX; i<=END_IDX; i++ )); do
    python -m na_mpnn_tpu.eval.harness \
        --function_name process_design_monomer_rna \
        --subject_path "${json_files[i]}" \
        --overall_output_directory "$OUTPUT_DIR"
done
