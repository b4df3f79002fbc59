#!/bin/bash
# DSSR-process every reference structure in a CSV (role of reference
# process_natives.sh). Usage: process_natives.sh CSV PROCESSED_REF_DIR
set -euo pipefail
source "$(dirname "$0")/../_shard.sh"
CSV=$1; PROCESSED_REF_DIR=$2
mapfile -t PATHS < <(csv_column "$CSV" structure_path)
shard_range ${#PATHS[@]}
for (( i=START_IDX; i<=END_IDX; i++ )); do
    python -m na_mpnn_tpu.eval.harness \
        --function_name process_reference_monomer_rna \
        --reference_structure_path "${PATHS[i]}" \
        --overall_output_directory "$PROCESSED_REF_DIR"
done
