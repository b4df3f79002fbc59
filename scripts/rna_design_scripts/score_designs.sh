#!/bin/bash
# Score processed designs against their processed references (role of
# reference score_designs.sh): subject <name>_<id> pairs with reference
# <name> under PROCESSED_REF_DIR/<name>/reference_json/<name>.json.
# Usage: sbatch --array=0-N score_designs.sh PROCESSED_DIR PROCESSED_REF_DIR OUTPUT_DIR
set -euo pipefail
source "$(dirname "$0")/../_shard.sh"
PROCESSED_DIR=$1; PROCESSED_REF_DIR=$2; OUTPUT_DIR=$3
mkdir -p "$OUTPUT_DIR"
shopt -s nullglob
json_files=( "$PROCESSED_DIR"/*/processed_design_json/*.json )
(( ${#json_files[@]} > 0 )) || { echo "no processed designs" >&2; exit 1; }
shard_range ${#json_files[@]}
for (( i=START_IDX; i<=END_IDX; i++ )); do
    json_path=${json_files[i]}
    filename=$(basename "$json_path" .json)
    pdb_id="${filename%_*}"
    ref_json="$PROCESSED_REF_DIR/$pdb_id/reference_json/$pdb_id.json"
    [[ -f "$ref_json" ]] || { echo "no reference for $pdb_id, skipping" >&2; continue; }
    python -m na_mpnn_tpu.eval.harness \
        --function_name score_design_monomer_rna \
        --reference_path "$ref_json" \
        --subject_path "$json_path" \
        --overall_output_directory "$OUTPUT_DIR"
done
