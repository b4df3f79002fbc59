#!/bin/bash
# Score predicted PPMs against experimental PPMs (role of reference
# score_native_specificities.sh): the CSV maps structure_path -> ppm_paths;
# subject JSONs live under SPECIFIED_DIR/*/specificity_json/.
# Usage: sbatch --array=0-N score_native_specificities.sh CSV SPECIFIED_DIR OUTPUT_DIR
set -euo pipefail
source "$(dirname "$0")/../_shard.sh"
CSV=$1; SPECIFIED_DIR=$2; OUTPUT_DIR=$3
shopt -s nullglob
json_files=( "$SPECIFIED_DIR"/*/specificity_json/*.json )
(( ${#json_files[@]} > 0 )) || { echo "no specificity JSONs" >&2; exit 1; }
shard_range ${#json_files[@]}
for (( i=START_IDX; i<=END_IDX; i++ )); do
    json_file=${json_files[i]}
    ppm_paths=$(python - "$CSV" "$json_file" <<'PY'
import csv, json, sys
subject = json.load(open(sys.argv[2]))
target = subject.get("original_input_structure_path")
with open(sys.argv[1]) as f:
    for row in csv.DictReader(f):
        if row["structure_path"] == target:
            print(row["ppm_paths"])
            break
PY
)
    [[ -n "$ppm_paths" ]] || { echo "no ppm_paths for $json_file" >&2; continue; }
    python -m na_mpnn_tpu.eval.harness \
        --function_name score_specificity_prediction \
        --reference_ppms_list_str "$ppm_paths" \
        --subject_path "$json_file" \
        --overall_output_directory "$OUTPUT_DIR"
done
