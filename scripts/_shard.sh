# Shard helper: computes START_IDX/END_IDX over $1 items from the Slurm
# array env (single-task fallback: the whole range).
shard_range() {
    local total=$1
    TASK_ID=${SLURM_ARRAY_TASK_ID:-0}
    NUM_JOBS=${SLURM_ARRAY_TASK_COUNT:-1}
    local chunk=$(( (total + NUM_JOBS - 1) / NUM_JOBS ))
    START_IDX=$(( TASK_ID * chunk ))
    END_IDX=$(( START_IDX + chunk - 1 ))
    (( END_IDX >= total )) && END_IDX=$(( total - 1 ))
}
csv_column() {  # csv_column <csv> <column>
    python - "$1" "$2" <<'PY'
import csv, sys
with open(sys.argv[1]) as f:
    for row in csv.DictReader(f):
        print(row[sys.argv[2]])
PY
}
