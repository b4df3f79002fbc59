#!/bin/bash
# Launch a training run (role of the reference launch_training.sh).
#
# Single host:   ./scripts/launch_training.sh config.json
# Multi host:    set COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID per host
#                (e.g. from the TPU VM metadata or your scheduler) — the
#                trainer calls jax.distributed.initialize from these.
#SBATCH -p tpu-train
#SBATCH --mem=64g
#SBATCH -c 12
#SBATCH -t 2-00:00:00

json_path=$1

export NA_MPNN_COORDINATOR_ADDRESS=${COORDINATOR_ADDRESS:-}
export NA_MPNN_NUM_PROCESSES=${NUM_PROCESSES:-1}
export NA_MPNN_PROCESS_ID=${PROCESS_ID:-0}

python -m na_mpnn_tpu.cli.train "$json_path"
