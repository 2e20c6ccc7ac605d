#!/usr/bin/env bash
# Slurm launcher — the analog of the reference's tools/slurm_train.sh /
# slurm_test.sh (srun + GRES there; one process per HOST here, because
# JAX drives every local chip from a single process).
#
# Usage:
#   bash tools/launch_slurm.sh PARTITION JOB_NAME CONFIG DATA_ROOT [extra...]
#   MODE=test bash tools/launch_slurm.sh PARTITION JOB_NAME CONFIG CKPT [extra...]
#
# Env knobs (mirroring the reference's GPUS/GPUS_PER_NODE/SRUN_ARGS):
#   NNODES      number of hosts (default 1)
#   CPUS        cpus per task (default 16)
#   SRUN_ARGS   extra srun arguments
#
# jax.distributed.initialize() (via --multihost) reads the Slurm env
# (SLURM_PROCID/SLURM_NTASKS/SLURM_STEP_NODELIST) to find the coordinator,
# so no MASTER_ADDR plumbing is needed.

set -euo pipefail

PARTITION=${1:?usage: launch_slurm.sh PARTITION JOB_NAME CONFIG ARG [extra...]}
JOB_NAME=${2:?usage: launch_slurm.sh PARTITION JOB_NAME CONFIG ARG [extra...]}
CONFIG=${3:?usage: launch_slurm.sh PARTITION JOB_NAME CONFIG ARG [extra...]}
ARG=${4:?usage: launch_slurm.sh PARTITION JOB_NAME CONFIG ARG [extra...]}
shift 4

NNODES=${NNODES:-1}
CPUS=${CPUS:-16}
SRUN_ARGS=${SRUN_ARGS:-}
MODE=${MODE:-train}

if [ "$MODE" = "test" ]; then
    # ARG = checkpoint; pass --data-root via extra args
    CMD=(python tools/test.py "$CONFIG" "$ARG" --distributed "$@")
else
    CMD=(python tools/train.py "$CONFIG" --data-root "$ARG" --multihost "$@")
fi

exec srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$NNODES" \
    --ntasks="$NNODES" \
    --ntasks-per-node=1 \
    --cpus-per-task="$CPUS" \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    "${CMD[@]}"
