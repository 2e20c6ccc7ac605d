#!/usr/bin/env bash
# Multi-host launcher (replaces the reference's torchrun/slurm scripts,
# tools/dist_train.sh / tools/slurm_train.sh).
#
# JAX uses ONE process per host (not per chip); on TPU pods the runtime
# discovers peers automatically, so "launching" is just running the same
# command on every host of the slice:
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all -- \
#       bash tools/launch_multihost.sh upn_tiny_160k_dp03_lr6 /data/ade20k
#
# On Slurm clusters:
#   srun --ntasks-per-node=1 bash tools/launch_multihost.sh CONFIG DATA_ROOT
#
# jax.distributed.initialize() (invoked by --multihost) picks up the
# coordinator from the TPU metadata / Slurm env automatically.

set -euo pipefail

CONFIG=${1:?usage: launch_multihost.sh CONFIG DATA_ROOT [extra args...]}
DATA_ROOT=${2:?usage: launch_multihost.sh CONFIG DATA_ROOT [extra args...]}
shift 2

exec python tools/train.py "$CONFIG" --data-root "$DATA_ROOT" --multihost "$@"
