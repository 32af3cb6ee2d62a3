#!/usr/bin/env bash
# Cluster job wrapper (cf. reference scripts/queue.sh, SLURM 1-GPU job): adapt the
# scheduler preamble to your TPU pod environment; the run scripts are single-process
# per host and pick up all local chips through jax.devices().
#SBATCH --job-name=txt2vid-tpu
#SBATCH --time=2-00:00:00
#SBATCH --cpus-per-task=8
#SBATCH --mem=64G
bash "$(dirname "$0")/run.sh"
