#!/bin/bash
# Batch launcher for a TPU VM (reference `job` is an LSF script for the DTU
# V100 queue).  Adjust TPU_NAME/ZONE for your fleet; runs the canonical
# benchmark sweep and collects the CSV.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p out/data
python -m particle_simulation_tpu bench
echo "sweep written to out/data/mobility_timesteps_nodet.csv"
