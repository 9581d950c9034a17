#!/bin/bash
# Preprocess the 6 ShapeNet categories at 64^3 with 2 padding cells
# (parity with the reference reproduction_scripts/preprocess_shapenet.sh).
# The paper's curated mesh selection ships at the repo root as
# final_meshes.json; passing it via --filter_json reproduces the paper's
# exact VAE training-set selection.
# Usage: ./preprocess_shapenet.sh <shapenet_root> <out_root>
set -e
SHAPENET=${1:-./data/shapenet}
OUT=${2:-./data/shapenet_processed}
FILTER="$(dirname "$0")/../final_meshes.json"
declare -A SYNSETS=(
  [bottle]=02876657 [bowl]=02880940 [camera]=02942699
  [can]=02946921 [laptop]=03642806 [mug]=03797390
)
for cat in "${!SYNSETS[@]}"; do
  python -m sdfest_tpu.scripts.process_shapenet \
    --inp_folder "$SHAPENET/${SYNSETS[$cat]}" \
    --out_folder "$OUT/${cat}_filtered" \
    --resolution 64 --padding 2 \
    --filter_json "$FILTER" || true
done
