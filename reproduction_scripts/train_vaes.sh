#!/bin/bash
# Train the 6 per-category shape VAEs (reference train_vaes.sh parity).
set -e
DATA=${1:-./data/shapenet_processed}
for cat in bottle bowl camera can laptop mug; do
  python -m sdfest_tpu.scripts.train_vae \
    --config sdfest_tpu/configs/estimation/models/$cat.yaml \
    --dataset_path "$DATA/${cat}_filtered" \
    --run_name ${cat}_vae "$@"
done
