#!/bin/bash
# Train the per-category init networks (reference train_init_networks.sh
# parity), including the mug orientation-representation variants.
set -e
for cat in bottle bowl camera can laptop mug; do
  python -m sdfest_tpu.scripts.train_init \
    --config sdfest_tpu/configs/estimation/models/$cat.yaml \
    --run_name ${cat}_init "$@"
done
python -m sdfest_tpu.scripts.train_init \
  --config sdfest_tpu/configs/estimation/models/mug_quaternion.yaml \
  --run_name mug_quaternion_init "$@"
python -m sdfest_tpu.scripts.train_init \
  --config sdfest_tpu/configs/estimation/models/mug_discretized_2.yaml \
  --run_name mug_discretized_2_init "$@"
