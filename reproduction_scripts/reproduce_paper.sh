#!/bin/bash
# Rendering evaluation + ablation study + runtime analysis
# (reference reproduce_paper.sh parity).
set -e
MESHES=${1:-./data/eval_meshes}
for cat in bottle bowl camera can laptop mug; do
  python -m sdfest_tpu.scripts.rendering_evaluation \
    --config sdfest_tpu/configs/estimation/rendering_evaluation.yaml \
             sdfest_tpu/configs/estimation/models/$cat.yaml \
    --data_path "$MESHES/$cat" --out_folder results/rendering_eval
done
python -m sdfest_tpu.scripts.rendering_evaluation \
  --config sdfest_tpu/configs/estimation/ablation_study.yaml \
           sdfest_tpu/configs/estimation/models/mug.yaml \
  --data_path "$MESHES/mug" --out_folder results/ablation
python -m sdfest_tpu.scripts.real_data \
  --config sdfest_tpu/configs/estimation/runtime_analysis.yaml \
  --out_folder results/runtime
