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

# Category-level benchmarks (the reference defers these to the external
# cpas_toolbox, reproduce_paper.sh:33-37 "coming soon"; in-repo here).
# Requires the NOCS REAL275 release tree / annotated Redwood sequences.
if [ -d "${NOCS_DIR:-./data/nocs}" ]; then
  python -m sdfest_tpu.scripts.category_evaluation \
    --config sdfest_tpu/configs/estimation/real275_evaluation.yaml \
    --data_path "${NOCS_DIR:-./data/nocs}" --out_folder results/real275
fi
if [ -d "${REDWOOD_DIR:-./data/redwood}" ]; then
  python -m sdfest_tpu.scripts.category_evaluation \
    --config sdfest_tpu/configs/estimation/redwood_evaluation.yaml \
    --data_path "${REDWOOD_DIR:-./data/redwood}" \
    --ann_dir "${REDWOOD75_DIR:-./data/redwood75}" \
    --out_folder results/redwood75
fi
