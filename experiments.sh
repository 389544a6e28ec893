#!/bin/bash
# Full experiment driver — reproduction recipe mirroring the reference's
# experiments.sh (sweeps over augmentation, estimators, and the two IST
# privacy evaluations).

set -e
PY="python -m"

# 1) iris classifier training: no-variation + rotation sweep + perspective sweep
$PY iris_style_transfer_tpu.workloads.iris_classification
for rd in 5 15 30 45 60 90 120 150 180; do
  $PY iris_style_transfer_tpu.workloads.iris_classification -rp 1 -rd $rd
done
for pd in 0.01 0.05 0.1 0.2 0.3 0.5 0.7 1.0; do
  $PY iris_style_transfer_tpu.workloads.iris_classification -pp 1 -pd $pd
done

# 2) gaze estimator training (estimator 1: 250 epochs, estimator 2: 500)
$PY iris_style_transfer_tpu.workloads.gaze_estimation -estimator 1 -E 250
$PY iris_style_transfer_tpu.workloads.gaze_estimation -estimator 2 -E 500

# 3) iris style transfer privacy evaluations
$PY iris_style_transfer_tpu.workloads.ist_openeds2019
$PY iris_style_transfer_tpu.workloads.ist_openeds2020
