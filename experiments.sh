#!/bin/bash
# Full experiment driver — the reference's canonical reproduction recipe
# (/root/reference/experiments.sh) line for line, modulo `-device $device`
# (device placement is JAX's job here) and module-style entry points.

set -e
PY="python -m"

################################## train iris classification model ##################################
# no variation
$PY iris_style_transfer_tpu.workloads.iris_classification -rp 0 -rd 0 -pp 0 -pd 0

# random rotation
for rd in 5 10 20 30 45 60 90 120 150 180; do
  $PY iris_style_transfer_tpu.workloads.iris_classification -rp 1 -rd $rd -pp 0 -pd 0
done

# random perspective transformation
for pd in 0.01 0.05 0.1 0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9 1.0; do
  $PY iris_style_transfer_tpu.workloads.iris_classification -rp 0 -rd 0 -pp 1 -pd $pd
done

################################## train gaze estimation model ##################################
$PY iris_style_transfer_tpu.workloads.gaze_estimation -estimator 1 --save_period 10 -E 250
$PY iris_style_transfer_tpu.workloads.gaze_estimation -estimator 2 --save_period 50 -E 500

##################################  iris style transfer on OpenEDS2019 ##################################
$PY iris_style_transfer_tpu.workloads.ist_openeds2019

##################################  iris style transfer on OpenEDS2020 ##################################
$PY iris_style_transfer_tpu.workloads.ist_openeds2020
