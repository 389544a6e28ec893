"""The four workload entry points (reference L4/L5 layers):

  * ``iris_classification`` — train Classifier1/2 on VGG features
    (``iris_classification.py``)
  * ``gaze_estimation`` — train GazeEstimator1/2 (``gaze_estimation.py``)
  * ``ist_openeds2019`` — privacy eval: recognition + segmentation
    (``iris_style_transfer_openeds2019.py``)
  * ``ist_openeds2020`` — privacy eval: gaze estimation
    (``iris_style_transfer_openeds2020.py``)

Run as ``python -m iris_style_transfer_tpu.workloads.<name> [flags]`` with
the reference's flag names.
"""
