"""iris_style_transfer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
iris style transfer, iris recognition, eye segmentation and gaze estimation.

Re-designed from scratch for TPU hardware with the capabilities of the
reference codebase (AnonymWriter/Iris-Style-Transfer):

  * ``ops``        — image ops, losses, Gram matrices, CLAHE, ellipse fits,
                     connected components, metrics (all jit/vmap/pjit-able).
  * ``models``     — pure-functional model zoo (VGG19, RITnet, ResNet50,
                     EfficientNet-B7 U-Net, classifiers, gaze estimators)
                     with explicit parameter pytrees + torch weight porting.
  * ``transfer``   — the NST engine: on-device L-BFGS / Adam optimization in
                     image space as a single jitted ``lax.scan``.
  * ``pipelines``  — masked-iris extraction, NST and recomposition as
                     batched static-shape XLA programs.
  * ``data``       — OpenEDS2019/2020 loaders with host prefetch to sharded
                     device buffers.
  * ``parallel``   — mesh construction, shardings and collectives.
  * ``runtime``    — config, logging (wandb/JSONL), orbax checkpoints,
                     profiler hooks, benchmark harness.
  * ``workloads``  — the four CLI entry points (train classifiers, train
                     gaze estimators, the two IST privacy evaluations).

Reference parity notes cite the original file:line throughout.
"""

__version__ = "0.1.0"
