"""Batched static-shape pipelines: iris extraction, NST, recomposition."""

from .iris import (
    mask_and_crop_iris,
    extract_iris_batch,
    composite_batch,
    make_ist_fn,
)
