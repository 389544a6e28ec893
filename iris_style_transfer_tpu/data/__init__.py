"""Data: OpenEDS2019/2020 loaders, device-side dataset builders, prefetch."""

from .openeds2019 import (
    load_data_openeds2019,
    build_ir_dataset,
    build_ist_dataset,
    sample_other,
)
from .openeds2020 import (
    load_data_openeds2020,
    load_labels_openeds2020,
    stream_openeds2020,
)
from .prefetch import batch_iterator, prefetch_to_device
from .synthetic import synthetic_eye_batch, synthetic_openeds2019
