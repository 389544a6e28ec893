"""Core image ops, losses, and metrics — all pure JAX, jit/vmap/pjit-able."""

from .image import (
    resize_bilinear,
    rgb_to_grayscale,
    gray_to_rgb,
    imagenet_normalize,
    IMAGENET_MEAN,
    IMAGENET_STD,
    gamma_lut,
    nonzero_bbox,
    crop_and_resize,
    paste_resized,
    composite_iris,
    pad_height,
    rotate,
    perspective_warp,
    random_rotation_params,
    random_perspective_params,
)
from .gram import gram_matrix
from .losses import content_loss_l2, style_loss_gram, style_loss_bn, style_stats
from .clahe import clahe
from .metrics import (
    cross_entropy,
    classification_metrics,
    roc_auc_ovr,
    iou_per_class,
    angular_distance,
    cosine_embedding_loss,
)
from .ellipse import fit_ellipse_mask, eye_corners, extract_eye_landmarks
from .connected import connected_components, area_opening
