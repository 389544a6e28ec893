"""Moment-based ellipse fitting and eye-landmark extraction, on device.

The reference extracts 19 eye landmarks per image on the host with OpenCV
(``models/gaze_estimators/gaze_estimators.py:55-178``): ``findContours`` +
``fitEllipse`` on the pupil/iris masks, plus sclera-mask extents — a
per-image device->host round trip in the middle of the eval loop.

TPU-native equivalent: fit the ellipse from the (optionally
largest-component) filled mask's second moments — for a solid ellipse the
full axes are ``4*sqrt(eigenvalue)`` of the covariance — computed directly
on device, batched with vmap.  Returns (cx, cy, major, minor, angle_deg)
with cv2's output ordering (axes sorted ascending: cv2 returns
(MA, ma) = (minor-ish first? cv2 returns (major_axis, minor_axis) as the
reference unpacks them ``gaze_estimators.py:81``; we match that unpacking:
first the axis cv2 lists first (width of the rotated rect, i.e. the axis at
``angle``), then the other).  Failed fits (empty mask) yield zeros, matching
the reference's None->0 substitution (``gaze_estimators.py:176``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .connected import largest_component


def fit_ellipse_mask(
    mask: jax.Array, select_largest: bool = False, min_pixels: int = 5
) -> jax.Array:
    """Fit an ellipse to a boolean (H, W) mask via image moments.

    Returns ``[cx, cy, major, minor, angle_deg, valid]`` (float32).  ``cx``
    is the column coordinate, matching cv2.  ``angle_deg`` in [0, 180) is
    the rotation of the first axis from the x-axis, cv2-style.
    """
    if select_largest:
        mask = largest_component(mask)
    m = mask.astype(jnp.float32)
    h, w = m.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    area = jnp.sum(m)
    valid = area >= min_pixels
    safe_area = jnp.maximum(area, 1.0)
    cx = jnp.sum(m * xs) / safe_area
    cy = jnp.sum(m * ys) / safe_area
    dx = xs - cx
    dy = ys - cy
    mu20 = jnp.sum(m * dx * dx) / safe_area
    mu02 = jnp.sum(m * dy * dy) / safe_area
    mu11 = jnp.sum(m * dx * dy) / safe_area
    tr = mu20 + mu02
    det_term = jnp.sqrt(jnp.maximum(((mu20 - mu02) / 2.0) ** 2 + mu11**2, 0.0))
    lam1 = tr / 2.0 + det_term  # larger eigenvalue
    lam2 = jnp.maximum(tr / 2.0 - det_term, 0.0)
    major = 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))
    minor = 4.0 * jnp.sqrt(lam2)
    angle = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02)
    angle_deg = jnp.degrees(angle) % 180.0
    out = jnp.stack([cx, cy, major, minor, angle_deg, jnp.float32(1.0)])
    return jnp.where(valid, out, jnp.zeros_like(out))


def eye_corners(mask: jax.Array) -> jax.Array:
    """Sclera-mask extents: ``[left, right, bottom, top, valid]``.

    Reference ``find_eye_corners`` (``gaze_estimators.py:85-106``): left and
    right are the min/max column indices, bottom/top the min/max row indices
    (the reference's naming — "bottom" is the smaller row index).
    """
    m = mask.astype(jnp.bool_)
    h, w = m.shape
    rows = jnp.any(m, axis=1)
    cols = jnp.any(m, axis=0)
    ridx = jnp.arange(h, dtype=jnp.float32)
    cidx = jnp.arange(w, dtype=jnp.float32)
    any_nz = jnp.any(m)
    left = jnp.min(jnp.where(cols, cidx, jnp.float32(w)))
    right = jnp.max(jnp.where(cols, cidx, jnp.float32(-1)))
    bottom = jnp.min(jnp.where(rows, ridx, jnp.float32(h)))
    top = jnp.max(jnp.where(rows, ridx, jnp.float32(-1)))
    out = jnp.stack([left, right, bottom, top, jnp.float32(1.0)])
    return jnp.where(any_nz, out, jnp.zeros_like(out))


def extract_eye_landmarks(
    segmentation: jax.Array, epsilon: float = 1e-6, select_largest: bool = False
) -> jax.Array:
    """The 19-dim landmark vector of ``gaze_estimators.py:108-178``.

    ``segmentation`` is an (H, W) integer class map (0 bg, 1 sclera,
    2 iris, 3 pupil).  Components: pupil ellipse (5), iris ellipse (5), eye
    corners (4), eye width/height/aspect-ratio (3), normalized pupil
    position (2).  Unavailable features are 0, matching the reference's
    None->0 (``:176``).  Batch with ``jax.vmap``.
    """
    sclera = segmentation == 1
    iris = segmentation == 2
    pupil = segmentation == 3

    p = fit_ellipse_mask(pupil, select_largest)
    i = fit_ellipse_mask(iris, select_largest)
    c = eye_corners(sclera)

    left, right, bottom, top, c_valid = c[0], c[1], c[2], c[3], c[4]
    eye_width = (right - left) * c_valid
    eye_height = (top - bottom) * c_valid
    ear = jnp.where(c_valid > 0, eye_height / (eye_width + epsilon), 0.0)

    pv = p[5]
    both = (pv > 0) & (c_valid > 0)
    norm_px = jnp.where(both, (p[0] - (left + right) / 2.0) / (eye_width + epsilon), 0.0)
    norm_py = jnp.where(both, (p[1] - (bottom + top) / 2.0) / (eye_height + epsilon), 0.0)

    return jnp.stack(
        [
            p[0], p[1], p[2], p[3], p[4],
            i[0], i[1], i[2], i[3], i[4],
            left, right, bottom, top,
            eye_width, eye_height, ear,
            norm_px, norm_py,
        ]
    ).astype(jnp.float32)
