"""Ellipse fitting, eye corners, landmarks, connected components."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.ops import (
    area_opening,
    connected_components,
    extract_eye_landmarks,
    eye_corners,
    fit_ellipse_mask,
)
from iris_style_transfer_tpu.ops.connected import largest_component


def make_ellipse(h, w, cx, cy, a, b, angle_deg=0.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    t = np.deg2rad(angle_deg)
    xr = (xx - cx) * np.cos(t) + (yy - cy) * np.sin(t)
    yr = -(xx - cx) * np.sin(t) + (yy - cy) * np.cos(t)
    return (xr / a) ** 2 + (yr / b) ** 2 <= 1.0


def test_fit_ellipse_recovers_parameters():
    mask = make_ellipse(200, 300, cx=150, cy=90, a=60, b=35, angle_deg=30)
    out = np.asarray(fit_ellipse_mask(jnp.asarray(mask)))
    cx, cy, major, minor, angle, valid = out
    assert valid == 1.0
    assert abs(cx - 150) < 1.5 and abs(cy - 90) < 1.5
    assert abs(major - 120) < 4.0 and abs(minor - 70) < 4.0  # full axes
    assert abs(angle - 30) < 3.0


def test_fit_ellipse_empty_mask_zeroes():
    out = np.asarray(fit_ellipse_mask(jnp.zeros((50, 50), bool)))
    np.testing.assert_array_equal(out, 0.0)


def test_eye_corners_match_reference_semantics():
    mask = np.zeros((100, 120), bool)
    mask[30:61, 20:91] = True  # rows 30..60, cols 20..90
    out = np.asarray(eye_corners(jnp.asarray(mask)))
    left, right, bottom, top, valid = out
    # reference (gaze_estimators.py:99-106): left/right = min/max col,
    # bottom/top = min/max row
    assert (left, right, bottom, top, valid) == (20, 90, 30, 60, 1.0)


def test_extract_eye_landmarks_19dim():
    seg = np.zeros((400, 640), np.int32)
    seg[150:251, 170:471] = 1  # sclera
    iris = make_ellipse(400, 640, 320, 200, 60, 55)
    pupil = make_ellipse(400, 640, 320, 200, 25, 23)
    seg[iris] = 2
    seg[pupil] = 3
    lm = np.asarray(extract_eye_landmarks(jnp.asarray(seg)))
    assert lm.shape == (19,)
    assert abs(lm[0] - 320) < 2 and abs(lm[1] - 200) < 2  # pupil center
    assert abs(lm[5] - 320) < 2 and abs(lm[6] - 200) < 2  # iris center
    assert lm[10] == 170 and lm[11] == 470  # eye corners (sclera extent incl. iris? no: sclera mask only)
    ear = lm[16]
    assert 0 < ear < 1
    assert abs(lm[17]) < 0.05 and abs(lm[18]) < 0.05  # centered pupil


def test_connected_components_and_area_opening():
    mask = np.zeros((40, 60), bool)
    mask[5:15, 5:15] = True  # 100 px blob
    mask[30:33, 50:53] = True  # 9 px blob
    lab = np.asarray(connected_components(jnp.asarray(mask)))
    ids = set(np.unique(lab)) - {0}
    assert len(ids) == 2
    opened = np.asarray(area_opening(jnp.asarray(mask), area_threshold=50))
    assert opened[5:15, 5:15].all()
    assert not opened[30:33, 50:53].any()
    big = np.asarray(largest_component(jnp.asarray(mask)))
    assert big.sum() == 100
