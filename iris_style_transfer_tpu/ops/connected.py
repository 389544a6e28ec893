"""Connected components and area opening on binary masks, in pure JAX.

The reference uses host-side ``skimage.morphology.area_opening``
(``utils.py:196-212``) — currently feature-flagged off at its call sites
(``pipelines.py:155``, ``data_preprocessing.py:80,181``) — and implicitly
relies on OpenCV contour extraction to pick the largest blob for ellipse
fitting (``models/gaze_estimators/gaze_estimators.py:70-73``).

TPU-native equivalent: iterative min-label propagation inside a
``lax.while_loop`` (converges in O(component diameter) steps), then
per-label areas via one scatter-add.  Static shapes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(
    mask: jax.Array, connectivity: int = 2, max_iters: int | None = None
) -> jax.Array:
    """Label connected components of a (H, W) boolean mask.

    Returns int32 labels: 0 = background, foreground pixels share the
    minimal linear index + 1 of their component.  ``connectivity`` follows
    skimage: 1 = 4-neighborhood, 2 = 8-neighborhood.
    """
    h, w = mask.shape
    m = mask.astype(jnp.bool_)
    big = jnp.int32(h * w + 1)
    init = jnp.where(
        m, (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w), big
    )
    if max_iters is None:
        max_iters = h + w  # worst-case diameter for blob-like masks

    def shift(x, dy, dx):
        return jnp.roll(x, (dy, dx), axis=(0, 1)).at[...].get()

    def neighbor_min(lab):
        pad = jnp.pad(lab, 1, constant_values=big)
        cands = [lab]
        offs4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        offs8 = offs4 + [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in (offs8 if connectivity == 2 else offs4):
            cands.append(pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w])
        nm = cands[0]
        for cnd in cands[1:]:
            nm = jnp.minimum(nm, cnd)
        return jnp.where(m, nm, big)

    def cond(state):
        lab, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        new = neighbor_min(lab)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(m, lab, 0)


def largest_component(mask: jax.Array, connectivity: int = 2) -> jax.Array:
    """Boolean mask of the largest connected component (all-False if empty)."""
    h, w = mask.shape
    lab = connected_components(mask, connectivity)
    areas = jnp.zeros((h * w + 2,), jnp.int32).at[lab.reshape(-1)].add(1)
    areas = areas.at[0].set(0)  # ignore background
    best = jnp.argmax(areas)
    return (lab == best) & (best > 0)


def area_opening(
    mask: jax.Array, area_threshold: int = 500, connectivity: int = 2
) -> jax.Array:
    """Remove components smaller than ``area_threshold`` pixels; the JAX
    equivalent of ``skimage.morphology.area_opening`` on binary masks
    (reference ``utils.py:196-212``)."""
    h, w = mask.shape
    lab = connected_components(mask, connectivity)
    areas = jnp.zeros((h * w + 2,), jnp.int32).at[lab.reshape(-1)].add(1)
    keep = areas[lab] >= area_threshold
    return mask & keep & (lab > 0)
