"""The lane-full bitcast view shared by the elementwise Pallas kernels.

    x (B, H, W, C)  --transpose(1,2,0,3)+reshape-->  (H, W, B*C)

The rearrangement is a BITCAST (no data movement) exactly when the
operand's layout is XLA's bs4 batch-in-sublanes choice ``{3,0,2,1}``
([H][W][B][C] minor-to-major); on other layouts XLA inserts real
transposes and the probe harnesses decide whether a kernel still wins.
Each lane of the view is one (b, c) pair, which is what makes per-(B, C)
reductions (style stats) and per-channel weights (depthwise) lane-local.

Keeping the forward/inverse pair in ONE place keeps every kernel's
layout assumption in sync (pallas_pool, pallas_relu_stats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Total VMEM working-set budget for lane-view kernels: v5e VMEM is
# ~16 MB/core; leave headroom for Mosaic's own allocations.  A kernel's
# working set is (number of strip-sized blocks) x (2 for Pallas's
# double-buffered pipelining) x strip bytes.
VMEM_BUDGET = 12 * 1024 * 1024


def view(a: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (H, W, B*C)."""
    b, h, w, c = a.shape
    return jnp.transpose(a, (1, 2, 0, 3)).reshape(h, w, b * c)


def unview(v: jax.Array, b: int) -> jax.Array:
    """(H, W, B*C) -> (B, H, W, C)."""
    h, w, bc = v.shape
    return jnp.transpose(v.reshape(h, w, b, bc // b), (2, 0, 1, 3))


def pick_rows(
    h: int, w: int, bc: int, itemsize: int, row_scale: int = 1, n_strips: int = 2,
    stack_f32: int = 0,
) -> int | None:
    """Largest strip height t in {8, 4, 2, 1} dividing ``h`` such that the
    kernel's WHOLE working set — ``n_strips`` blocks of
    (row_scale * t, w, bc), each double-buffered by the Pallas pipeline,
    plus ``stack_f32`` strip-sized f32 REGISTER/STACK temporaries (Mosaic
    allocates live vector intermediates on its scoped-vmem stack; the
    512px OOM of 2026-08-18 — "Scoped allocation 34.02M, limit 16.00M" —
    was exactly these f32 upcasts going uncounted) — fits
    :data:`VMEM_BUDGET`; None if even t=1 is too large (caller must fall
    back to XLA)."""
    for t in (8, 4, 2, 1):
        if h % t:
            continue
        strip = row_scale * t * w * bc
        if n_strips * 2 * strip * itemsize + stack_f32 * strip * 4 <= VMEM_BUDGET:
            return t
    return None
