"""On-device L-BFGS matching ``torch.optim.LBFGS``'s default behavior.

The reference drives NST with ``torch.optim.LBFGS([x], lr=1)`` and counts
*closure evaluations* against ``epochs`` (``pipelines.py:59,74-103``).  With
the default ``max_iter=20`` and no line search, torch's step() chunking is
equivalent to one continuous loop in which every iteration does exactly one
closure evaluation followed by one parameter update — so the whole history
of 200 "epochs" becomes a single ``lax.scan`` with zero host syncs (the
reference syncs device->host every closure, ``pipelines.py:93-95``).

Faithfulness notes (torch semantics reproduced exactly):
  * first global iteration uses ``t = min(1, 1/|g|_1) * lr``, then ``t=lr``;
  * curvature pairs use the *unprojected* update ``s = t*d`` (the closure's
    clamp-to-[0,1] projection is invisible to the optimizer, as in torch);
  * pairs are accepted only when ``y.s > 1e-10``;
  * initial Hessian scale ``gamma = y.s / y.y``.

History is a fixed-size **circular buffer**: an accepted pair overwrites
the slot ``count % m`` (one (N,)-row write), and chronological order is
recovered as a permutation applied to the tiny (m,)- and (m, m)-sized
quantities — never to the (m, N) buffers.  The previous implementation
shifted both buffers every step (``concatenate([buf[1:], v])``) and
masked/concatenated them for the direction computation, moving ~2.5 GB of
HBM per step at the 512px bs4 config; this form moves ~0.9 GB (measured
7.4 ms -> ~1.5 ms per step on v5e).

torch's default ``history_size=100`` would hold 2x100 image-sized vectors;
the curvature benefit saturates far earlier, so ``history_size`` defaults
to 10 here and is configurable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LBFGSState(NamedTuple):
    s_hist: jax.Array  # (m, *shape) previous steps, circular buffer
    y_hist: jax.Array  # (m, *shape) previous gradient differences, circular
    rho: jax.Array  # (m,) 1/(y.s) per slot; 0 marks a never-written slot
    gamma: jax.Array  # () initial Hessian scale
    prev_g: jax.Array  # (*shape,) gradient at previous closure
    prev_step: jax.Array  # (*shape,) previous update t*d
    iteration: jax.Array  # () global iteration counter
    count: jax.Array  # () number of accepted pairs (next write: count % m)


def lbfgs_init(
    shape: int | tuple[int, ...], history_size: int = 10, dtype=jnp.float32
) -> LBFGSState:
    """``shape`` is the parameter array's shape (an int means a flat
    vector).  The state keeps the parameter's NATIVE shape: flattening a
    TPU-tiled image array to (N,) forces a tiled->linear relayout on every
    gradient/update crossing, measured at ~5 ms per 512px bs4 NST closure
    (18% of the step — tools/perf_probe9.py); shape-native buffers keep
    every elementwise op and MXU contraction in the array's own layout.

    ``dtype`` applies to the (m, *shape) history buffers only (bfloat16
    halves their HBM traffic per direction computation); curvature scalars
    and the previous gradient/step stay float32."""
    m = history_size
    if isinstance(shape, int):
        shape = (shape,)
    return LBFGSState(
        s_hist=jnp.zeros((m, *shape), dtype),
        y_hist=jnp.zeros((m, *shape), dtype),
        rho=jnp.zeros((m,), jnp.float32),
        gamma=jnp.ones((), jnp.float32),
        prev_g=jnp.zeros(shape, jnp.float32),
        prev_step=jnp.zeros(shape, jnp.float32),
        iteration=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def _axes(a: jax.Array) -> tuple[int, ...]:
    """All axes of a parameter-shaped array."""
    return tuple(range(a.ndim))


def _vdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32 full contraction of two parameter-shaped arrays (no reshape)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=((_axes(a), _axes(b)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chron_perm(state: LBFGSState) -> jax.Array:
    """Slot indices in chronological order (oldest -> newest).

    Pair k lives in slot k % m; after ``count`` accepted pairs the stored
    pairs are count-m .. count-1, so oldest-to-newest slots are
    ``(count + i) % m`` for i = 0..m-1.  Never-written slots (zeros,
    rho == 0) land at the front and are masked out downstream.
    """
    m = state.s_hist.shape[0]
    return (state.count + jnp.arange(m, dtype=state.count.dtype)) % m


def _compact_direction(state: LBFGSState, g: jax.Array) -> jax.Array:
    """-H @ g via the compact inverse representation (Byrd-Nocedal-Schnabel;
    Nocedal & Wright eq. 7.25):

        H = gI + [S gY] [[ R^{-T}(D + g Y'Y) R^{-1}, -R^{-T}],
                          [-R^{-1},                   0     ]] [S'; gY']

    with S, Y the (m, N) history in *chronological* order and
    R = upper-triangle(S Y'), D = diag(S Y').  Mathematically identical to
    the two-loop recursion but all large-N work is three (m, N) matmuls —
    the two-loop's 2m sequential dot products serialize badly on TPU
    (measured ~29 ms/step at m=10 for a 12.6M-element image batch vs ~2 ms
    for this form).

    The buffers stay in circular order: S@g, Y@g, S Y', Y Y' are computed
    on the raw buffers and the chronological permutation is applied to the
    resulting (m,) / (m, m) quantities.  Never-written slots are all-zero
    rows, so they contribute nothing to the big matmuls; their R diagonal
    is set to 1 so the triangular solves stay well-posed.
    """
    m = state.s_hist.shape[0]
    gamma = state.gamma
    S, Y = state.s_hist, state.y_hist
    bufdt = S.dtype  # bf16 histories: all dots accumulate f32 on the MXU
    gb = g.astype(bufdt)

    # contraction axes: everything but the history axis (parameter arrays
    # keep their native shape — see lbfgs_init)
    pax = tuple(range(1, S.ndim))
    gax = _axes(gb)

    Sg = jax.lax.dot_general(
        S, gb, dimension_numbers=((pax, gax), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (m,)
    Yg = jax.lax.dot_general(
        Y, gb, dimension_numbers=((pax, gax), ((), ())),
        preferred_element_type=jnp.float32,
    )
    SY = jax.lax.dot_general(
        S, Y, dimension_numbers=((pax, pax), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (m, m): (i, j) = s_i . y_j   (slot order)
    YY = jax.lax.dot_general(
        Y, Y, dimension_numbers=((pax, pax), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # to chronological order (tiny gathers)
    perm = _chron_perm(state)
    valid = state.rho[perm] > 0
    SYc = SY[perm][:, perm]
    YYc = YY[perm][:, perm]
    p = jnp.where(valid, Sg[perm], 0.0)
    q = gamma * jnp.where(valid, Yg[perm], 0.0)

    # the R/D diagonal is y_i.s_i — take it from the f32 value pair
    # acceptance used (stored as 1/rho) rather than the buffer-dtype dot:
    # with bf16 histories a near-cancelling accepted pair (f32 y.s ~ 1e-4)
    # can quantize to a zero or negative bf16 diagonal, making the
    # triangular solve singular and the direction NaN; never-written slots
    # get 1 so the solves stay well-posed (their rows are all-zero)
    D = jnp.where(valid, 1.0 / jnp.maximum(state.rho[perm], 1e-30), 1.0)
    R = jnp.triu(SYc, k=1) + jnp.diag(D)  # R_ij = s_i.y_j, i <= j (chron.)

    from jax.scipy.linalg import solve_triangular

    Rinv_p = solve_triangular(R, p, lower=False)
    DgYY = jnp.diag(D) + gamma * YYc
    top_c = solve_triangular(R, DgYY @ Rinv_p - q, lower=False, trans=1)
    bot_c = -Rinv_p

    # back to slot order: slot j sits at chronological position (j-count)%m
    inv = (jnp.arange(m, dtype=state.count.dtype) - state.count) % m
    top = top_c[inv]
    bot = bot_c[inv]

    St = jax.lax.dot_general(
        S, top.astype(bufdt), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # S^T top, (*shape,)
    Yb = jax.lax.dot_general(
        Y, bot.astype(bufdt), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    Hg = gamma * g + St + gamma * Yb
    return -Hg


def _two_loop(state: LBFGSState, g: jax.Array) -> jax.Array:
    """Two-loop recursion: approximate -H @ g (reference implementation)."""
    m = state.s_hist.shape[0]
    perm = _chron_perm(state)
    q = g

    def bwd(i, carry):
        q, alphas = carry
        idx = perm[m - 1 - i]  # most recent first
        valid = state.rho[idx] > 0
        alpha = state.rho[idx] * _vdot(state.s_hist[idx], q)
        alpha = jnp.where(valid, alpha, 0.0)
        q = q - alpha * state.y_hist[idx]
        return q, alphas.at[idx].set(alpha)

    q, alphas = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros((m,), g.dtype)))
    r = state.gamma * q

    def fwd(i, r):
        idx = perm[i]  # oldest first
        valid = state.rho[idx] > 0
        beta = state.rho[idx] * _vdot(state.y_hist[idx], r)
        upd = state.s_hist[idx] * (alphas[idx] - beta)
        return r + jnp.where(valid, upd, 0.0)

    r = jax.lax.fori_loop(0, m, fwd, r)
    return -r


def lbfgs_step(
    state: LBFGSState, g: jax.Array, lr: float = 1.0, method: str = "compact"
) -> tuple[jax.Array, LBFGSState]:
    """One L-BFGS iteration given the gradient at the current point.

    Returns ``(update, new_state)`` where ``update = t*d`` is added to the
    parameters by the caller.  ``method``: 'compact' (default, fast on TPU)
    or 'two_loop' (the textbook recursion; same result, kept as reference).
    """
    m = state.s_hist.shape[0]
    first = state.iteration == 0

    # curvature pair from the previous iteration
    y = g - state.prev_g
    s = state.prev_step
    ys = _vdot(y, s)
    accept = (~first) & (ys > 1e-10)

    # circular-buffer write: overwrite slot count % m with the new pair (a
    # single-row write), or write the existing row back on reject (no-op
    # values, same memory shape — keeps the scan carry layout fixed)
    w = state.count % m
    zeros = (0,) * (state.s_hist.ndim - 1)

    def push(buf, v):
        row = jnp.where(accept, v.astype(buf.dtype), buf[w])
        return jax.lax.dynamic_update_slice(buf, row[None], (w, *zeros))

    s_hist = push(state.s_hist, s)
    y_hist = push(state.y_hist, y)
    new_rho = jnp.where(accept, 1.0 / jnp.maximum(ys, 1e-30), state.rho[w])
    rho = state.rho.at[w].set(new_rho)
    gamma = jnp.where(accept, ys / jnp.maximum(_vdot(y, y), 1e-30), state.gamma)
    count = state.count + accept.astype(state.count.dtype)

    tmp = LBFGSState(
        s_hist, y_hist, rho, gamma, g, state.prev_step, state.iteration, count
    )
    direction_fn = _compact_direction if method == "compact" else _two_loop
    d = jnp.where(first, -g, direction_fn(tmp, g))

    t = jnp.where(
        first, jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(g)), 1e-30)) * lr, lr
    )
    update = t * d
    new_state = LBFGSState(
        s_hist=s_hist,
        y_hist=y_hist,
        rho=rho,
        gamma=gamma,
        prev_g=g,
        prev_step=update,
        iteration=state.iteration + 1,
        count=count,
    )
    return update, new_state
