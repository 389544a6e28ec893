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

History is a fixed-size circular buffer (slot -1 = most recent).  torch's
default ``history_size=100`` would hold 2x100 image-sized vectors; the
curvature benefit saturates far earlier, so ``history_size`` defaults to 10
here and is configurable (memory on v5e is the binding constraint; see
SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LBFGSState(NamedTuple):
    s_hist: jax.Array  # (m, N) previous steps, slot -1 most recent
    y_hist: jax.Array  # (m, N) previous gradient differences
    rho: jax.Array  # (m,) 1/(y.s); 0 marks an empty/rejected slot
    gamma: jax.Array  # () initial Hessian scale
    prev_g: jax.Array  # (N,) gradient at previous closure
    prev_step: jax.Array  # (N,) previous update t*d
    iteration: jax.Array  # () global iteration counter


def lbfgs_init(n: int, history_size: int = 10, dtype=jnp.float32) -> LBFGSState:
    m = history_size
    return LBFGSState(
        s_hist=jnp.zeros((m, n), dtype),
        y_hist=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype),
        gamma=jnp.ones((), dtype),
        prev_g=jnp.zeros((n,), dtype),
        prev_step=jnp.zeros((n,), dtype),
        iteration=jnp.zeros((), jnp.int32),
    )


def _compact_direction(state: LBFGSState, g: jax.Array) -> jax.Array:
    """-H @ g via the compact inverse representation (Byrd-Nocedal-Schnabel;
    Nocedal & Wright eq. 7.25):

        H = gI + [S gY] [[ R^{-T}(D + g Y'Y) R^{-1}, -R^{-T}],
                          [-R^{-1},                   0     ]] [S'; gY']

    with S, Y the (m, N) history (rows chronological, slot -1 newest),
    R = upper-triangle(S Y'), D = diag(S Y').  Mathematically identical to
    the two-loop recursion but all large-N work is two (m, N) matmuls plus
    tiny m x m triangular solves — the two-loop's 2m sequential dot
    products serialize badly on TPU (measured ~29ms/step at m=10 for a
    12.6M-element image batch vs ~2ms for this form).

    Invalid slots (rho == 0: empty or curvature-rejected) are masked by
    zeroing their rows and putting 1 on R's diagonal so they contribute
    nothing.
    """
    m = state.s_hist.shape[0]
    gamma = state.gamma
    valid = state.rho > 0  # (m,)

    S = jnp.where(valid[:, None], state.s_hist, 0.0)
    Y = jnp.where(valid[:, None], state.y_hist, 0.0)

    W = jnp.concatenate([S, Y], axis=0)  # (2m, N)
    Wg = W @ g  # (2m,)
    WWt = jax.lax.dot_general(
        W, W, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2m, 2m)
    SY = WWt[:m, m:]  # S Y^T  (i,j) = s_i . y_j
    YY = WWt[m:, m:]

    D = jnp.diagonal(SY)
    R = jnp.triu(SY)  # R_ij = s_i.y_j for i <= j (chronological order)
    # invalid slots have zero rows/cols (S, Y zeroed); put 1 on R's diagonal
    # there so the triangular solves are well-posed and contribute nothing
    eye = jnp.eye(m, dtype=R.dtype)
    R = R + jnp.where(valid, 0.0, 1.0)[None, :] * eye

    p = Wg[:m]  # S^T g
    q = gamma * Wg[m:]  # g Y^T g

    from jax.scipy.linalg import solve_triangular

    Rinv_p = solve_triangular(R, p, lower=False)
    DgYY = jnp.diag(D) + gamma * YY
    top = solve_triangular(R, DgYY @ Rinv_p - q, lower=False, trans=1)
    bot = -Rinv_p

    Hg = gamma * g + S.T @ top + gamma * (Y.T @ bot)
    return -Hg


def _two_loop(state: LBFGSState, g: jax.Array) -> jax.Array:
    """Two-loop recursion: approximate -H @ g."""
    m = state.s_hist.shape[0]
    q = g

    def bwd(i, carry):
        q, alphas = carry
        idx = m - 1 - i  # most recent first
        valid = state.rho[idx] > 0
        alpha = state.rho[idx] * jnp.dot(state.s_hist[idx], q)
        alpha = jnp.where(valid, alpha, 0.0)
        q = q - alpha * state.y_hist[idx]
        return q, alphas.at[idx].set(alpha)

    q, alphas = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros((m,), g.dtype)))
    r = state.gamma * q

    def fwd(idx, r):
        valid = state.rho[idx] > 0
        beta = state.rho[idx] * jnp.dot(state.y_hist[idx], r)
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
    first = state.iteration == 0

    # curvature pair from the previous iteration
    y = g - state.prev_g
    s = state.prev_step
    ys = jnp.dot(y, s)
    accept = (~first) & (ys > 1e-10)

    def push(buf, v):
        return jnp.where(accept, jnp.concatenate([buf[1:], v[None]], axis=0), buf)

    s_hist = push(state.s_hist, s)
    y_hist = push(state.y_hist, y)
    rho = jnp.where(
        accept,
        jnp.concatenate([state.rho[1:], (1.0 / jnp.maximum(ys, 1e-30))[None]]),
        state.rho,
    )
    gamma = jnp.where(accept, ys / jnp.maximum(jnp.dot(y, y), 1e-30), state.gamma)

    tmp = LBFGSState(s_hist, y_hist, rho, gamma, g, state.prev_step, state.iteration)
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
    )
    return update, new_state
