"""Compact-representation L-BFGS must equal the two-loop recursion."""

import numpy as np

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.transfer.lbfgs import lbfgs_init, lbfgs_step


def _run(loss_j, x0, n_evals, method, history_size=6):
    grad_fn = jax.grad(loss_j)
    x = jnp.asarray(x0)
    state = lbfgs_init(x.size, history_size)
    traj = []
    for _ in range(n_evals):
        traj.append(np.asarray(x))
        g = grad_fn(x)
        upd, state = lbfgs_step(state, g.reshape(-1), 1.0, method=method)
        x = x + upd.reshape(x.shape)
    return np.asarray(traj)


def test_compact_equals_two_loop():
    rng = np.random.default_rng(0)
    n = 20
    M = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(M @ M.T + np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def loss(x):
        return 0.5 * x @ A @ x - b @ x + 0.1 * jnp.sum(x**4)  # non-quadratic

    x0 = rng.standard_normal(n).astype(np.float32)
    # run past the history size so the circular buffer wraps
    t_two = _run(loss, x0, 25, "two_loop")
    t_cmp = _run(loss, x0, 25, "compact")
    scale = np.abs(t_two).max()
    np.testing.assert_allclose(t_cmp, t_two, atol=2e-3 * scale)


def test_compact_bf16_near_cancelling_pair_stays_finite():
    """Regression: with bfloat16 history buffers, an accepted
    near-cancelling pair (f32 y.s ~ 1e-4 > 1e-10) quantizes to a zero
    bf16 diagonal in S Y', which made the compact form's triangular solve
    singular and the direction NaN — inside the NST scan the NaN image
    then poisoned every remaining closure.  The R/D diagonal now comes
    from the f32 y.s the acceptance test used (lbfgs.py)."""
    state = lbfgs_init(4, 3, dtype=jnp.bfloat16)
    # fabricate the previous iteration: s = [1, -1+1e-4, 0, 0] rounds to
    # [1, -1, 0, 0] in bf16, so the buffer dot s.y becomes exactly 0
    s = jnp.array([1.0, -1.0 + 1e-4, 0.0, 0.0])
    state = state._replace(
        prev_g=jnp.zeros(4), prev_step=s, iteration=jnp.int32(1)
    )
    g = jnp.array([1.0, 1.0, 0.0, 0.0])  # y = g - prev_g -> f32 y.s = 1e-4
    upd, state = lbfgs_step(state, g, method="compact")
    assert np.isfinite(np.asarray(upd)).all()
    assert int(state.count) == 1  # the pair WAS accepted
    upd2, _ = lbfgs_step(state, jnp.array([0.5, -0.3, 0.2, 0.1]), method="compact")
    assert np.isfinite(np.asarray(upd2)).all()


def test_shape_native_state_matches_flat():
    """lbfgs state in the parameter's native shape (e.g. an image batch)
    must produce the same trajectory as the flat (N,) form — the native
    form exists to avoid tiled<->linear relayouts on TPU (perf_probe9)."""
    rng = np.random.default_rng(3)
    shape = (2, 3, 4)  # 24 params as a 3-d array
    n = int(np.prod(shape))
    M = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(M @ M.T + np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def loss_flat(x):
        return 0.5 * x @ A @ x - b @ x + 0.1 * jnp.sum(x**4)

    def loss_nd(x):
        return loss_flat(x.reshape(-1))

    x0 = rng.standard_normal(n).astype(np.float32)
    xf = jnp.asarray(x0)
    xn = jnp.asarray(x0.reshape(shape))
    sf = lbfgs_init(n, 5)
    sn = lbfgs_init(shape, 5)
    for _ in range(12):  # past history wrap
        gf = jax.grad(loss_flat)(xf)
        gn = jax.grad(loss_nd)(xn)
        uf, sf = lbfgs_step(sf, gf, method="compact")
        un, sn = lbfgs_step(sn, gn, method="compact")
        xf = xf + uf
        xn = xn + un
    scale = float(jnp.abs(xf).max())
    np.testing.assert_allclose(
        np.asarray(xn).reshape(-1), np.asarray(xf), atol=2e-4 * scale
    )
