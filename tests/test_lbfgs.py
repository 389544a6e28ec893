"""L-BFGS parity vs torch.optim.LBFGS on deterministic problems.

The NST engine's optimizer must match torch's default LBFGS behavior
(lr 1, no line search, history reuse across step() calls) closely enough
that 200-closure trajectories agree (SURVEY.md §7 hard-part 1).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from iris_style_transfer_tpu.transfer.lbfgs import lbfgs_init, lbfgs_step


def run_torch_lbfgs(x0, n_evals, lr=1.0, history_size=10):
    """Run torch LBFGS counting closure evaluations like the reference
    (pipelines.py:74-103); returns the parameter trajectory at each eval."""
    x = torch.tensor(x0, requires_grad=True)
    opt = torch.optim.LBFGS([x], lr=lr, history_size=history_size)
    traj = []
    count = [0]
    while count[0] < n_evals:
        def closure():
            opt.zero_grad()
            traj.append(x.detach().numpy().copy())
            loss = loss_fn_torch(x)
            loss.backward()
            count[0] += 1
            return loss

        opt.step(closure)
    return np.asarray(traj[:n_evals])


A = None
loss_fn_torch = None


def setup_quadratic(n=12, seed=0):
    global A, loss_fn_torch
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n)).astype(np.float32)
    A = M @ M.T + np.eye(n, dtype=np.float32) * 0.5
    b = rng.standard_normal(n).astype(np.float32)

    def loss_t(x):
        At = torch.from_numpy(A)
        bt = torch.from_numpy(b)
        return 0.5 * x @ At @ x - bt @ x

    loss_fn_torch = loss_t

    def loss_j(x):
        return 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x

    return loss_j


def run_jax_lbfgs(loss_j, x0, n_evals, lr=1.0, history_size=10):
    grad_fn = jax.grad(loss_j)
    x = jnp.asarray(x0)
    state = lbfgs_init(x.size, history_size)
    traj = []
    for _ in range(n_evals):
        traj.append(np.asarray(x))
        g = grad_fn(x)
        upd, state = lbfgs_step(state, g.reshape(-1), lr)
        x = x + upd.reshape(x.shape)
    return np.asarray(traj)


def test_lbfgs_matches_torch_on_quadratic():
    loss_j = setup_quadratic()
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal(12).astype(np.float32)
    n_evals = 45  # spans three torch step() chunks (max_iter=20)

    traj_t = run_torch_lbfgs(x0, n_evals)
    traj_j = run_jax_lbfgs(loss_j, x0, n_evals)

    # both should converge to the same optimum along the same trajectory
    err = np.abs(traj_t - traj_j) / (np.abs(traj_t) + 1e-3)
    assert err[:10].max() < 1e-2, f"early trajectory diverged: {err[:10].max()}"
    assert np.abs(traj_t[-1] - traj_j[-1]).max() < 1e-2


def test_lbfgs_first_step_scaling():
    """First iteration uses t = min(1, 1/|g|_1) * lr, torch's rule."""
    g = jnp.asarray(np.array([3.0, -4.0, 1.0], np.float32))
    state = lbfgs_init(3)
    upd, state = lbfgs_step(state, g, lr=1.0)
    t = min(1.0, 1.0 / 8.0)
    np.testing.assert_allclose(np.asarray(upd), -t * np.asarray(g), rtol=1e-6)
    assert int(state.iteration) == 1
