"""Checkpoint save/restore incl. optimizer-state pytrees with namedtuples."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

import pytest

from iris_style_transfer_tpu.runtime.checkpoint import (
    latest_state_step,
    latest_step,
    restore_checkpoint,
    restore_checkpoint_file,
    restore_params,
    restore_state,
    save_checkpoint,
    save_state,
)


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path)
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.int32(7)}
    save_checkpoint(d, 7, state)
    save_checkpoint(d, 14, state)
    assert latest_step(d) == 14
    step, back = restore_checkpoint(d)
    assert step == 14
    np.testing.assert_array_equal(back["params"]["w"], np.arange(6.0).reshape(2, 3))


def test_optimizer_state_roundtrip(tmp_path):
    d = str(tmp_path)
    params = {"fc": {"w": jnp.ones((4, 3)), "b": jnp.zeros(3)}}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    # take one step so the state is non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    save_state(d, 3, (params, opt_state, jnp.int32(3)))
    assert latest_state_step(d) == 3
    template = (jax.tree.map(jnp.zeros_like, params), opt.init(params), jnp.int32(0))
    step, (p2, o2, s2) = restore_state(d, template)
    assert step == 3 and int(s2) == 3
    np.testing.assert_allclose(np.asarray(p2["fc"]["w"]), np.asarray(params["fc"]["w"]))
    for a, b in zip(jax.tree.leaves(o2), jax.tree.leaves(opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_exact_file_not_latest(tmp_path):
    """restore_checkpoint_file / restore_params honor the *named* file even
    when a newer checkpoint exists in the same directory (the reference
    loads the precise epoch file it is given,
    iris_style_transfer_openeds2019.py:235-239)."""
    d = str(tmp_path)
    old = save_checkpoint(d, 7, {"params": {"w": jnp.full((2,), 7.0)}})
    save_checkpoint(d, 14, {"params": {"w": jnp.full((2,), 14.0)}})

    step, state = restore_checkpoint_file(old)
    assert step == 7
    np.testing.assert_array_equal(state["params"]["w"], np.full((2,), 7.0))

    np.testing.assert_array_equal(restore_params(old)["w"], np.full((2,), 7.0))
    # a directory still means "latest"
    np.testing.assert_array_equal(restore_params(d)["w"], np.full((2,), 14.0))
    # empty path -> default; named-but-missing path -> error
    assert restore_params("", default="dflt") == "dflt"
    with pytest.raises(FileNotFoundError):
        restore_params(str(tmp_path / "missing.npz"))


def test_restore_missing_returns_none(tmp_path):
    assert restore_checkpoint(str(tmp_path / "nope")) is None
    assert restore_state(str(tmp_path / "nope"), {"a": jnp.zeros(1)}) is None


def test_sweep_done_tolerates_added_default_knobs(tmp_path):
    """A config key ADDED to WorkloadConfig after a done.json was written
    must not invalidate the marker while it holds its default value
    (otherwise every new knob forces a one-time re-run of all completed
    sweep combos); a non-default value must still re-run."""
    from iris_style_transfer_tpu.utils.misc import sweep_done, write_sweep_marker

    marker = str(tmp_path / "done.json")
    old_config = {"bs": 8, "seed": 42}
    write_sweep_marker(marker, old_config, {"m": 1.0})

    new_config = {"bs": 8, "seed": 42, "stats_taps": "auto"}
    defaults = {"stats_taps": "auto"}
    assert sweep_done(marker, new_config, defaults=defaults)
    assert not sweep_done(marker, {**new_config, "stats_taps": "on"}, defaults=defaults)
    # a changed PRE-EXISTING key still invalidates
    assert not sweep_done(marker, {"bs": 16, "seed": 42, "stats_taps": "auto"},
                          defaults=defaults)
    # without defaults, exact equality is required (old strict behavior)
    assert not sweep_done(marker, new_config)
