"""Stability fuzzing: extreme random actions must never leak NaNs to obs.

The reference has no such guard (a diverged PyBullet sim silently poisons the
run, SURVEY §5); here `reset_on_nan` in the batched step must terminate and
auto-reset any env whose state leaves float range, so every observation that
reaches a learner is finite.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import (
    AviaryConfig,
    TASK_CTRL,
    TASK_HOVER,
    TASK_VELOCITY,
)
from gym_pybullet_drones_tpu.envs.spec import ActionType, DroneModel, Physics
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset, make_batched_step


@pytest.mark.parametrize("physics", [Physics.PYB, Physics.DYN,
                                     Physics.PYB_GND_DRAG_DW])
def test_ctrl_task_extreme_rpm_fuzz(physics):
    cfg = AviaryConfig(task=TASK_CTRL, num_drones=2, physics=physics,
                       pyb_freq=240, ctrl_freq=30)
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = jnp.zeros((2, 3), dtype=cfg.jnp_dtype)
    step = jax.jit(make_batched_step(cfg, params, cp, tp, auto_reset=True,
                                     reset_on_nan=True))
    E = 4
    state = batch_reset(cfg, params, E)
    rng = np.random.RandomState(0)
    for t in range(100):
        # Raw RPM actions across and beyond the legal range (clipped by the
        # CtrlAviary pipeline) with occasional inf/nan injections
        action = rng.uniform(-1e5, 1e5, (E, 2, 4)).astype(np.float32)
        if t % 17 == 0:
            action[0, 0, 0] = np.inf
        if t % 23 == 0:
            action[1, 0, 1] = np.nan
        state, out = step(state, jnp.asarray(action))
        assert np.all(np.isfinite(np.asarray(out.obs))), f"NaN obs at t={t}"
    assert np.all(np.isfinite(np.asarray(state.kin.pos)))


@pytest.mark.parametrize("act", [ActionType.RPM, ActionType.PID,
                                 ActionType.VEL, ActionType.ONE_D_PID])
def test_rl_task_action_fuzz(act):
    cfg = AviaryConfig(task=TASK_HOVER, action_type=act, pyb_freq=240,
                       ctrl_freq=30, action_buffer_size=2)
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = envbase.hover_target_pos(cfg, params)
    step = jax.jit(make_batched_step(cfg, params, cp, tp, auto_reset=True,
                                     reset_on_nan=True))
    E = 4
    state = batch_reset(cfg, params, E)
    rng = np.random.RandomState(1)
    for t in range(60):
        action = rng.uniform(-3, 3, (E, 1, cfg.action_dim)).astype(np.float32)
        state, out = step(state, jnp.asarray(action))
        assert np.all(np.isfinite(np.asarray(out.obs))), (act, t)
        assert np.all(np.isfinite(np.asarray(out.reward)))


def test_contact_solver_fuzz_vs_oracle():
    """Sequential-impulse solver fuzz: random small fleets (random poses,
    spins, overlaps, ground proximity) must match the float64 oracle twin
    (tests/oracle.py::contact_solve_fleet) to near round-off on EVERY draw —
    sweep order, clamp accumulation and mask semantics have no data-dependent
    blind spots."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracle import consts, contact_solve_fleet
    from scipy.spatial.transform import Rotation

    from gym_pybullet_drones_tpu.core.contact import solve_contacts
    from gym_pybullet_drones_tpu.core.params import drone_params

    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    c = consts(DroneModel.CF2X)
    rng = np.random.RandomState(7)
    dt = 1.0 / 240.0
    for trial in range(25):
        n = rng.randint(1, 6)
        pos = rng.uniform(-0.15, 0.15, (n, 3))
        pos[:, 2] = rng.uniform(-0.01, 0.25, n)  # some below/at/above ground
        quat = Rotation.from_euler(
            "xyz", rng.uniform(-1.5, 1.5, (n, 3))).as_quat().reshape(n, 4)
        vel = rng.normal(0.0, 1.0, (n, 3))
        ang_v = rng.normal(0.0, 3.0, (n, 3))
        v_j, w_j = solve_contacts(
            jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(vel),
            jnp.asarray(ang_v), params, dt, drone_drone=(n > 1))
        v_o, w_o = contact_solve_fleet(pos, quat, vel, ang_v, c, dt,
                                       drone_drone=(n > 1))
        np.testing.assert_allclose(np.asarray(v_j), v_o, atol=1e-10,
                                   err_msg=f"trial {trial} vel")
        np.testing.assert_allclose(np.asarray(w_j), w_o, atol=1e-9,
                                   err_msg=f"trial {trial} ang_v")
