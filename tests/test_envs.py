"""Functional env tests: end-to-end closed-loop parity vs the oracle, task rules,
action pipelines, buffer semantics."""

import jax.numpy as jnp
import numpy as np

from gym_pybullet_drones_tpu.control import dsl_pid_control, dsl_pid_reset
from gym_pybullet_drones_tpu.core.rotations import euler_xyz_to_quat
from gym_pybullet_drones_tpu.envs import base as envs
from gym_pybullet_drones_tpu.envs.spec import ActionType, DroneModel, Physics
from oracle import DSLPIDOracle, consts, dyn_substep

CF2X = DroneModel.CF2X


def _cfg(**kw):
    defaults = dict(drone_model=CF2X, physics=Physics.DYN, dtype="float64",
                    renormalize_quat=False)
    defaults.update(kw)
    return envs.AviaryConfig(**defaults)


def test_ctrl_aviary_helix_parity_vs_oracle():
    """Replicates the pid.py loop (examples/pid.py:101-167) on 2 drones under
    DYN physics and checks the full closed loop (env + controller) against a
    NumPy float64 oracle of the entire system."""
    n = 2
    rr = 0.3
    init_xyzs = np.array(
        [[rr * np.cos((i / 6) * 2 * np.pi + np.pi / 2),
          rr * np.sin((i / 6) * 2 * np.pi + np.pi / 2) - rr,
          0.1 + i * 0.05] for i in range(n)]
    )
    init_rpys = np.array([[0, 0, i * (np.pi / 2) / n] for i in range(n)])
    cfg = _cfg(num_drones=n, ctrl_freq=48,
               initial_xyzs=tuple(map(tuple, init_xyzs)),
               initial_rpys=tuple(map(tuple, init_rpys)))
    av = envs.Aviary(cfg)
    state, obs = av.reset()

    num_wp = 48 * 10
    tgts = np.array(
        [[rr * np.cos((i / num_wp) * 2 * np.pi + np.pi / 2) + init_xyzs[0, 0],
          rr * np.sin((i / num_wp) * 2 * np.pi + np.pi / 2) - rr + init_xyzs[0, 1],
          0.0] for i in range(num_wp)]
    )
    wp = np.array([int(i * num_wp / 6) % num_wp for i in range(n)])

    c = consts(CF2X)
    o_pos = init_xyzs.copy()
    o_quat = np.array(euler_xyz_to_quat(jnp.asarray(init_rpys)))
    o_vel = np.zeros((n, 3))
    o_rates = np.zeros((n, 3))
    o_ctrl = [DSLPIDOracle(CF2X) for _ in range(n)]

    action = np.zeros((n, 4))
    for i in range(96):
        # Drive BOTH sims with the oracle controller's action: the loops stay
        # locked, so any env-side dynamics/obs discrepancy shows up directly.
        state, obs, _, _, _ = av.step(state, jnp.asarray(action))
        clipped = np.clip(action, 0, c["max_rpm"])
        for _ in range(5):
            for j in range(n):
                o_pos[j], o_quat[j], o_vel[j], o_rates[j], _ = dyn_substep(
                    o_pos[j], o_quat[j], o_vel[j], o_rates[j], clipped[j], c, 1 / 240
                )
        # Env obs must match the oracle's state exactly
        obs_np = np.asarray(obs)
        np.testing.assert_allclose(obs_np[:, 0:3], o_pos, atol=1e-9)
        np.testing.assert_allclose(obs_np[:, 3:7], o_quat, atol=1e-9)
        np.testing.assert_allclose(obs_np[:, 10:13], o_vel, atol=1e-9)
        tp_all = np.stack([np.hstack([tgts[wp[j], 0:2], init_xyzs[j, 2]]) for j in range(n)])
        for j in range(n):
            action[j], _, _ = o_ctrl[j].compute(
                1 / 48, o_pos[j], o_quat[j], o_vel[j], tp_all[j], init_rpys[j]
            )
        wp = (wp + 1) % num_wp

    np.testing.assert_allclose(np.asarray(state.kin.pos), o_pos, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.kin.quat), o_quat, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.kin.vel), o_vel, atol=1e-9)
    # And the drones actually flew: tracking keeps them near their altitudes
    assert abs(float(state.kin.pos[0, 2]) - 0.1) < 0.05
    assert abs(float(state.kin.pos[1, 2]) - 0.15) < 0.05


def test_ctrl_aviary_helix_free_running_closed_loop():
    """Both sims run their *own* controllers. The loop is mildly chaotic, so
    float-level rounding differences (jax vs scipy rotations, ~1e-9 RPM) grow;
    trajectories must still agree to mm scale over 2 s and track the path."""
    n = 2
    rr = 0.3
    init_xyzs = np.array(
        [[rr * np.cos((i / 6) * 2 * np.pi + np.pi / 2),
          rr * np.sin((i / 6) * 2 * np.pi + np.pi / 2) - rr,
          0.1 + i * 0.05] for i in range(n)]
    )
    init_rpys = np.array([[0, 0, i * (np.pi / 2) / n] for i in range(n)])
    cfg = _cfg(num_drones=n, ctrl_freq=48,
               initial_xyzs=tuple(map(tuple, init_xyzs)),
               initial_rpys=tuple(map(tuple, init_rpys)))
    av = envs.Aviary(cfg)
    state, obs = av.reset()
    num_wp = 48 * 10
    tgts = np.array(
        [[rr * np.cos((i / num_wp) * 2 * np.pi + np.pi / 2) + init_xyzs[0, 0],
          rr * np.sin((i / num_wp) * 2 * np.pi + np.pi / 2) - rr + init_xyzs[0, 1],
          0.0] for i in range(num_wp)]
    )
    wp = np.array([int(i * num_wp / 6) % num_wp for i in range(n)])
    c = consts(CF2X)
    o_pos = init_xyzs.copy()
    o_quat = np.array(euler_xyz_to_quat(jnp.asarray(init_rpys)))
    o_vel = np.zeros((n, 3))
    o_rates = np.zeros((n, 3))
    o_ctrl = [DSLPIDOracle(CF2X) for _ in range(n)]
    jax_ctrl = dsl_pid_reset((n,), dtype=jnp.float64)
    action = np.zeros((n, 4))
    o_action = np.zeros((n, 4))
    for i in range(96):
        state, obs, _, _, _ = av.step(state, jnp.asarray(action))
        clipped = np.clip(o_action, 0, c["max_rpm"])
        for _ in range(5):
            for j in range(n):
                o_pos[j], o_quat[j], o_vel[j], o_rates[j], _ = dyn_substep(
                    o_pos[j], o_quat[j], o_vel[j], o_rates[j], clipped[j], c, 1 / 240
                )
        obs_np = np.asarray(obs)
        tp_all = np.stack([np.hstack([tgts[wp[j], 0:2], init_xyzs[j, 2]]) for j in range(n)])
        rpm_j, jax_ctrl, _, _ = dsl_pid_control(
            av.ctrl_params, jax_ctrl, 1 / 48,
            jnp.asarray(obs_np[:, 0:3]), jnp.asarray(obs_np[:, 3:7]),
            jnp.asarray(obs_np[:, 10:13]), jnp.asarray(tp_all), jnp.asarray(init_rpys),
        )
        action = np.asarray(rpm_j)
        for j in range(n):
            o_action[j], _, _ = o_ctrl[j].compute(
                1 / 48, o_pos[j], o_quat[j], o_vel[j], tp_all[j], init_rpys[j]
            )
        wp = (wp + 1) % num_wp
    np.testing.assert_allclose(np.asarray(state.kin.pos), o_pos, atol=5e-3)
    # Both tracked their altitude setpoints
    assert abs(float(state.kin.pos[0, 2]) - 0.1) < 0.05
    assert abs(o_pos[1, 2] - 0.15) < 0.05


def test_hover_reward_and_done():
    cfg = _cfg(task=envs.TASK_HOVER, ctrl_freq=30, action_type=ActionType.RPM,
               action_buffer_size=15)
    av = envs.Aviary(cfg)
    state, obs = av.reset()
    assert obs.shape == (1, 12 + 15 * 4)
    state2, obs2, rew, term, trunc = av.step(state, jnp.zeros((1, 4)))
    err = np.linalg.norm(np.asarray(state2.kin.pos[0]) - np.array([0, 0, 1.0]))
    np.testing.assert_allclose(float(rew), max(0.0, 2 - err**4), rtol=1e-9)
    assert not bool(term)
    assert not bool(trunc)


def test_hover_truncation_tilt_and_timeout():
    cfg = _cfg(task=envs.TASK_HOVER, ctrl_freq=30, action_buffer_size=15)
    av = envs.Aviary(cfg)
    state, _ = av.reset()
    state_t = state.replace(step_count=jnp.asarray(8 * 240 + 8, dtype=jnp.int32))
    _, _, _, _, trunc = av.step(state_t, jnp.zeros((1, 4)))
    assert bool(trunc)
    # Exact boundary (reference pre-increment counter, BaseAviary.py:376-382):
    # the 241st call (counter 8*240 entering) does NOT truncate; the 242nd
    # (counter 8*241) does — an 8 s episode spans 242 reward-bearing steps.
    s241 = state.replace(step_count=jnp.asarray(8 * 240, dtype=jnp.int32))
    _, _, _, _, t241 = av.step(s241, jnp.zeros((1, 4)))
    assert not bool(t241)
    s242 = state.replace(step_count=jnp.asarray(8 * 241, dtype=jnp.int32))
    _, _, _, _, t242 = av.step(s242, jnp.zeros((1, 4)))
    assert bool(t242)
    kin = state.kin.replace(pos=state.kin.pos.at[0, 0].set(1.6))
    _, _, _, _, trunc2 = av.step(state.replace(kin=kin), jnp.zeros((1, 4)))
    assert bool(trunc2)


def test_multihover_targets_and_reward():
    cfg = _cfg(task=envs.TASK_MULTIHOVER, num_drones=2, ctrl_freq=30,
               action_buffer_size=15)
    av = envs.Aviary(cfg)
    state, obs = av.reset()
    assert obs.shape == (2, 12 + 15 * 4)
    p = envs.build_params(cfg)
    init = envs.default_init_xyzs(cfg, p)
    np.testing.assert_allclose(
        np.asarray(av.target_pos), init + np.array([[0, 0, 1.0], [0, 0, 0.5]]), atol=1e-12
    )
    _, _, rew, _, _ = av.step(state, jnp.zeros((2, 4)))
    assert 0.0 <= float(rew) <= 4.0


def test_action_buffer_oldest_first():
    cfg = _cfg(task=envs.TASK_HOVER, ctrl_freq=30, action_buffer_size=3,
               action_type=ActionType.ONE_D_RPM)
    av = envs.Aviary(cfg)
    state, obs = av.reset()
    assert obs.shape == (1, 12 + 3)
    for val in [0.1, 0.2, 0.3, 0.4]:
        state, obs, _, _, _ = av.step(state, jnp.full((1, 1), val))
    np.testing.assert_allclose(np.asarray(obs[0, 12:]), [0.2, 0.3, 0.4], atol=1e-12)


def test_one_d_rpm_pipeline():
    cfg = _cfg(task=envs.TASK_HOVER, ctrl_freq=30, action_buffer_size=15,
               action_type=ActionType.ONE_D_RPM)
    av = envs.Aviary(cfg)
    state, _ = av.reset()
    c = consts(CF2X)
    rpm, _ = envs.preprocess_action(cfg, av.params, av.ctrl_params, state,
                                    jnp.asarray([[0.2]]))
    np.testing.assert_allclose(np.asarray(rpm), c["hover_rpm"] * 1.01, rtol=1e-12)


def test_velocity_aviary_matches_oracle_controller():
    cfg = _cfg(task=envs.TASK_VELOCITY, num_drones=1, ctrl_freq=48)
    av = envs.Aviary(cfg)
    state, obs = av.reset()
    assert obs.shape == (1, 20)
    o = DSLPIDOracle(CF2X)
    obs_np = np.array(obs)
    act = np.array([[1.0, 0.0, 0.0, 0.5]])
    speed_limit = 0.03 * 30 * 1000 / 3600  # VelocityAviary.py:78
    rpm_o, _, _ = o.compute(
        1 / 48, obs_np[0, 0:3], obs_np[0, 3:7], obs_np[0, 10:13],
        obs_np[0, 0:3], np.array([0, 0, obs_np[0, 9]]),
        np.array([speed_limit * 0.5, 0, 0]),
    )
    rpm_j, _ = envs.preprocess_action(cfg, av.params, av.ctrl_params, state,
                                      jnp.asarray(act))
    np.testing.assert_allclose(np.asarray(rpm_j[0]), rpm_o, atol=1e-8)


def test_pid_action_waypoint_capping():
    cfg = _cfg(task=envs.TASK_HOVER, ctrl_freq=30, action_buffer_size=15,
               action_type=ActionType.PID)
    av = envs.Aviary(cfg)
    state, _ = av.reset()
    far = jnp.asarray([[10.0, 0.0, 0.1125]])
    capped = envs._calculate_next_step(state.kin.pos, far)
    dist = float(jnp.linalg.norm(capped - state.kin.pos))
    np.testing.assert_allclose(dist, 1.0, rtol=1e-9)
    near = state.kin.pos + jnp.asarray([[0.3, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(envs._calculate_next_step(state.kin.pos, near)), np.asarray(near)
    )


def test_adjacency_matrix():
    pos = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [3.0, 0, 0]])
    adj = np.asarray(envs.adjacency_matrix(pos, 1.0))
    want = np.array([[1, 1, 0], [1, 1, 0], [0, 0, 1.0]])
    np.testing.assert_array_equal(adj, want)


def test_compat_space_bounds_match_reference_numbers():
    """Numeric space bounds parity (CtrlAviary.py:74-102, VelocityAviary.py:
    82-94, BaseRLAviary.py:130-277)."""
    import numpy as np
    from gym_pybullet_drones_tpu.compat.gym import (
        CtrlAviary, HoverAviary, VelocityAviary,
    )

    env = CtrlAviary(num_drones=2)
    a = env.action_space
    assert a.shape == (2, 4)
    np.testing.assert_allclose(a.low, 0.0)
    np.testing.assert_allclose(a.high, env.MAX_RPM, rtol=1e-6)
    o = env.observation_space
    assert o.shape == (2, 20)
    np.testing.assert_allclose(o.low[:, 2], 0.0)          # z >= 0
    np.testing.assert_allclose(o.low[:, 3:7], -1.0)        # quat
    np.testing.assert_allclose(o.high[:, 7:10], np.pi, rtol=1e-6)     # rpy
    np.testing.assert_allclose(o.high[:, 16:20], env.MAX_RPM, rtol=1e-6)

    v = VelocityAviary(num_drones=1)
    np.testing.assert_allclose(v.action_space.low[0], [-1, -1, -1, 0])
    np.testing.assert_allclose(v.action_space.high[0], [1, 1, 1, 1])

    h = HoverAviary()  # default act=RPM (HoverAviary.py:22) -> 4-dim
    assert h.action_space.shape == (1, 4)
    assert h.observation_space.shape == (1, 12 + 15 * 4)
    np.testing.assert_allclose(h.observation_space.low[0, 2], 0.0)
    np.testing.assert_allclose(h.observation_space.low[0, 12:], -1.0)
    np.testing.assert_allclose(h.observation_space.high[0, 12:], 1.0)


def test_compat_normalized_action_to_rpm():
    """_normalizedActionToRPM piecewise map (BaseAviary.py:896-915):
    -1 -> 0, 0 -> HOVER_RPM, 1 -> MAX_RPM, linear on each side."""
    import numpy as np
    from gym_pybullet_drones_tpu.compat.gym import CtrlAviary

    env = CtrlAviary(num_drones=1)
    rpm = env._normalizedActionToRPM(np.array([-1.0, 0.0, 1.0, 0.5]))
    np.testing.assert_allclose(
        rpm, [0.0, env.HOVER_RPM, env.MAX_RPM,
              env.HOVER_RPM + 0.5 * (env.MAX_RPM - env.HOVER_RPM)], rtol=1e-6)
    np.testing.assert_allclose(env._normalizedActionToRPM(np.full(4, -0.5)),
                               0.5 * env.HOVER_RPM, rtol=1e-6)
    env.close()
