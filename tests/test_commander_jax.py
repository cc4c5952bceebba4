"""Parity and fleet-mission tests for the JAX high-level-commander twin
(control/commander.py) vs the native crtp commander
(bridges/cffirmware/src/cffirm.cpp:502-619)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.bridges import cffirmware as firm
from gym_pybullet_drones_tpu.control.commander import (
    mission_finished,
    mission_setpoint,
    plan_mission,
    septic_blend,
)

RAD2DEG = 57.29577951308232


def test_septic_blend_boundary_conditions():
    for tau, want in ((0.0, 0.0), (1.0, 1.0)):
        s, ds, dds = septic_blend(jnp.float32(tau))
        assert float(s) == pytest.approx(want, abs=1e-6)
        assert float(ds) == pytest.approx(0.0, abs=1e-5)
        assert float(dds) == pytest.approx(0.0, abs=1e-4)
    s, ds, _ = septic_blend(jnp.float32(0.5))
    assert float(s) == pytest.approx(0.5, abs=1e-6)  # odd symmetry about 0.5
    assert float(ds) > 2.0  # peak slope of the septic blend is 35/16


def test_mission_matches_native_commander():
    """takeoff -> goto -> land chain: the compiled-leg evaluation reproduces
    the C commander's setpoints at sampled times through every leg."""
    firm.crtpCommanderHighLevelInit()
    state = firm.state_t()
    sp = firm.setpoint_t()

    start = np.array([0.3, -0.2, 0.0], np.float32)
    corner = np.array([1.0, 0.5, 0.8], np.float32)
    yaw_goto = 0.9  # rad

    legs = plan_mission(start, 0.0, [
        {"pos": np.array([0.3, -0.2, 0.5]), "duration": 2.0},
        {"pos": corner, "yaw": yaw_goto, "duration": 3.0},
        {"pos": np.array([1.0, 0.5, 0.05]), "duration": 2.5},
    ])

    def tell(pos, yaw_rad, t):
        state.position.x, state.position.y, state.position.z = map(float, pos)
        state.attitude.yaw = yaw_rad * RAD2DEG
        firm.crtpCommanderHighLevelTellState(state)
        firm.crtpCommanderHighLevelUpdateTime(t)

    # Plan each native leg at its start, chained off the previous target —
    # the same chaining plan_mission compiles.
    tell(start, 0.0, 0.0)
    firm.crtpCommanderHighLevelTakeoff(0.5, 2.0)
    plans = [
        (2.0, lambda: firm.crtpCommanderHighLevelGoTo(
            float(corner[0]), float(corner[1]), float(corner[2]),
            yaw_goto, 3.0, 0)),
        (5.0, lambda: firm.crtpCommanderHighLevelLand(0.05, 2.5)),
    ]
    ends = [np.array([0.3, -0.2, 0.5]), corner]
    yaws = [0.0, yaw_goto]

    samples = []
    for t in np.arange(0.0, 7.5, 0.125):
        while plans and t >= plans[0][0] - 1e-9:
            _, do_plan = plans.pop(0)
            tell(ends.pop(0), yaws.pop(0), t)
            do_plan()
        firm.crtpCommanderHighLevelUpdateTime(float(t))
        firm.crtpCommanderHighLevelGetSetpoint(sp, state)
        samples.append((t, np.array([sp.position.x, sp.position.y, sp.position.z]),
                        np.array([sp.velocity.x, sp.velocity.y, sp.velocity.z]),
                        np.array([sp.acceleration.x, sp.acceleration.y,
                                  sp.acceleration.z]),
                        sp.attitude.yaw,
                        np.array([sp.attitudeQuaternion.x, sp.attitudeQuaternion.y,
                                  sp.attitudeQuaternion.z, sp.attitudeQuaternion.w])))

    for t, pos_c, vel_c, acc_c, yaw_deg_c, quat_c in samples:
        got = mission_setpoint(legs, jnp.float32(t))
        np.testing.assert_allclose(np.asarray(got["pos"]), pos_c, atol=2e-5,
                                   err_msg=f"pos at t={t}")
        np.testing.assert_allclose(np.asarray(got["vel"]), vel_c, atol=2e-4,
                                   err_msg=f"vel at t={t}")
        np.testing.assert_allclose(np.asarray(got["acc"]), acc_c, atol=2e-3,
                                   err_msg=f"acc at t={t}")
        np.testing.assert_allclose(float(got["yaw"]) * RAD2DEG, yaw_deg_c,
                                   atol=1e-3, err_msg=f"yaw at t={t}")
        np.testing.assert_allclose(np.asarray(got["quat"]), quat_c, atol=1e-5,
                                   err_msg=f"quat at t={t}")

    assert not bool(mission_finished(legs, 7.4))
    assert bool(mission_finished(legs, 7.6))


def test_fleet_mission_on_device():
    """Four drones fly takeoff -> per-drone square corner (with hold) -> land,
    entirely on-device: compiled mission legs + the Mellinger twin inside one
    lax.scan. This is the CFAviary mission stack (CFAviary.py:435-606 command
    queue -> firmware planner -> Mellinger) re-architected batched."""
    from gym_pybullet_drones_tpu.control.mellinger import (
        mellinger_params,
        mellinger_reset,
        mellinger_rpm,
    )
    from gym_pybullet_drones_tpu.core.rotations import quat_to_euler_xyz
    from gym_pybullet_drones_tpu.envs import base
    from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL

    n = 4
    starts = np.array([[0.3 * i, 0.0, 0.06] for i in range(n)], np.float32)
    corners = starts + np.array([[0.4, 0.4, 0.44], [-0.4, 0.4, 0.44],
                                 [0.4, -0.4, 0.44], [-0.4, -0.4, 0.44]],
                                np.float32)
    lands = corners * np.array([1.0, 1.0, 0.0], np.float32) + \
        np.array([0.0, 0.0, 0.08], np.float32)

    legs = plan_mission(starts, np.zeros(n, np.float32), [
        {"pos": starts + np.array([0, 0, 0.44], np.float32),
         "duration": 2.0, "hold": 0.5},
        {"pos": corners, "duration": 2.0, "hold": 0.5},
        {"pos": lands, "duration": 2.0, "hold": 1.0},
    ])

    cfg = AviaryConfig(num_drones=n, task=TASK_CTRL, pyb_freq=500,
                       ctrl_freq=500, action_buffer_size=0, dtype="float32")
    params = base.build_params(cfg)
    ctrl_params = base.build_ctrl_params(cfg)
    state0 = base.reset(cfg, params).replace(
        kin=base.reset(cfg, params).kin.replace(pos=jnp.asarray(starts)))
    target = jnp.zeros((n, 3), jnp.float32)
    mparams = mellinger_params()
    mstate0 = mellinger_reset(batch_shape=(n,))
    dt = jnp.float32(1.0 / 500.0)
    rad2deg = jnp.float32(RAD2DEG)

    def tick(carry, k):
        state, mstate, prev_rpy = carry
        t = k.astype(jnp.float32) * dt
        sp = mission_setpoint(legs, jnp.broadcast_to(t, (n,)))
        rpy = quat_to_euler_xyz(state.kin.quat)
        gyro_deg = (rpy - prev_rpy) / dt * rad2deg
        rpm, mstate = mellinger_rpm(
            mparams, mstate, state.kin.pos, state.kin.vel, state.kin.quat,
            gyro_deg, sp["pos"], sp_vel=sp["vel"], sp_acc=sp["acc"],
            sp_quat=sp["quat"],
            sp_rate_deg=jnp.stack([jnp.zeros_like(sp["yaw_rate"]),
                                   jnp.zeros_like(sp["yaw_rate"]),
                                   sp["yaw_rate"] * rad2deg], -1))
        state, *_ = base.step(cfg, params, ctrl_params, target, state,
                              jnp.zeros((n, 4), jnp.float32),
                              preprocessed_rpm=rpm)
        return (state, mstate, rpy), state.kin.pos

    prev_rpy0 = quat_to_euler_xyz(state0.kin.quat)
    (state, _, _), track = jax.jit(lambda c: jax.lax.scan(
        tick, c, jnp.arange(4100)))((state0, mstate0, prev_rpy0))

    track = np.asarray(track)
    # Mid-mission: at the end of the corner hold (t=4.5 s) every drone sits at
    # its own corner (firmware mass bias keeps z within ~0.1).
    mid = track[int(4.5 * 500) - 1]
    assert np.all(np.abs(mid[:, :2] - corners[:, :2]) < 0.06), mid
    assert np.all(np.abs(mid[:, 2] - corners[:, 2]) < 0.12), mid
    # Final: landed at the per-drone pads, xy tight, z within the bias band.
    final = np.asarray(state.kin.pos)
    assert np.all(np.abs(final[:, :2] - lands[:, :2]) < 0.06), final
    assert np.all(np.abs(final[:, 2] - lands[:, 2]) < 0.15), final


def test_mixed_batch_hold_does_not_shift_zero_hold_drones():
    """A per-drone hold of [5, 0] must delay only drone 0's next leg: drone
    1's schedule is unshifted (no phantom 1e-3 s hold leg in its timeline)."""
    import jax.numpy as jnp
    import numpy as np

    from gym_pybullet_drones_tpu.control.commander import (
        mission_setpoint,
        plan_mission,
    )

    legs = plan_mission(
        init_pos=np.zeros((2, 3)), init_yaw=np.zeros(2),
        legs=[
            {"pos": np.array([[0, 0, 1.0], [0, 0, 1.0]]), "duration": 2.0,
             "hold": np.array([5.0, 0.0])},
            {"pos": np.array([[1.0, 0, 1.0], [1.0, 0, 1.0]]), "duration": 2.0},
        ])
    # At t=3.0: drone 0 is mid-hold (still at [0,0,1], zero velocity);
    # drone 1 started its second leg at exactly t=2.0 (halfway by t=3.0).
    sp = mission_setpoint(legs, jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(sp["pos"][0]), [0, 0, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp["vel"][0]), 0.0, atol=1e-6)
    assert 0.2 < float(sp["pos"][1, 0]) < 0.8  # drone 1 underway since t=2.0
    # and at t=4.0 drone 1 has ARRIVED (2 s leg from t=2.0), drone 0 holds
    sp4 = mission_setpoint(legs, jnp.asarray(4.0))
    np.testing.assert_allclose(np.asarray(sp4["pos"][1]), [1.0, 0, 1.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp4["pos"][0]), [0, 0, 1.0],
                               atol=1e-6)
