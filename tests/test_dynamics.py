"""Explicit-dynamics kernel parity vs the float64 oracle, plus PYB-mode sanity."""

import jax.numpy as jnp
import numpy as np

from gym_pybullet_drones_tpu.core.dynamics import (
    KinState,
    init_kin_state,
    step_physics,
    substep_dyn,
    substep_pyb,
)
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
from oracle import consts, dyn_substep

DT = 1.0 / 240.0


def _rand_rpm(rng, c, shape):
    return rng.uniform(0.2, 1.0, size=shape) * c["max_rpm"]


def test_dyn_substep_bit_parity_all_models():
    for model in DroneModel:
        c = consts(model)
        params = drone_params(model, dtype=jnp.float64)
        rng = np.random.default_rng(0)
        pos = np.array([0.1, -0.2, 0.5])
        quat = np.array([0.05, -0.02, 0.1, 0.99])
        quat /= np.linalg.norm(quat)
        vel = np.array([0.3, 0.1, -0.2])
        rates = np.array([0.5, -1.0, 0.2])
        state = KinState(
            pos=jnp.asarray(pos)[None], quat=jnp.asarray(quat)[None],
            vel=jnp.asarray(vel)[None], ang_v=jnp.zeros((1, 3)),
            rpy_rates=jnp.asarray(rates)[None],
        )
        for _ in range(500):
            rpm = _rand_rpm(rng, c, (4,))
            state = substep_dyn(state, jnp.asarray(rpm)[None], params, DT)
            pos, quat, vel, rates, ang_v = dyn_substep(pos, quat, vel, rates, rpm, c, DT, model)
        np.testing.assert_allclose(np.asarray(state.pos[0]), pos, rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(state.quat[0]), quat, rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(state.vel[0]), vel, rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(state.rpy_rates[0]), rates, rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(state.ang_v[0]), ang_v, rtol=0, atol=1e-12)


def test_step_physics_dyn_matches_looped_substeps():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    c = consts(DroneModel.CF2X)
    state = init_kin_state(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.full((1, 4), c["hover_rpm"] * 1.01)
    out, last = step_physics(state, rpm, rpm, params, DT, 5, Physics.DYN, renormalize_quat=False)
    manual = state
    for _ in range(5):
        manual = substep_dyn(manual, rpm, params, DT)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(manual.pos), atol=1e-15)
    np.testing.assert_array_equal(np.asarray(last), np.asarray(rpm))


def test_hover_rpm_hovers_dyn():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    c = consts(DroneModel.CF2X)
    state = init_kin_state(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.full((1, 4), c["hover_rpm"])
    for _ in range(240):
        state, _ = step_physics(state, rpm, rpm, params, DT, 1, Physics.DYN)
    np.testing.assert_allclose(np.asarray(state.pos[0]), [0, 0, 1.0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.vel[0]), 0.0, atol=1e-9)


def test_hover_rpm_hovers_pyb():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    c = consts(DroneModel.CF2X)
    state = init_kin_state(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.full((1, 4), c["hover_rpm"])
    for _ in range(240):
        state, _ = step_physics(state, rpm, rpm, params, DT, 1, Physics.PYB)
    np.testing.assert_allclose(np.asarray(state.pos[0]), [0, 0, 1.0], atol=1e-9)


def test_pyb_vs_dyn_torque_equivalence_cf2p():
    """For CF2P the prop offsets are exactly L along the axes, so PYB-mode and
    DYN-mode torques agree; short free-flight trajectories should stay close."""
    params = drone_params(DroneModel.CF2P, dtype=jnp.float64)
    c = consts(DroneModel.CF2P)
    init = init_kin_state(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.asarray([[1.02, 0.98, 1.01, 0.99]]) * c["hover_rpm"]
    s_dyn, s_pyb = init, init
    for _ in range(24):
        s_dyn, _ = step_physics(s_dyn, rpm, rpm, params, DT, 1, Physics.DYN)
        s_pyb, _ = step_physics(s_pyb, rpm, rpm, params, DT, 1, Physics.PYB)
    np.testing.assert_allclose(np.asarray(s_dyn.pos), np.asarray(s_pyb.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_dyn.quat), np.asarray(s_pyb.quat), atol=1e-3)


def test_ground_contact_clamp():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    state = init_kin_state(jnp.array([[0.0, 0.0, 0.0125]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.zeros((1, 4))
    for _ in range(100):
        state, _ = step_physics(state, rpm, rpm, params, DT, 1, Physics.PYB)
    assert float(state.pos[0, 2]) >= 0.0124
    assert abs(float(state.vel[0, 2])) < 1e-9


def test_dyn_no_contact_falls_through():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    state = init_kin_state(jnp.array([[0.0, 0.0, 0.01]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.zeros((1, 4))
    for _ in range(100):
        state, _ = step_physics(state, rpm, rpm, params, DT, 1, Physics.DYN)
    assert float(state.pos[0, 2]) < 0.0  # reference DYN has no ground plane


def test_batched_broadcasting():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    c = consts(DroneModel.CF2X)
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(7, 5, 3)) + np.array([0, 0, 5.0])
    quat = rng.normal(size=(7, 5, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    state = KinState(
        pos=jnp.asarray(pos), quat=jnp.asarray(quat),
        vel=jnp.zeros((7, 5, 3)), ang_v=jnp.zeros((7, 5, 3)),
        rpy_rates=jnp.zeros((7, 5, 3)),
    )
    rpm = jnp.asarray(rng.uniform(0.5, 1.0, size=(7, 5, 4)) * c["max_rpm"])
    out, _ = step_physics(state, rpm, rpm, params, DT, 2, Physics.PYB_GND_DRAG_DW)
    assert out.pos.shape == (7, 5, 3)
    # Env 3, drone 2 must equal the same single-env computation
    single = KinState(
        pos=state.pos[3], quat=state.quat[3], vel=state.vel[3],
        ang_v=state.ang_v[3], rpy_rates=state.rpy_rates[3],
    )
    sout, _ = step_physics(single, rpm[3], rpm[3], params, DT, 2, Physics.PYB_GND_DRAG_DW)
    np.testing.assert_allclose(np.asarray(out.pos[3]), np.asarray(sout.pos), atol=1e-12)
