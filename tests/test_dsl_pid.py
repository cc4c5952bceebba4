"""DSL PID parity vs the float64 oracle."""

import jax.numpy as jnp
import numpy as np

from gym_pybullet_drones_tpu.control.dsl_pid import (
    DSLPIDState,
    dsl_pid_control,
    dsl_pid_params,
    dsl_pid_reset,
    one23d_interface,
)
from gym_pybullet_drones_tpu.envs.spec import DroneModel
from oracle import DSLPIDOracle

DT = 1.0 / 48.0


def _rand_inputs(rng):
    pos = rng.normal(size=3) * 0.5 + np.array([0, 0, 1.0])
    quat = rng.normal(size=4) * np.array([0.1, 0.1, 0.1, 1.0]) + np.array([0, 0, 0, 1.0])
    quat /= np.linalg.norm(quat)
    vel = rng.normal(size=3) * 0.5
    tgt = pos + rng.normal(size=3) * 0.3
    trpy = np.array([0.0, 0.0, rng.normal() * 0.5])
    tvel = rng.normal(size=3) * 0.2
    return pos, quat, vel, tgt, trpy, tvel


def test_sequential_parity_cf2x_cf2p():
    for model in (DroneModel.CF2X, DroneModel.CF2P):
        params = dsl_pid_params(model, dtype=jnp.float64)
        state = dsl_pid_reset(dtype=jnp.float64)
        oracle = DSLPIDOracle(model)
        rng = np.random.default_rng(42)
        for _ in range(200):
            pos, quat, vel, tgt, trpy, tvel = _rand_inputs(rng)
            rpm, state, pos_e, yaw_e = dsl_pid_control(
                params, state, DT, jnp.asarray(pos), jnp.asarray(quat),
                jnp.asarray(vel), jnp.asarray(tgt), jnp.asarray(trpy), jnp.asarray(tvel),
            )
            want_rpm, want_pos_e, want_yaw_e = oracle.compute(
                DT, pos, quat, vel, tgt, trpy, tvel
            )
            np.testing.assert_allclose(np.asarray(rpm), want_rpm, rtol=0, atol=1e-8)
            np.testing.assert_allclose(np.asarray(pos_e), want_pos_e, atol=1e-12)
            np.testing.assert_allclose(float(yaw_e), want_yaw_e, atol=1e-9)
        # Carried state must match the oracle's mutable attributes
        np.testing.assert_allclose(np.asarray(state.integral_pos_e), oracle.integral_pos_e, atol=1e-10)
        np.testing.assert_allclose(np.asarray(state.integral_rpy_e), oracle.integral_rpy_e, atol=1e-8)
        np.testing.assert_allclose(np.asarray(state.last_rpy), oracle.last_rpy, atol=1e-10)


def test_batched_matches_sequential():
    params = dsl_pid_params(DroneModel.CF2X, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    n = 16
    inputs = [_rand_inputs(rng) for _ in range(n)]
    batch = [jnp.asarray(np.stack([inp[i] for inp in inputs])) for i in range(6)]
    state = dsl_pid_reset((n,), dtype=jnp.float64)
    rpm_b, state_b, _, _ = dsl_pid_control(
        params, state, DT, batch[0], batch[1], batch[2], batch[3], batch[4], batch[5]
    )
    for k in range(n):
        s1 = dsl_pid_reset(dtype=jnp.float64)
        rpm1, s1, _, _ = dsl_pid_control(
            params, s1, DT, *[jnp.asarray(v) for v in inputs[k]]
        )
        np.testing.assert_allclose(np.asarray(rpm_b[k]), np.asarray(rpm1), atol=1e-10)


def test_hover_equilibrium():
    """At the target with zero error, commanded RPM ~ hover RPM."""
    from oracle import consts

    c = consts(DroneModel.CF2X)
    params = dsl_pid_params(DroneModel.CF2X, dtype=jnp.float64)
    state = dsl_pid_reset(dtype=jnp.float64)
    pos = jnp.asarray([0.0, 0.0, 1.0])
    quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    rpm, _, _, _ = dsl_pid_control(
        params, state, DT, pos, quat, jnp.zeros(3), pos
    )
    np.testing.assert_allclose(np.asarray(rpm), c["hover_rpm"], rtol=1e-6)


def test_one23d_interface():
    params = dsl_pid_params(DroneModel.CF2X, dtype=jnp.float64)
    t = jnp.asarray([0.07])
    pwm = one23d_interface(params, t)
    assert pwm.shape == (4,)
    want = np.clip(
        (np.sqrt(0.07 / (3.16e-10 * 4)) - 4070.3) / 0.2685, 20000, 65535
    )
    np.testing.assert_allclose(np.asarray(pwm), want, rtol=1e-12)
    pwm2 = one23d_interface(params, jnp.asarray([0.03, 0.04]))
    np.testing.assert_allclose(np.asarray(pwm2)[[0, 1]], np.asarray(pwm2)[[3, 2]])
