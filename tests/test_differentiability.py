"""End-to-end differentiability of the physics pipeline (beyond-reference).

The reference's PyBullet engine is a black box — no gradients. Here the whole
step is pure JAX, so `jax.grad` flows through dynamics, aero terms and the
contact models, enabling gradient-based trajectory optimization and system
identification (the capability class of differentiable simulators like
Crazyflow/DiffAero). These tests pin that property so refactors cannot
silently break it (e.g. by introducing non-differentiable host callbacks).
"""

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.dynamics import init_kin_state, step_physics
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics


def _rollout_z(rpm_scalar, params, physics, steps=24, contact_mode="clamp"):
    """Final altitude after `steps` control periods at a constant RPM."""
    kin = init_kin_state(jnp.asarray([[0.0, 0.0, 0.5]]),
                         jnp.asarray([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.full((1, 4), rpm_scalar)

    def body(carry, _):
        kin, last = carry
        kin, last = step_physics(kin, rpm, last, params, 1 / 240, 5, physics,
                                 contact_mode=contact_mode)
        return (kin, last), None

    (kin, _), _ = jax.lax.scan(body, (kin, rpm), None, length=steps)
    return kin.pos[0, 2]


def test_grad_through_physics_matches_finite_difference():
    """d(final z)/d(rpm) through 120 substeps of PYB physics matches central
    finite differences to 1e-3 relative."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    hover = float(params.hover_rpm)
    f = lambda r: _rollout_z(r, params, Physics.PYB)
    g = jax.grad(f)(jnp.float64(hover))
    eps = 1e-3
    fd = (f(jnp.float64(hover + eps)) - f(jnp.float64(hover - eps))) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


def test_gradients_flow_through_both_physics_and_contact_modes():
    """Gradients are finite and non-zero through DYN, PYB+clamp and
    PYB+impulse (the sequential-impulse solver is a fori/scan pipeline of
    smooth clamps — differentiable almost everywhere)."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    hover = float(params.hover_rpm)
    for physics, mode in ((Physics.DYN, "clamp"), (Physics.PYB, "clamp"),
                          (Physics.PYB, "impulse")):
        g = jax.grad(lambda r: _rollout_z(r, params, physics,
                                          contact_mode=mode))(
            jnp.float64(0.99 * hover))
        assert np.isfinite(float(g)) and abs(float(g)) > 0.0, (physics, mode)


def test_gradient_trajectory_optimization_converges():
    """Gradient descent on an open-loop RPM schedule reaches a target
    altitude — the differentiable-simulator use case end to end."""
    import optax

    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    hover = float(params.hover_rpm)
    target_z = 1.0
    steps = 24  # 0.5 s at 48 Hz

    def loss(rpm_sched):  # (steps,) RPM offsets around hover
        kin = init_kin_state(jnp.asarray([[0.0, 0.0, 0.5]]),
                             jnp.asarray([[0.0, 0.0, 0.0, 1.0]]))
        last = jnp.full((1, 4), hover)

        def body(carry, r):
            kin, last = carry
            rpm = jnp.full((1, 4), hover + r)
            kin, last = step_physics(kin, rpm, last, params, 1 / 240, 5,
                                     Physics.PYB)
            return (kin, last), kin.vel[0, 2]

        (kin, _), vzs = jax.lax.scan(body, (kin, last), rpm_sched)
        return (kin.pos[0, 2] - target_z) ** 2 + 1e-4 * jnp.sum(vzs**2)

    sched = jnp.zeros(steps, jnp.float64)
    opt = optax.adam(200.0)  # RPM-scale steps
    state = opt.init(sched)
    step = jax.jit(lambda s, st: (lambda g: opt.update(g, st, s))(
        jax.grad(loss)(s)))
    l0 = float(loss(sched))
    for _ in range(100):
        updates, state = step(sched, state)
        sched = optax.apply_updates(sched, updates)
    l1 = float(loss(sched))
    assert l1 < 0.02 * l0, (l0, l1)  # >=50x loss reduction
