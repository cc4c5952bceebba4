"""Oracle-independent analytic anchors for the physics core (VERDICT r4 #5).

Every other fidelity test traces to tests/oracle.py — a same-author float64
NumPy twin. These anchors assert CLOSED FORMS that no oracle import can
contaminate: exact solutions of the discrete semi-implicit-Euler map itself
(bit-tight), the exact continuous symmetric-top solution (with a first-order
convergence check), and energy accounting of both contact modes. Constants
cite the reference model they anchor (/root/reference/gym_pybullet_drones/
envs/BaseAviary.py:679-711 force pipeline, :815-892 DYN model, URDF
coefficients per SURVEY §5).

All tests run float64 on CPU (conftest) with the core entry points only —
no tests/oracle.py import anywhere in this file.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.dynamics import (
    KinState,
    init_kin_state,
    substep_dyn,
    substep_pyb,
)
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.core.rotations import quat_to_matrix
from gym_pybullet_drones_tpu.envs.spec import DroneModel

DT = 1.0 / 240.0


def _single(pos, vel=(0.0, 0.0, 0.0), ang_v=(0.0, 0.0, 0.0)):
    s = init_kin_state(jnp.asarray([pos], jnp.float64),
                       jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float64))
    return s.replace(vel=jnp.asarray([vel], jnp.float64),
                     ang_v=jnp.asarray([ang_v], jnp.float64),
                     rpy_rates=jnp.asarray([ang_v], jnp.float64))


@pytest.mark.parametrize("model", [DroneModel.CF2X, DroneModel.RACE])
def test_ballistic_arc_exact_discrete_closed_form(model):
    """Zero-RPM free flight == the exact closed form of the semi-implicit
    Euler map: v_n = v0 - n g dt e_z, p_n = p0 + n dt v0 - g dt^2 n(n+1)/2 e_z
    (free-body integration of BaseAviary.py:679-711 with no applied force).
    Bit-tight in float64 — any error in force assembly, integrator order, or
    gravity constant breaks this at 1e-12."""
    params = drone_params(model, dtype=jnp.float64)
    rpm = jnp.zeros((1, 4), jnp.float64)
    v0 = np.array([0.3, -0.2, 0.5])
    p0 = np.array([0.0, 0.0, 50.0])
    for substep, kwargs in ((substep_pyb, dict(contact=False)), (substep_dyn, {})):
        s = _single(p0, v0)
        n = 240
        for _ in range(n):
            if substep is substep_pyb:
                s = substep(s, rpm, rpm, params, DT, **kwargs)
            else:
                s = substep(s, rpm, params, DT)
        g = float(params.g)
        v_exact = v0 - np.array([0, 0, 1.0]) * g * n * DT
        p_exact = (p0 + n * DT * v0
                   - np.array([0, 0, 1.0]) * g * DT * DT * n * (n + 1) / 2.0)
        np.testing.assert_allclose(np.asarray(s.vel)[0], v_exact, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s.pos)[0], p_exact, rtol=1e-12,
                                   atol=1e-12)


def test_torque_free_symmetric_top_precession():
    """Torque-free rotation of the CF2X body (J = diag(Jx, Jx, Jz), the
    symmetric top of cf2x.urdf:11-12) vs the EXACT continuous solution:
    omega_z is constant and omega_xy rotates at lambda = omega_z (Jx-Jz)/Jx;
    in complex form w(t) = w(0) exp(-i lambda t). The explicit-Euler body
    update is first-order, so the anchor asserts (a) a small absolute error
    at 240 Hz, (b) ~4x error reduction at 4x the rate (first-order
    convergence — an oracle-free check that the integrator solves THIS ODE),
    and (c) bit-exact conservation of omega_z (Jx == Jy makes its discrete
    update identically zero)."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    J = np.asarray(params.J).diagonal()
    assert J[0] == J[1] != J[2]
    rpm = jnp.zeros((1, 4), jnp.float64)
    w0 = np.array([1.0, 0.0, 4.0])
    lam = w0[2] * (J[0] - J[2]) / J[0]
    t_end = 1.0

    def run(hz):
        dt = 1.0 / hz
        s = _single((0, 0, 50.0), ang_v=w0)
        for _ in range(int(round(t_end * hz))):
            s = substep_pyb(s, rpm, rpm, params, dt, contact=False)
        R = np.asarray(quat_to_matrix(s.quat))[0]
        return R.T @ np.asarray(s.ang_v)[0]  # body rates

    w_exact = (w0[0] + 1j * w0[1]) * np.exp(-1j * lam * t_end)
    errs = {}
    for hz in (240, 960):
        wb = run(hz)
        errs[hz] = abs((wb[0] + 1j * wb[1]) - w_exact)
        assert abs(wb[2] - w0[2]) < 1e-10, "omega_z must be conserved"
    assert errs[240] < 0.03, errs
    ratio = errs[240] / errs[960]
    assert 2.5 < ratio < 6.0, f"not first-order convergent: {errs}"


def test_terminal_velocity_exact_discrete_closed_form():
    """Vertical descent under the rpm-proportional linear drag
    (BaseAviary._drag, :754-783: F = -drag_coeff * sum(2 pi rpm / 60) * v)
    with sub-hover equal RPMs. The discrete map is the affine recurrence
    v_{n+1} = rho v_n + dt (T/m - g) with rho = 1 - dt kd w_sum / m, whose
    closed form v_n = v* + (v0 - v*) rho^n and terminal velocity
    v* = (T - m g) / (kd w_sum) the sim must hit bit-tight. Position follows
    the geometric-sum closed form."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    r = 10000.0
    rpm = jnp.full((1, 4), r, jnp.float64)
    kd = float(np.asarray(params.drag_coeff)[2])
    w_sum = 4.0 * 2.0 * np.pi * r / 60.0
    T = 4.0 * float(params.kf) * r * r
    m, g = float(params.m), float(params.g)
    v_star = (T - m * g) / (kd * w_sum)
    assert v_star < 0.0  # sub-hover: descending terminal velocity
    rho = 1.0 - DT * kd * w_sum / m

    s = _single((0.0, 0.0, 1000.0))
    n = 240
    for _ in range(n):
        s = substep_pyb(s, rpm, rpm, params, DT, drag=True, contact=False)
    v_exact = v_star + (0.0 - v_star) * rho**n
    # p_n = p0 + dt sum_{k=1..n} v_k, v_k = v* + (v0-v*) rho^k
    p_exact = 1000.0 + n * DT * v_star + DT * (0.0 - v_star) * (
        rho * (1.0 - rho**n) / (1.0 - rho))
    np.testing.assert_allclose(float(s.vel[0, 2]), v_exact, rtol=1e-12)
    np.testing.assert_allclose(float(s.pos[0, 2]), p_exact, rtol=1e-12)
    # x, y and attitude untouched to round-off (equal RPMs: zero net torque;
    # the einsum torque reductions leave ~1e-15 of non-cancellation)
    assert float(jnp.abs(s.vel[0, :2]).max()) == 0.0
    assert float(jnp.abs(s.ang_v).max()) < 1e-12


def test_ground_effect_equilibrium_is_discrete_fixed_point():
    """Static ground-effect equilibrium (BaseAviary._groundEffect,
    :715-752): level flight at equal sub-hover RPMs r has the closed-form
    equilibrium height z* = (pr/4) sqrt(g_c / (m g / (4 kf r^2) - 1)) where
    total lift 4 kf r^2 (1 + g_c (pr / 4 z)^2) equals weight. z* is an EXACT
    fixed point of the discrete map (zero accel => zero velocity update =>
    zero position update), so starting there the sim must not move at all;
    a 2 mm upward perturbation must oscillate bounded around z* (the
    rpm-linear drag damps it only slowly — light damping is the physics,
    not a bug)."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    m, g, kf = float(params.m), float(params.g), float(params.kf)
    g_c, pr = float(params.gnd_eff_coeff), float(params.prop_radius)
    r = 13760.0
    denom = m * g / (4.0 * kf * r * r) - 1.0
    assert denom > 0.0
    z_star = (pr / 4.0) * np.sqrt(g_c / denom)
    assert z_star > float(params.gnd_eff_h_clip)  # clip-free regime
    rpm = jnp.full((1, 4), r, jnp.float64)

    s = _single((0.0, 0.0, z_star))
    for _ in range(500):
        s = substep_pyb(s, rpm, rpm, params, DT, gnd=True, drag=True)
    np.testing.assert_allclose(float(s.pos[0, 2]), z_star, rtol=1e-12)
    assert float(jnp.abs(s.vel).max()) < 1e-12

    s = _single((0.0, 0.0, z_star + 0.002))
    zs = []
    for _ in range(2400):  # 10 s
        s = substep_pyb(s, rpm, rpm, params, DT, gnd=True, drag=True)
        zs.append(float(s.pos[0, 2]))
    zs = np.asarray(zs)
    assert np.abs(zs - z_star).max() < 0.004  # bounded oscillation
    assert abs(zs[-2400 // 2:].mean() - z_star) < 2e-4  # centered on z*


@pytest.mark.parametrize("contact_mode", ["clamp", "impulse"])
def test_resting_contact_energy_accounting(contact_mode):
    """A motors-off drone dropped onto the plane: total mechanical energy
    E = m g z + 1/2 m |v|^2 + 1/2 w.Jw must never increase (semi-implicit
    Euler dissipates exactly 1/2 m g^2 dt^2 per free-fall step; both contact
    models are inelastic), and the final state is at rest on the plane at
    the collision-cylinder bottom z_min = collision_h/2 - offset
    (cf2x.urdf:31-36). Anchors clamp AND the Bullet-faithful impulse solver
    with the same closed-form ledger."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    m, g = float(params.m), float(params.g)
    J = np.asarray(params.J)
    z_min = float(params.collision_h) / 2.0 - float(params.collision_z_offset)
    rpm = jnp.zeros((1, 4), jnp.float64)

    s = _single((0.0, 0.0, 0.5))

    def energy(s):
        z = float(s.pos[0, 2])
        v2 = float(jnp.sum(s.vel[0] ** 2))
        w = np.asarray(s.ang_v)[0]
        return m * g * (z - z_min) + 0.5 * m * v2 + 0.5 * w @ J @ w

    # clamp is exactly dissipative; the impulse solver holds resting contact
    # with ~1e-9-scale velocity jitter around its penetration slop (Bullet
    # rests bodies slightly interpenetrated too) — bound it, don't forbid it.
    tol = 1e-12 if contact_mode == "clamp" else 1e-8
    e0 = energy(s)
    e_prev = e0
    for _ in range(240):
        s = substep_pyb(s, rpm, rpm, params, DT, contact=True,
                        contact_mode=contact_mode)
        e = energy(s)
        assert e <= e_prev + tol, (contact_mode, e, e_prev)
        e_prev = e
    # All mechanical energy dissipated: final E is at most zero (clamp rests
    # exactly at z_min) or the mm-scale NEGATIVE potential of the impulse
    # solver's penetration slop (it rests ~1 mm interpenetrated, as Bullet
    # does) — never a residual positive energy.
    assert -2e-3 * 9.8 * 0.027 < e_prev < 1e-12, e_prev

    assert abs(float(s.pos[0, 2]) - z_min) < 2e-3, contact_mode
    assert float(jnp.abs(s.vel).max()) < 1e-6, contact_mode
    assert float(jnp.abs(s.ang_v).max()) < 1e-6, contact_mode


def test_constant_rate_spin_exact_quaternion():
    """Principal-axis spin: zero torque and body rate (0, 0, w) keep the
    rate constant (the gyroscopic coupling w x Jw vanishes), and the
    axis-angle quaternion update (BaseAviary._integrateQ, :879-892) is EXACT
    for constant rate — after n substeps the attitude is the closed-form
    rotation about z by w n dt, to float64 round-off. Anchors integrate_quat
    against math, not the oracle, in both pipelines."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    rpm = jnp.zeros((1, 4), jnp.float64)
    w = 3.0
    n = 240
    for pipeline in ("dyn", "pyb"):
        s = _single((0, 0, 50.0), ang_v=(0.0, 0.0, w))
        for _ in range(n):
            if pipeline == "dyn":
                s = substep_dyn(s, rpm, params, DT)
            else:
                s = substep_pyb(s, rpm, rpm, params, DT, contact=False)
        theta = w * n * DT
        q_exact = np.array([0.0, 0.0, np.sin(theta / 2), np.cos(theta / 2)])
        q = np.asarray(s.quat)[0]
        q = q if q[3] * q_exact[3] >= 0 else -q
        np.testing.assert_allclose(q, q_exact, atol=1e-10), pipeline
        np.testing.assert_allclose(np.asarray(s.ang_v)[0], [0, 0, w],
                                   atol=1e-12)
