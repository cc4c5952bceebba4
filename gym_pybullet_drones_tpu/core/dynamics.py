"""Rigid-body quadrotor dynamics as pure JAX step functions.

Two physics pipelines, both semi-implicit Euler at ``1/pyb_freq``:

* ``substep_dyn`` — the reference's explicit closed-form model
  (BaseAviary._dynamics, BaseAviary.py:815-877), reproduced operation-for-
  operation so single-drone trajectories bit-match a float64 oracle. No ground
  contact (the reference never calls stepSimulation in DYN mode).

* ``substep_pyb`` — a closed-form replication of what PyBullet computes for the
  free-flying base under the reference's force pipeline (BaseAviary._physics,
  BaseAviary.py:679-711): per-prop thrusts applied at the prop link offsets
  (hence implicit roll/pitch torques), yaw reaction torque, optional
  ground-effect / drag / downwash terms (BaseAviary.py:349-367), gravity,
  Newton-Euler with gyroscopic coupling, and a plane-contact clamp replacing
  the constraint solver.

State is carried in a ``KinState`` pytree batched over the drone axis; all
functions broadcast over arbitrary leading batch axes (vmap-free batching), so
one jitted call services (num_envs, num_drones) fleets.
"""

import jax
import jax.numpy as jnp
from flax import struct

from gym_pybullet_drones_tpu.core import aero
from gym_pybullet_drones_tpu.core.params import DroneParams
from gym_pybullet_drones_tpu.core.rotations import (
    integrate_quat,
    quat_normalize,
    quat_to_euler_xyz,
    quat_to_matrix,
)
from gym_pybullet_drones_tpu.envs.spec import Physics


@struct.dataclass
class KinState:
    """Kinematic state of a fleet: leaves shaped (..., N, dim).

    ``ang_v`` is the world-frame angular velocity (what the reference reports in
    observations via PyBullet reads, BaseAviary.py:519); ``rpy_rates`` is the
    body-frame rate vector integrated by the DYN pipeline (BaseAviary.py:869).
    """

    pos: jax.Array  # (..., N, 3)
    quat: jax.Array  # (..., N, 4) xyzw
    vel: jax.Array  # (..., N, 3)
    ang_v: jax.Array  # (..., N, 3) world frame
    rpy_rates: jax.Array  # (..., N, 3) body frame


def init_kin_state(init_xyzs, init_quats, dtype=None) -> KinState:
    init_xyzs = jnp.asarray(init_xyzs, dtype=dtype)
    init_quats = jnp.asarray(init_quats, dtype=init_xyzs.dtype)
    # Distinct zeros per leaf: sharing one array would alias three pytree
    # leaves to one device buffer, which trips "donate the same buffer
    # twice" under donate_argnums (the CLAUDE.md zero-leaf aliasing class).
    z = lambda: jnp.zeros_like(init_xyzs)
    return KinState(
        pos=init_xyzs, quat=init_quats, vel=z(), ang_v=z(), rpy_rates=z()
    )


def motor_forces(rpm, params: DroneParams):
    """Per-motor thrusts (..., 4) and net yaw reaction torque (...,).

    BaseAviary.py:693-697: f_i = kf * rpm_i^2; tau_z = -t0 + t1 - t2 + t3 with
    t_i = km * rpm_i^2, sign-flipped for RACE.
    """
    forces = rpm**2 * params.kf
    torques = rpm**2 * params.km * params.yaw_sign
    z_torque = -torques[..., 0] + torques[..., 1] - torques[..., 2] + torques[..., 3]
    return forces, z_torque


def _euler_rotational(torques_body, omega_body, params: DroneParams, dt):
    """Body-frame Newton-Euler rate update (shared by both pipelines)."""
    coupling = jnp.cross(omega_body, jnp.einsum("ij,...j->...i", params.J, omega_body))
    omega_dot = jnp.einsum("ij,...j->...i", params.J_inv, torques_body - coupling)
    return omega_body + dt * omega_dot


def substep_dyn(state: KinState, rpm, params: DroneParams, dt) -> KinState:
    """One explicit-dynamics substep (reference BaseAviary.py:815-877).

    Ordering matters for bit-parity: vel and body rates update first, then pos
    uses the *new* vel and the quaternion integrates the *new* rates
    (semi-implicit Euler); the reported world angular velocity uses the *old*
    rotation matrix (BaseAviary.py:871-875).
    """
    R = quat_to_matrix(state.quat)
    forces, z_torque = motor_forces(rpm, params)
    thrust_body_z = jnp.sum(forces, axis=-1)
    thrust_world = R[..., :, 2] * thrust_body_z[..., None]
    accel = thrust_world / params.m - jnp.stack(
        [jnp.zeros_like(thrust_body_z), jnp.zeros_like(thrust_body_z),
         jnp.full_like(thrust_body_z, params.g)], -1
    )
    xy_torque = jnp.einsum("mp,...p->...m", params.dyn_xy_mix, forces)
    torques = jnp.concatenate([xy_torque, z_torque[..., None]], -1)
    new_rates = _euler_rotational(torques, state.rpy_rates, params, dt)
    new_vel = state.vel + dt * accel
    new_pos = state.pos + dt * new_vel
    new_quat = integrate_quat(state.quat, new_rates, dt)
    ang_v_world = jnp.einsum("...ij,...j->...i", R, new_rates)
    return KinState(pos=new_pos, quat=new_quat, vel=new_vel, ang_v=ang_v_world,
                    rpy_rates=new_rates)


def substep_pyb(
    state: KinState,
    rpm,
    last_rpm,
    params: DroneParams,
    dt,
    *,
    gnd: bool = False,
    drag: bool = False,
    dw: bool = False,
    contact: bool = True,
    contact_mode: str = "clamp",
    renormalize_quat: bool = True,
    dw_src_pos=None,
    dw_force_body_z=None,
    collide: bool = False,
    obstacles=None,
    pair_candidates=None,
) -> KinState:
    """One PyBullet-compatible substep with optional aero terms.

    Force/torque assembly follows the reference's applyExternalForce/Torque
    pipeline (BaseAviary.py:349-367): thrust and ground effect act at the prop
    offsets (producing roll/pitch torques), drag (computed from the *previous*
    substep's action, BaseAviary.py:359) and downwash act at the COM. PyBullet's
    constraint-solver ground contact is approximated by a plane clamp at the
    collision-cylinder bottom.
    """
    R = quat_to_matrix(state.quat)
    rpy = quat_to_euler_xyz(state.quat)
    forces, z_torque = motor_forces(rpm, params)  # (..., 4), (...,)

    prop_forces = forces
    if gnd:
        prop_forces = prop_forces + aero.ground_effect_forces(rpm, state.pos, R, rpy, params)

    # Body-frame torques from per-prop z-forces at offsets: r x [0,0,f]
    offs = params.prop_offsets  # (4, 3)
    tau_x = jnp.einsum("...p,p->...", prop_forces, offs[:, 1])
    tau_y = -jnp.einsum("...p,p->...", prop_forces, offs[:, 0])
    torques_body = jnp.stack([tau_x, tau_y, z_torque], -1)

    thrust_body_z = jnp.sum(prop_forces, axis=-1)
    force_world = R[..., :, 2] * thrust_body_z[..., None]
    if drag:
        force_world = force_world + aero.drag_force_world(last_rpm, state.vel, params)
    if dw:
        # ``dw_src_pos`` supplies external wake sources — e.g. the
        # all-gathered global positions when the drone axis is sharded over a
        # mesh (runtime/swarm.py); default: the local fleet itself.
        dw_mag = aero.downwash_forces_body_z(state.pos, params,
                                             pos_above=dw_src_pos)  # (..., N)
        force_world = force_world + R[..., :, 2] * dw_mag[..., None]
    if dw_force_body_z is not None:
        # Externally-computed wake magnitude (the tiled Pallas pair kernels,
        # runtime/swarm.py / ops/swarm_soa.py) enters the force assembly
        # exactly like the dense dw term above — same accel, and the same
        # accel_z sign in the resting-contact `pressed` test below.
        force_world = force_world + R[..., :, 2] * dw_force_body_z[..., None]

    accel = force_world / params.m
    accel = accel.at[..., 2].add(-params.g)
    new_vel = state.vel + dt * accel

    # Rotational update in the body frame, then back to world (PyBullet stores
    # world angular velocity; R is constant within the substep so this matches).
    omega_body = jnp.einsum("...ji,...j->...i", R, state.ang_v)  # R^T w
    new_omega_body = _euler_rotational(torques_body, omega_body, params, dt)
    new_ang_v = jnp.einsum("...ij,...j->...i", R, new_omega_body)

    if contact and contact_mode == "impulse":
        # Bullet-faithful sequential-impulse pass (core/contact.py): contacts
        # detected on the PRE-integration pose, impulses applied to the
        # force-integrated velocities, positions integrated afterwards —
        # btDiscreteDynamicsWorld's exact phase order. Plane, drone-drone and
        # obstacle rows all live inside the solver here, so the clamp and the
        # Jacobi projection below are both skipped.
        from gym_pybullet_drones_tpu.core.contact import solve_contacts

        new_vel, new_ang_v = solve_contacts(
            state.pos, state.quat, new_vel, new_ang_v, params, dt,
            drone_drone=collide, obstacles=obstacles,
            pair_candidates=pair_candidates)
        new_omega_body = jnp.einsum("...ji,...j->...i", R, new_ang_v)
        new_pos = state.pos + dt * new_vel
        new_quat = integrate_quat(state.quat, new_omega_body, dt)
        if renormalize_quat:
            new_quat = quat_normalize(new_quat)
        new_rpy_rates = jnp.einsum(
            "...ji,...j->...i", quat_to_matrix(new_quat), new_ang_v)
        return KinState(pos=new_pos, quat=new_quat, vel=new_vel,
                        ang_v=new_ang_v, rpy_rates=new_rpy_rates)

    new_pos = state.pos + dt * new_vel
    # PyBullet integrates orientation with the world angular velocity
    # (exponential map); equivalent to body-rate integration of R^T w'.
    new_quat = integrate_quat(state.quat, new_omega_body, dt)
    if renormalize_quat:
        new_quat = quat_normalize(new_quat)

    if contact:
        z_min = params.collision_h / 2.0 - params.collision_z_offset
        below = new_pos[..., 2] < z_min
        new_pos = new_pos.at[..., 2].set(jnp.where(below, z_min, new_pos[..., 2]))
        new_vel = new_vel.at[..., 2].set(
            jnp.where(below, jnp.maximum(new_vel[..., 2], 0.0), new_vel[..., 2])
        )
        # Resting contact: friction kills residual spin when pressed into the plane.
        pressed = below & (accel[..., 2] <= 0.0)
        new_ang_v = jnp.where(pressed[..., None], 0.0, new_ang_v)

    if collide or obstacles is not None:
        # Drone-drone / drone-obstacle contact (Bullet resolves these inside
        # stepSimulation; here a Jacobi projection pass, core/collisions.py).
        from gym_pybullet_drones_tpu.core.collisions import resolve_collisions

        new_pos, new_vel = resolve_collisions(
            new_pos, new_vel, params.collision_r, obstacles,
            drone_drone=collide)

    new_rpy_rates = jnp.einsum("...ji,...j->...i", quat_to_matrix(new_quat), new_ang_v)
    return KinState(pos=new_pos, quat=new_quat, vel=new_vel, ang_v=new_ang_v,
                    rpy_rates=new_rpy_rates)


_PYB_FLAGS = {
    Physics.PYB: dict(gnd=False, drag=False, dw=False),
    Physics.PYB_GND: dict(gnd=True, drag=False, dw=False),
    Physics.PYB_DRAG: dict(gnd=False, drag=True, dw=False),
    Physics.PYB_DW: dict(gnd=False, drag=False, dw=True),
    Physics.PYB_GND_DRAG_DW: dict(gnd=True, drag=True, dw=True),
}


def step_physics(
    state: KinState,
    rpm,
    last_rpm,
    params: DroneParams,
    dt,
    n_substeps: int,
    physics: Physics,
    *,
    renormalize_quat: bool = True,
    collisions: bool = False,
    obstacles=None,
    contact_mode: str = "clamp",
) -> tuple[KinState, jax.Array]:
    """Advance ``n_substeps`` physics substeps under one control action.

    Mirrors the substep loop of BaseAviary.step (BaseAviary.py:343-372): the
    drag term of the first substep uses the previous control period's action
    (``last_rpm``); subsequent substeps use the current one. Returns the new
    state and the action to be carried as ``last_rpm`` next period.

    ``physics`` and ``n_substeps`` are static (trace-time) arguments; the
    substep loop is unrolled for XLA fusion (n is 1-8 in practice).
    """
    if physics == Physics.DYN:
        # DYN mode never runs Bullet's world step in the reference
        # (BaseAviary._dynamics bypasses stepSimulation), so no contact there.
        for _ in range(n_substeps):
            state = substep_dyn(state, rpm, params, dt)
            if renormalize_quat:
                state = state.replace(quat=quat_normalize(state.quat))
        return state, rpm
    flags = _PYB_FLAGS[physics]
    collide = collisions and state.pos.shape[-2] > 1
    # Neighbor pair candidates persist across the control period's substeps
    # (core/contact.build_pair_candidates): the O(N^2) top-k was the
    # dominant impulse-mode cost when rebuilt per substep; indices from the
    # pre-period pose stay valid inside the 5 cm selection margin while all
    # row-level quantities recompute fresh every substep.
    pair_candidates = None
    if (contact_mode == "impulse" and collide and state.pos.ndim == 2
            and state.pos.shape[0] > 16):
        from gym_pybullet_drones_tpu.core.contact import (
            NBR_MAX_N,
            PAIR_GS_MAX_N,
            build_pair_candidates,
            build_pair_candidates_binned,
        )

        # Dense N^2 top-k up to NBR_MAX_N; beyond it the spatial-hash-grid
        # builder supplies the same rows in O(N*k) (the dense distance
        # matrix is 17 GB at 65k), so Bullet-grade neighbor GS runs at any
        # local fleet size — only cross-shard/env-batched fleets still take
        # the Jacobi pass inside solve_contacts.
        if PAIR_GS_MAX_N < state.pos.shape[0]:
            build = (build_pair_candidates
                     if state.pos.shape[0] <= NBR_MAX_N
                     else build_pair_candidates_binned)
            pair_candidates = build(state.pos, params.collision_r)
    for _ in range(n_substeps):
        state = substep_pyb(
            state, rpm, last_rpm, params, dt,
            renormalize_quat=renormalize_quat, collide=collide,
            obstacles=obstacles, contact_mode=contact_mode,
            pair_candidates=pair_candidates, **flags,
        )
        last_rpm = rpm
    return state, rpm


def state_rpy(state: KinState):
    """Euler angles (roll, pitch, yaw) as the reference reports them."""
    return quat_to_euler_xyz(state.quat)
