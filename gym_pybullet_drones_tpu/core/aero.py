"""Aerodynamic force models: ground effect, drag, downwash.

Behavioral spec: BaseAviary._groundEffect (BaseAviary.py:715-752),
BaseAviary._drag (:754-783), BaseAviary._downwash (:785-811). All terms are
computed as batched tensor ops over the drone axis — the reference's per-drone
Python loops and O(N^2) downwash pair loop become single vectorized expressions,
which is what lets a 4096-drone swarm run as one fused XLA program.

Conventions: positions/velocities are world-frame, `R` is the body->world
rotation matrix, rpm is the (..., 4) motor speed array.
"""

import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.params import DroneParams


def ground_effect_forces(rpm, pos, R, rpy, params: DroneParams):
    """Per-propeller ground-effect thrust increments, body-frame z.

    Returns (..., 4) per-prop force magnitudes (0 when the tilt gate fails).
    Matches BaseAviary.py:732-752: per-prop world heights from forward
    kinematics, clipped at GND_EFF_H_CLIP, gated on |roll|,|pitch| < pi/2.
    """
    # Prop world heights: base z + (R @ offset)_z  (reference reads link states)
    prop_world_z = pos[..., 2:3] + jnp.einsum("...j,pj->...p", R[..., 2, :], params.prop_offsets)
    prop_heights = jnp.clip(prop_world_z, params.gnd_eff_h_clip, jnp.inf)
    gnd_effects = (
        rpm**2 * params.kf * params.gnd_eff_coeff * (params.prop_radius / (4.0 * prop_heights)) ** 2
    )
    gate = (jnp.abs(rpy[..., 0]) < jnp.pi / 2) & (jnp.abs(rpy[..., 1]) < jnp.pi / 2)
    return jnp.where(gate[..., None], gnd_effects, 0.0)


def drag_force_world(rpm, vel, params: DroneParams):
    """World-frame drag force (..., 3).

    The reference computes the drag in the base frame and applies it in
    LINK_FRAME at the COM (BaseAviary.py:771-783); the two rotations cancel, so
    the net world force is simply ``-drag_coeff * sum(2*pi*rpm/60) * vel``.
    """
    omega_sum = jnp.sum(2.0 * jnp.pi * rpm / 60.0, axis=-1, keepdims=True)
    return -params.drag_coeff * omega_sum * vel


def downwash_forces_body_z(pos, params: DroneParams, pos_above=None):
    """Downwash force magnitude along body -z for each drone: (..., N).

    ``pos`` is (..., N, 3). For every ordered pair (i above k) with
    delta_z > 0 and ||delta_xy|| < 10 m the reference adds
    ``-alpha * exp(-0.5 (dxy/beta)^2)`` along the body z axis
    (BaseAviary.py:798-811); contributions sum over i.

    ``pos_above`` optionally supplies a *different* set of source positions
    (..., M, 3) — used for cross-shard downwash where the sources are the
    all-gathered global positions.
    """
    src = pos if pos_above is None else pos_above
    delta = src[..., None, :, :] - pos[..., :, None, :]  # (..., N_k, M_i, 3) src minus self
    delta_z = delta[..., 2]
    delta_xy = jnp.linalg.norm(delta[..., 0:2], axis=-1)
    eps = jnp.asarray(1e-12, dtype=pos.dtype)
    safe_dz = jnp.where(delta_z > 0, delta_z, 1.0)
    alpha = params.dw_coeff_1 * (params.prop_radius / (4.0 * safe_dz)) ** 2
    beta = params.dw_coeff_2 * safe_dz + params.dw_coeff_3
    safe_beta = jnp.where(jnp.abs(beta) > eps, beta, 1.0)
    mag = alpha * jnp.exp(-0.5 * (delta_xy / safe_beta) ** 2)
    mask = (delta_z > 0) & (delta_xy < 10.0)
    return -jnp.sum(jnp.where(mask, mag, 0.0), axis=-1)  # (..., N)
