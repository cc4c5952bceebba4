"""Drone-drone and drone-obstacle contact as pure, batched tensor ops.

The reference gets collision handling for free from Bullet's sequential-impulse
LCP solver (world loaded at BaseAviary.py:484-505; the four RL landmarks are
*physical* bodies, BaseRLAviary._addObstacles :99-128). This module is the
TPU-native replacement: a **simultaneous (Jacobi) projection** contact model
resolved inside the fused physics substep —

  * drones are collision spheres of radius ``collision_r`` (the reference
    URDF's collision cylinder radius, cf2x.urdf:31-36 — the sphere
    circumscribes the cylinder footprint, the conservative choice for a
    quadrotor's prop disc);
  * obstacles are static spheres (positions from BaseRLAviary.py:108-126 at
    z=0.1; radii matched to the ray-cast landmarks in render/camera.py so the
    physical and visual worlds agree);
  * contacts are inelastic (restitution 0, Bullet's URDF default) and
    frictionless in the tangent plane.

Per overlapping pair the resolve (i) separates the bodies along the contact
normal (drones split the penetration; static obstacles push the drone out
fully) and (ii) removes the *approaching* relative normal velocity (equal-mass
split for drone pairs).

Deviation from Bullet (see docs/PYB_DERIVATION.md §5 for the framework): the
Jacobi projection resolves all pairs simultaneously once per substep, where
Bullet iterates impulses sequentially until convergence. For isolated binary
contacts the two are identical to round-off. For contact *chains* (3+ mutually
touching spheres) one Jacobi pass under-corrects; the 240 Hz substep rate
supplies the missing iterations, bounding residual penetration by one
substep's relative travel (|v_rel|·dt ≈ 2 mm at 0.5 m/s). Positional pushout
is capped at ``max_push`` per substep (Bullet's Baumgarte `erp` plays the same
role) to keep deep-overlap spawns from exploding.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ObstacleSet:
    """Static collision bodies: sphere/box union, all shaped (M, ...).

    ``half`` carries per-obstacle axis-aligned box half-extents; a zero row
    degenerates the box to a point, making the closest-point formula reduce
    EXACTLY to the sphere case (distance to center minus ``radius``) — one
    branch-free code path covers both kinds, and ``radius`` doubles as the
    rounding radius of a box (0 for the sharp RL boxes)."""

    pos: jax.Array
    radius: jax.Array
    # (M, 3) box half-extents; zeros = sphere of ``radius``. None (the
    # default, for pre-round-3 constructors) means all-spheres.
    half: Optional[jax.Array] = None


# The four RL landmarks (BaseRLAviary.py:108-126). block.urdf and
# cube_small.urdf are literal boxes in pybullet_data; duck/teddy stay sphere
# stand-ins for their meshes. SINGLE source of truth for landmark geometry:
# render/camera.py imports these tables, so the physical and visual worlds
# agree by construction (box half-extents are best-known pybullet_data
# values; the engine-goldens CI job is the calibration path).
_RL_OBSTACLE_POS = np.array([
    [1.0, 0.0, 0.1], [0.0, 1.0, 0.1], [-1.0, 0.0, 0.1], [0.0, -1.0, 0.1],
])
_RL_OBSTACLE_R = np.array([0.0, 0.0, 0.12, 0.15])
_RL_OBSTACLE_HALF = np.array([
    [0.025, 0.075, 0.025], [0.025, 0.025, 0.025],
    [0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
])


def rl_obstacles(dtype=jnp.float32) -> ObstacleSet:
    return ObstacleSet(
        pos=jnp.asarray(_RL_OBSTACLE_POS, dtype=dtype),
        radius=jnp.asarray(_RL_OBSTACLE_R, dtype=dtype),
        half=jnp.asarray(_RL_OBSTACLE_HALF, dtype=dtype),
    )


# BaseAviary's OWN obstacle scene (BaseAviary._addObstacles, :958-981):
# samurai.urdf + duck_vhacd at [-.5,-.5,.05] + cube_no_rotation (a 1 m box,
# base on the ground) at [-.5,-2.5,.5] + sphere2 (r=0.5) at [0,2,.5]. Dead
# code in every reference task/example (only reachable via obstacles=True on
# a non-RL env), replicated round 4 for drop-in completeness: duck as its
# 0.12 m sphere (the mesh renders, render/camera.py), cube and sphere as
# exact analytic bodies, and the samurai backdrop as a stylized three-box
# gate stand-in (decorative; the reference mesh's truth is engine-CI
# territory like the other pybullet_data dimensions).
_BASE_OBSTACLE_POS = np.array([
    [-0.5, -0.5, 0.08],    # duck
    [-0.5, -2.5, 0.5],     # cube_no_rotation
    [0.0, 2.0, 0.5],       # sphere2
    [-1.5, -4.0, 1.0],     # samurai gate: left pillar
    [1.5, -4.0, 1.0],      # samurai gate: right pillar
    [0.0, -4.0, 2.15],     # samurai gate: lintel
])
_BASE_OBSTACLE_R = np.array([0.12, 0.0, 0.5, 0.0, 0.0, 0.0])
_BASE_OBSTACLE_HALF = np.array([
    [0.0, 0.0, 0.0],
    [0.5, 0.5, 0.5],
    [0.0, 0.0, 0.0],
    [0.2, 0.2, 1.0],
    [0.2, 0.2, 1.0],
    [1.9, 0.25, 0.15],
])


def base_obstacles(dtype=jnp.float32) -> ObstacleSet:
    """The BaseAviary obstacle world as static analytic bodies."""
    return ObstacleSet(
        pos=jnp.asarray(_BASE_OBSTACLE_POS, dtype=dtype),
        radius=jnp.asarray(_BASE_OBSTACLE_R, dtype=dtype),
        half=jnp.asarray(_BASE_OBSTACLE_HALF, dtype=dtype),
    )


def obstacle_closest_point(pos, obstacles: ObstacleSet):
    """Closest point on each obstacle's core shape to each drone center.

    pos: (..., N, 3) -> (..., N, M, 3). For boxes this is the clamped point
    on/inside the box; for spheres (half = 0) it degenerates to the center,
    so downstream 'distance minus radius' math is the sphere formula."""
    c = obstacles.pos  # (M, 3)
    if obstacles.half is None:  # all-spheres set
        return jnp.broadcast_to(c, pos.shape[:-1] + c.shape)
    lo = c - obstacles.half
    hi = c + obstacles.half
    return jnp.clip(pos[..., :, None, :], lo, hi)


def obstacle_delta(pos, obstacles: ObstacleSet):
    """Contact delta from each obstacle toward each drone center plus the
    center-inside-core mask: ((..., N, M, 3), (..., N, M)).

    Normally ``pos - closest_point`` (zero half-extents degenerate to the
    sphere formula). A drone center INSIDE a box core would give a zero
    delta — and thus a zero contact normal, silently disabling pushout
    (possible for >~14 m/s crossings of the 6 cm shell in one 1/240 s
    substep, or spawns inside a landmark); those points fall back to the
    direction from the box CENTER for the normal, and the ``inside`` mask
    lets consumers treat the separation as fully penetrating (distance 0)
    rather than measuring the center-to-center distance."""
    delta = pos[..., :, None, :] - obstacle_closest_point(pos, obstacles)
    inside = jnp.sum(delta * delta, axis=-1, keepdims=True) < 1e-18
    delta_fb = pos[..., :, None, :] - obstacles.pos
    return jnp.where(inside, delta_fb, delta), inside[..., 0]


def resolve_drone_collisions(pos, vel, radius, *, max_push=0.01,
                             other_pos=None, other_vel=None):
    """One Jacobi contact-projection pass over all drone pairs.

    pos, vel: (..., N, 3); radius: scalar collision-sphere radius.
    Returns corrected (pos, vel).

    ``other_pos``/``other_vel`` optionally supply a *different* source set
    (..., M, 3) — used by the sharded swarm path where the partners are the
    all-gathered global fleet; the self-pair is masked by zero-distance.
    """
    src_pos = pos if other_pos is None else other_pos
    src_vel = vel if other_vel is None else other_vel
    delta = pos[..., :, None, :] - src_pos[..., None, :, :]  # (..., N, M, 3)
    dist = jnp.linalg.norm(delta, axis=-1)  # (..., N, M)
    min_dist = 2.0 * radius
    # Mask: true contact pairs (exclude self / coincident partners).
    eps = jnp.asarray(1e-9, dtype=pos.dtype)
    overlap = jnp.where((dist < min_dist) & (dist > eps), min_dist - dist, 0.0)
    safe_dist = jnp.maximum(dist, eps)
    normal = delta / safe_dist[..., None]  # points from partner j toward i

    # (i) positional separation: each drone of the pair takes half the
    # penetration; per-substep pushout capped (Baumgarte-style).
    push = jnp.minimum(0.5 * overlap, max_push)
    pos_corr = jnp.sum(push[..., None] * normal, axis=-2)

    # (ii) inelastic normal impulse: remove the approaching half of the
    # relative normal velocity (equal masses -> each corrects half).
    v_rel = vel[..., :, None, :] - src_vel[..., None, :, :]
    vn = jnp.sum(v_rel * normal, axis=-1)  # < 0 when approaching
    approaching = jnp.where((overlap > 0.0) & (vn < 0.0), vn, 0.0)
    vel_corr = jnp.sum((-0.5 * approaching)[..., None] * normal, axis=-2)

    return pos + pos_corr, vel + vel_corr


def resolve_obstacle_collisions(pos, vel, radius, obstacles: ObstacleSet, *,
                                max_push=0.01):
    """Drone spheres vs static obstacles (boxes and spheres): full pushout,
    normal-velocity kill (infinite obstacle mass). pos, vel: (..., N, 3).

    Contact is sphere-vs-rounded-box: the delta runs from the closest point
    on the box core to the drone center (center-inside-box fallback in
    obstacle_delta); zero half-extents degenerate to the sphere-vs-sphere
    formula exactly."""
    delta, inside = obstacle_delta(pos, obstacles)
    raw_dist = jnp.linalg.norm(delta, axis=-1)  # fallback delta: nonzero
    dist = jnp.where(inside, 0.0, raw_dist)  # inside the core: full overlap
    min_dist = radius + obstacles.radius  # (M,) broadcast over (..., N, M)
    eps = jnp.asarray(1e-9, dtype=pos.dtype)
    overlap = jnp.where(inside | ((dist < min_dist) & (dist > eps)),
                        min_dist - dist, 0.0)
    safe_dist = jnp.maximum(raw_dist, eps)
    normal = delta / safe_dist[..., None]  # away from obstacle center

    push = jnp.minimum(overlap, max_push)
    pos_corr = jnp.sum(push[..., None] * normal, axis=-2)

    vn = jnp.sum(vel[..., :, None, :] * normal, axis=-1)
    approaching = jnp.where((overlap > 0.0) & (vn < 0.0), vn, 0.0)
    vel_corr = jnp.sum((-approaching)[..., None] * normal, axis=-2)

    return pos + pos_corr, vel + vel_corr


def resolve_collisions(pos, vel, radius,
                       obstacles: Optional[ObstacleSet] = None, *,
                       drone_drone: bool = True, max_push=0.01,
                       other_pos=None, other_vel=None):
    """Full contact pass: drone-drone pairs then static obstacles."""
    if drone_drone:
        pos, vel = resolve_drone_collisions(
            pos, vel, radius, max_push=max_push,
            other_pos=other_pos, other_vel=other_vel)
    if obstacles is not None:
        pos, vel = resolve_obstacle_collisions(
            pos, vel, radius, obstacles, max_push=max_push)
    return pos, vel
