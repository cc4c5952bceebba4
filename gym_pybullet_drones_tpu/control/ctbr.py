"""Collective-Thrust-Body-Rates controller (pure JAX, batch-agnostic).

Behavioral spec: control/CTBRControl.py:149-168 — PD position loop producing a
desired acceleration, mass-normalized collective thrust along the current body
z, target attitude from the desired acceleration direction, and body rates
proportional to the vector part of the attitude error quaternion. Used to
drive Betaflight-style rate-mode flight stacks (examples/beta.py:128-138).

Conventions: quaternions are xyzw (suite-wide); the reference uses wxyz via
transforms3d internally (CTBRControl.py:92) — the math here is identical, only
the storage order differs.
"""

import jax
import jax.numpy as jnp
from flax import struct

from gym_pybullet_drones_tpu.core.params import G
from gym_pybullet_drones_tpu.core.rotations import quat_multiply, quat_rotate
from gym_pybullet_drones_tpu.envs.spec import DroneModel


@struct.dataclass
class CTBRParams:
    k_p: jax.Array  # (3,) position P gains (CTBRControl.py:150)
    k_d: jax.Array  # (3,) velocity D gains (:151)
    k_rates: jax.Array  # (3,) attitude-error-to-rate gains (:152)
    g: jax.Array


def ctbr_params(model: DroneModel = DroneModel.CF2X, g: float = G,
                dtype=jnp.float32) -> CTBRParams:
    arr = lambda v: jnp.asarray(v, dtype=dtype)
    return CTBRParams(
        k_p=arr([3.0, 3.0, 8.0]), k_d=arr([2.5, 2.5, 5.0]),
        k_rates=arr([5.0, 5.0, 1.0]), g=arr(g),
    )


def _matrix_cols_to_quat_xyzw(x_body, y_body, z_body):
    """Quaternion from a rotation matrix given as column vectors (Shepperd's
    method, branch-free via jnp.where; matches transforms3d mat2quat up to
    sign, which the rate law is invariant to)."""
    m00, m10, m20 = x_body[..., 0], x_body[..., 1], x_body[..., 2]
    m01, m11, m21 = y_body[..., 0], y_body[..., 1], y_body[..., 2]
    m02, m12, m22 = z_body[..., 0], z_body[..., 1], z_body[..., 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    qx0 = (m21 - m12) / jnp.maximum(4.0 * qw0, 1e-12)
    qy0 = (m02 - m20) / jnp.maximum(4.0 * qw0, 1e-12)
    qz0 = (m10 - m01) / jnp.maximum(4.0 * qw0, 1e-12)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qw1 = (m21 - m12) / jnp.maximum(4.0 * qx1, 1e-12)
    qy1 = (m01 + m10) / jnp.maximum(4.0 * qx1, 1e-12)
    qz1 = (m02 + m20) / jnp.maximum(4.0 * qx1, 1e-12)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qw2 = (m02 - m20) / jnp.maximum(4.0 * qy2, 1e-12)
    qx2 = (m01 + m10) / jnp.maximum(4.0 * qy2, 1e-12)
    qz2 = (m12 + m21) / jnp.maximum(4.0 * qy2, 1e-12)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    qw3 = (m10 - m01) / jnp.maximum(4.0 * qz3, 1e-12)
    qx3 = (m02 + m20) / jnp.maximum(4.0 * qz3, 1e-12)
    qy3 = (m12 + m21) / jnp.maximum(4.0 * qz3, 1e-12)

    cand = jnp.stack([
        jnp.stack([qx0, qy0, qz0, qw0], -1),
        jnp.stack([qx1, qy1, qz1, qw1], -1),
        jnp.stack([qx2, qy2, qz2, qw2], -1),
        jnp.stack([qx3, qy3, qz3, qw3], -1),
    ], -2)  # (..., 4, 4)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], -1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def _qconj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], -1)


def ctbr_control(params: CTBRParams, cur_pos, cur_quat, cur_vel,
                 target_pos, target_vel=None):
    """Returns (..., 4): [mass-normalized thrust (m/s^2), p, q, r (rad/s)].

    CTBRControl.computeControl (:149-168): tar_acc = Kp e + Kd de + g*z;
    thrust = tar_acc . z_body(world); attitude from acc direction with x_body
    from cross([0,1,0], z); rates = 2 * K_RATES * vec(q_err), sign-corrected.
    """
    target_vel = jnp.zeros_like(cur_pos) if target_vel is None else target_vel
    e_p = target_pos - cur_pos
    e_d = target_vel - cur_vel
    gvec = jnp.stack([jnp.zeros_like(e_p[..., 0]), jnp.zeros_like(e_p[..., 0]),
                      jnp.broadcast_to(params.g, e_p[..., 0].shape)], -1)
    tar_acc = params.k_p * e_p + params.k_d * e_d + gvec
    z_world = quat_rotate(cur_quat, jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=cur_pos.dtype), cur_pos.shape))
    norm_thrust = jnp.sum(tar_acc * z_world, axis=-1)

    def normed(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    z_body = normed(tar_acc)
    y_axis = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], dtype=cur_pos.dtype),
                              z_body.shape)
    x_body = normed(jnp.cross(y_axis, z_body))
    y_body = normed(jnp.cross(z_body, x_body))
    tar_att = _matrix_cols_to_quat_xyzw(x_body, y_body, z_body)
    q_err = quat_multiply(_qconj(cur_quat), tar_att)
    rates = 2.0 * params.k_rates * q_err[..., :3]
    rates = jnp.where(q_err[..., 3:4] < 0, -rates, rates)
    return jnp.concatenate([norm_thrust[..., None], rates], -1)
