"""Certified optima for HoverAviary under ActionType.VEL and ONE_D_PID.

Both action types route through the embedded DSLPID (reference
BaseRLAviary._preprocessAction :186-239), and both stay EXACTLY on the
vertical manifold from the level Hover spawn: with zero roll/pitch/yaw and
zero lateral state, the position loop's target thrust vector is vertical, so
target_euler is 0 (or the 180-degree flip when the desired z-force is
negative, whose skew-symmetric attitude error R_t^T R_c - R_c^T R_t is
exactly zero because diag(1,-1,-1) is symmetric), the attitude loop outputs
zero differential torque, all four PWMs stay equal, and the drone never
tilts. The closed-form per-control-step map is (control/dsl_pid.py:86-158):

    tz   = P_z*ez + I_z*i' + D_z*(tvz - vz) + m*g        [desired z-force]
    pwm  = clip((sqrt(max(0,tz)/(4 kf)) - C)/S, 20000, 65535)
    rpm  = S*pwm + C          (all four motors, zero mixer contribution)
    then 8 substeps of vz += dt*(4 kf rpm^2/m - g); z += dt*vz; ground clamp

with P_z=1.25, I_z=0.05, D_z=0.5, S=0.2685, C=4070.3 (DSLPIDControl.py:42-58).

ActionType.VEL (4-dim, BaseRLAviary.py:228-239): target_pos = cur_pos every
step, so pos_e == 0 and the position integral stays identically zero even off
the manifold; the only control is tvz = SPEED_LIMIT*|a3|*unit(a)_z in
[-0.25, 0.25] (SPEED_LIMIT = 0.03*MAX_SPEED_KMH/3.6, VelocityAviary.py:78).
The reduced state (z, vz) is the FULL Markov state of the vertical-command
class -> exact 2-state DP. (Scope: the certificate is over vertical-command
policies; lateral components only add to the 3-D distance in the reward
max(0, 2-d^4) and tilt the thrust vector away from vertical.)

ActionType.ONE_D_PID (1-dim, BaseRLAviary.py:221-227): target = cur_pos +
0.1*a*z_hat, so ez = 0.1*a in [-0.1, 0.1] exactly, tvz = 0, and the position
integral i' = clip(i + ez/30, -0.15, 0.15) is carried state
(DSLPIDControl.py:166-168 z-clip). The action space is 1-dim so the vertical
manifold is the WHOLE reachable set: the 3-state (z, vz, i) DP optimum is
the optimum over ANY policy of the live env.

Episode mechanics identical to scripts/one_d_rpm_dp.py (validated against
the live env there): 241 control steps, reward max(0, 2-|z_t-z|^4) on the
post-step state, termination (reward flow stops) when |z_t-z| < 1e-4 or
z > 2, start z = 0.1125. The 1e-4 termination ball falls between grid
points, so the DP solves the smooth no-ball problem; a real policy hovers
just outside the ball forfeiting (1e-4)^4 ~ 1e-16 per step, and the greedy
rollouts below (which recompute Q from the stacked value tables at the
exact continuous state, never entering the ball) realize the DP value to
<0.5, confirming the no-ball reading is achievable.

CONCLUSION: the learn.py thresholds are comfortably reachable for VEL and
ONE_D_PID. The D-term velocity damping caps the climb at ~0.25-0.27 m/s
(terminal velocity where tz = m*g), costing ~13-14 reward in transit over
the 0.8875 m climb, but that still leaves the optimum well above the 467
bar (for ONE_D_RPM the margin over its 474 bar is only 0.28 —
scripts/one_d_rpm_dp.py).

Certified results under the correct 242-step episode (float64; grid
resolutions agree to <0.1; greedy realizations from the exact continuous
start match the DP to <0.1):

    Hover (climb 0.8875, threshold 467):
        VEL        DP optimum 470.45   greedy realization 470.45
        ONE_D_PID  DP optimum 470.72   greedy realization 470.75
    MultiHover joint (climbs 1.0 + 0.5, threshold 920):
        VEL        459.46 + 483.22 = 942.68
        ONE_D_PID  460.00 + 483.23 = 943.23

(Historical: under the earlier incorrect 241-step horizon these were
468.62 / 468.10 single and 936.40 / 935.35 joint.)

(run `--check` to replay the greedy action sequences through the real
float32 functional env; values land within ~0.3 of the f64 reduced model).

Run: JAX_PLATFORMS=cpu python scripts/vel_pid_dp.py [--check] [--full]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from functools import partial

from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel

DT = 1.0 / 240.0
SUB = 8
CTRL_DT = 1.0 / 30.0
Z_CONTACT = 0.0125
Z0 = 0.025 / 2 + 0.1
HORIZON = 242  # 8 s at 30 Hz, timeout on the 242nd call (pre-increment counter, BaseAviary.py:376-382)
Z_LO, Z_HI = 0.0, 2.05
V_LO, V_HI = -1.5, 1.5  # |vz| stays < 0.5 under these weak controllers

P_Z, I_Z, D_Z = 1.25, 0.05, 0.5
PWM_S, PWM_C = 0.2685, 4070.3
MIN_PWM, MAX_PWM = 20000.0, 65535.0
I_CLIP = 0.15

_P = drone_params(DroneModel.CF2X)
KF, M, G = float(_P.kf), float(_P.m), float(_P.g)
MG = M * G
SPEED_LIMIT = 0.03 * float(_P.max_speed_kmh) * (1000.0 / 3600.0)  # 0.25 m/s


def _accel(tz):
    """Desired z-force (N) -> realized constant vertical acceleration."""
    pwm = jnp.clip((jnp.sqrt(jnp.maximum(tz, 0.0) / (4.0 * KF)) - PWM_C) / PWM_S,
                   MIN_PWM, MAX_PWM)
    rpm = PWM_S * pwm + PWM_C
    return 4.0 * KF * rpm**2 / M - G


def _substeps(z, v, acc):
    for _ in range(SUB):
        v = v + DT * acc
        z = z + DT * v
        below = z < Z_CONTACT
        z = jnp.where(below, Z_CONTACT, z)
        v = jnp.where(below, jnp.maximum(v, 0.0), v)
    return z, v


def _step_rewards(zt, zn):
    err = jnp.abs(zt - zn)
    return jnp.maximum(0.0, 2.0 - err**4), (err < 1e-4) | (zn > 2.0)


def _lerp_axis(x, grid_lo, grid_step, n):
    xi = jnp.clip((x - grid_lo) / grid_step, 0, n - 1 - 1e-9)
    i0 = jnp.floor(xi).astype(jnp.int32)
    return i0, xi - i0


def _bilerp(Vtab, zn, vn, zs, vs):
    nz, nv = Vtab.shape[-2:]
    z0, zf = _lerp_axis(zn, zs[0], zs[1] - zs[0], nz)
    v0, vf = _lerp_axis(vn, vs[0], vs[1] - vs[0], nv)
    return ((1 - zf) * (1 - vf) * Vtab[..., z0, v0]
            + (1 - zf) * vf * Vtab[..., z0, v0 + 1]
            + zf * (1 - vf) * Vtab[..., z0 + 1, v0]
            + zf * vf * Vtab[..., z0 + 1, v0 + 1])


# ---------------------------------------------------------------- 2-state DP
# Shared by VEL (control c = tvz, tz = D_Z*(c - vz) + MG) and, if wanted, any
# relaxation of the form tz = gain*c - D_Z*vz + MG.


@partial(jax.jit, static_argnums=(2, 3, 4))
def _solve2(zt, ctrl_vals, ctrl_gain, nz, nv):
    """Backward induction; returns stacked value tables, tables[k] = value
    with k+1 steps remaining (tables[-1] is V at the episode start)."""
    zs = jnp.linspace(Z_LO, Z_HI, nz)
    vs = jnp.linspace(V_LO, V_HI, nv)
    Z, V = jnp.meshgrid(zs, vs, indexing="ij")

    def backup(Vtab, _):
        def per_action(c):
            acc = _accel(ctrl_gain * c - D_Z * V + MG)
            zn, vn = _substeps(Z, V, acc)
            r, done = _step_rewards(zt, zn)
            return r + jnp.where(done, 0.0, _bilerp(Vtab, zn, vn, zs, vs))
        Vnew = jnp.max(jax.lax.map(per_action, ctrl_vals), axis=0)
        return Vnew, Vnew

    _, tables = jax.lax.scan(backup, jnp.zeros((nz, nv)), None, length=HORIZON)
    return tables


@partial(jax.jit, static_argnums=(3, 4, 5))
def _greedy2(zt, tables, ctrl_vals, ctrl_gain, nz, nv):
    """Greedy w.r.t. the tables from the EXACT continuous start state:
    recomputes Q per step, so it steers around the 1e-4 termination ball
    instead of snapping into it. Returns (return, action sequence)."""
    zs = jnp.linspace(Z_LO, Z_HI, nz)
    vs = jnp.linspace(V_LO, V_HI, nv)

    def step(carry, Vnext):
        z, v, total, alive = carry
        acc = _accel(ctrl_gain * ctrl_vals - D_Z * v + MG)
        zn, vn = _substeps(z, v, acc)  # (na,)
        r, d = _step_rewards(zt, zn)
        q = r + jnp.where(d, 0.0, _bilerp(Vnext, zn, vn, zs, vs))
        k = jnp.argmax(q)
        total = total + jnp.where(alive, r[k], 0.0)
        carry = (jnp.where(alive, zn[k], z), jnp.where(alive, vn[k], v),
                 total, alive & ~d[k])
        return carry, ctrl_vals[k]

    rev = jnp.concatenate(
        [tables[HORIZON - 2::-1], jnp.zeros((1,) + tables.shape[1:])])
    (z, v, total, alive), acts = jax.lax.scan(
        step, (jnp.asarray(Z0, jnp.float64), jnp.asarray(0.0, jnp.float64),
               jnp.asarray(0.0, jnp.float64), jnp.asarray(True)), rev)
    return total, acts


# ------------------------------------------------------- ONE_D_PID 3-state DP


def _trilerp(Vtab, zn, vn, inew, zs, vs, is_):
    nz, nv, ni = Vtab.shape[-3:]
    z0, zf = _lerp_axis(zn, zs[0], zs[1] - zs[0], nz)
    v0, vf = _lerp_axis(vn, vs[0], vs[1] - vs[0], nv)
    i0, if_ = _lerp_axis(inew, is_[0], is_[1] - is_[0], ni)
    out = 0.0
    for dz, wz in ((0, 1 - zf), (1, zf)):
        for dv, wv in ((0, 1 - vf), (1, vf)):
            for di, wi in ((0, 1 - if_), (1, if_)):
                out = out + wz * wv * wi * Vtab[..., z0 + dz, v0 + dv, i0 + di]
    return out


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _solve3(zt, nz, nv, ni, na):
    """3-state backward induction. The stacked tables are float32 to bound
    memory (241 x grid); the greedy rollout only uses them to RANK actions,
    and its returned reward is recomputed in float64, so the lower bound
    stays exact."""
    zs = jnp.linspace(Z_LO, Z_HI, nz)
    vs = jnp.linspace(V_LO, V_HI, nv)
    is_ = jnp.linspace(-I_CLIP, I_CLIP, ni)
    acts = jnp.linspace(-1.0, 1.0, na)
    Z, V, I = jnp.meshgrid(zs, vs, is_, indexing="ij")

    def backup(Vtab, _):
        def per_action(a):
            ez = 0.1 * a
            inew = jnp.clip(I + ez * CTRL_DT, -I_CLIP, I_CLIP)
            acc = _accel(P_Z * ez + I_Z * inew - D_Z * V + MG)
            zn, vn = _substeps(Z, V, acc)
            r, done = _step_rewards(zt, zn)
            return r + jnp.where(done, 0.0,
                                 _trilerp(Vtab, zn, vn, inew, zs, vs, is_))
        Vnew = jnp.max(jax.lax.map(per_action, acts), axis=0)
        return Vnew, Vnew.astype(jnp.float32)

    V, tables = jax.lax.scan(backup, jnp.zeros((nz, nv, ni)), None,
                             length=HORIZON)
    return V, tables


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _greedy3(zt, tables, nz, nv, ni, na):
    zs = jnp.linspace(Z_LO, Z_HI, nz)
    vs = jnp.linspace(V_LO, V_HI, nv)
    is_ = jnp.linspace(-I_CLIP, I_CLIP, ni)
    acts = jnp.linspace(-1.0, 1.0, na)

    def step(carry, Vnext):
        z, v, i, total, alive = carry
        ez = 0.1 * acts
        inew = jnp.clip(i + ez * CTRL_DT, -I_CLIP, I_CLIP)
        acc = _accel(P_Z * ez + I_Z * inew - D_Z * v + MG)
        zn, vn = _substeps(z, v, acc)  # (na,)
        r, d = _step_rewards(zt, zn)
        q = r + jnp.where(d, 0.0,
                          _trilerp(Vnext, zn, vn, inew, zs, vs, is_))
        k = jnp.argmax(q)
        total = total + jnp.where(alive, r[k], 0.0)
        carry = (jnp.where(alive, zn[k], z), jnp.where(alive, vn[k], v),
                 jnp.where(alive, inew[k], i), total, alive & ~d[k])
        return carry, acts[k]

    rev = jnp.concatenate(
        [tables[HORIZON - 2::-1],
         jnp.zeros((1,) + tables.shape[1:], tables.dtype)])
    f64 = lambda x: jnp.asarray(x, jnp.float64)
    (z, v, i, total, alive), acts_out = jax.lax.scan(
        step, (f64(Z0), f64(0.0), f64(0.0), f64(0.0), jnp.asarray(True)), rev)
    return total, acts_out


# --------------------------------------------------------- real-env replay


def _env_replay(action_cols, act_type):
    """Roll the extracted 1-D action sequence through the REAL functional
    env (float32, the training dtype) and return the episode return."""
    from gym_pybullet_drones_tpu.envs.base import (
        Aviary, AviaryConfig, TASK_HOVER)
    from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType

    cfg = AviaryConfig(num_drones=1, task=TASK_HOVER, action_type=act_type,
                       obs_type=ObservationType.KIN, pyb_freq=240,
                       ctrl_freq=30, action_buffer_size=15,
                       episode_len_sec=8.0)
    env = Aviary(cfg)
    state = env.reset(jax.random.key(0))
    total, done = 0.0, False
    for a in np.asarray(action_cols):
        a = float(a)
        if act_type == ActionType.VEL:
            act = jnp.asarray([[0.0, 0.0, float(np.sign(a)),
                                abs(a) / SPEED_LIMIT]], dtype=jnp.float32)
        else:
            act = jnp.asarray([[a]], dtype=jnp.float32)
        state, obs, reward, term, trunc, info = env.step(state, act)
        if not done:
            total += float(reward)
        done = done or bool(term) or bool(trunc)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="replay greedy action sequences through the real env")
    ap.add_argument("--full", action="store_true", help="add a finer grid")
    args = ap.parse_args()

    grids2 = [(601, 301, 51), (1201, 601, 101)]
    grids3 = [(301, 181, 21, 31), (401, 241, 31, 41)]
    if args.full:
        grids2.append((1801, 901, 151))
        grids3.append((601, 301, 41, 51))

    from gym_pybullet_drones_tpu.envs.spec import ActionType

    # Hover climb 0.8875 m; MultiHover per-drone climbs 1.0 / 0.5 m.
    for label, climb in (("Hover (climb 0.8875 m, threshold 467)", 0.8875),
                         ("MultiHover drone 0 (climb 1.0 m)", 1.0),
                         ("MultiHover drone 1 (climb 0.5 m)", 0.5)):
        zt = Z0 + climb
        print(f"== {label}", flush=True)
        acts_v = acts_p = None
        for nz, nv, na in grids2:
            tvz = jnp.linspace(-SPEED_LIMIT, SPEED_LIMIT, na)
            tables = _solve2(zt, tvz, D_Z, nz, nv)
            zs = jnp.linspace(Z_LO, Z_HI, nz)
            vs = jnp.linspace(V_LO, V_HI, nv)
            opt = float(_bilerp(tables[-1], jnp.asarray(Z0), jnp.asarray(0.0),
                                zs, vs))
            lo, acts_v = _greedy2(zt, tables, tvz, D_Z, nz, nv)
            print(f"  VEL        grid {nz}x{nv}x{na}: DP {opt:.3f}, "
                  f"greedy {float(lo):.3f}", flush=True)
        for nz, nv, ni, na in grids3:
            V, tables = _solve3(zt, nz, nv, ni, na)
            zs = jnp.linspace(Z_LO, Z_HI, nz)
            vs = jnp.linspace(V_LO, V_HI, nv)
            is_ = jnp.linspace(-I_CLIP, I_CLIP, ni)
            opt = float(_trilerp(V, jnp.asarray(Z0), jnp.asarray(0.0),
                                 jnp.asarray(0.0), zs, vs, is_))
            lo, acts_p = _greedy3(zt, tables, nz, nv, ni, na)
            print(f"  ONE_D_PID  grid {nz}x{nv}x{ni}x{na}: DP {opt:.3f}, "
                  f"greedy {float(lo):.3f}", flush=True)
        if args.check:
            rv = _env_replay(acts_v, ActionType.VEL)
            rp = _env_replay(acts_p, ActionType.ONE_D_PID)
            print(f"  real-env replay: VEL {rv:.3f}  ONE_D_PID {rp:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
