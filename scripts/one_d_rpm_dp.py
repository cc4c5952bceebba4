"""Certified optimum for HoverAviary/MultiHover under ActionType.ONE_D_RPM.

ONE_D_RPM commands the SAME rpm on all four motors (reference
BaseRLAviary.py:224-225), so no torque is ever produced: from a level spawn
the attitude stays exactly level and the full dynamics reduce to the 2-state
vertical system

    vz' = vz + dt * (4 kf rpm^2 / m - g),   z' = z + dt * vz,
    rpm = HOVER_RPM * (1 + 0.05 a),  a in [-1, 1],  8 substeps per control

with reward max(0, 2 - |z_t - z|^4) per control step (HoverAviary.py:77-79),
episode horizon 242 control steps (timeout truncation on the 242nd call —
the reference checks step_counter BEFORE advancing it, BaseAviary.py:376-382,
HoverAviary.py:115), early termination (reward flow stops) when
|z_t - z| < 1e-4, truncation when z > 2. Deterministic start at z = 0.1125,
vz = 0.

Backward induction over a fine (z, vz) grid with bilinear value interpolation
and a dense action grid computes the TRUE optimal return up to discretization
error; running at multiple resolutions establishes convergence, and a greedy
rollout from the *exact continuous* start state gives a discretization-free
lower bound. Because the DP state (z, vz) is the full Markov state of this
reduced system, the DP optimum upper-bounds the return of ANY policy,
memoryful or not.

MultiHover (2 drones, per-drone 1-dim actions, Physics.PYB, no coupling):
the joint return is the sum of two independent per-drone problems. The
joint episode terminates only when the SUM of distances < 1e-4 — a set the
optimal policy avoids (termination stops the ~2/step reward flow), exactly
as each per-drone DP avoids its own 1e-4 ball — so the sum of the per-drone
DP optima is the joint optimum up to the (1e-4)^4 ~ 1e-16 reward forfeited
by skirting the ball. Per-episode supremum: 2.0 x 242 reward-bearing steps
= 484 per drone (truncation fires on step 242 WITH its reward).

Certified results (float64, two grid resolutions agree to 0.01; greedy
rollouts from the exact continuous start match): Hover single 474.28;
MultiHover 467.34 (climb 1.0 m) + 483.27 (climb 0.5 m) = 950.61 joint. Both
reference ONE_D_RPM thresholds (474 / 949.5, learn.py:79-82) are therefore
REACHABLE, and the trained policies reach them: 474.04 single / 950.17
multi over 10 consecutive deterministic episodes (checkpoints/
one_d_rpm_*.msgpack, gated in tests/test_checkpoints.py). Historical note:
under the earlier (incorrect) 241-step horizon the optima were 472.28 /
946.61 — BELOW the thresholds; the one-step truncation parity fix is what
made the reference's own bars attainable.

The whole backward pass is ONE jitted lax.scan (dynamics recomputed in the
scan body — precomputing the (nz, nv, na) next-state tables costs ~18 GB at
full resolution and dominates wall time over the TPU tunnel).

Run: python scripts/one_d_rpm_dp.py   (float64, ~30-60 min on CPU;
     DP_F32=1 for the fast float32 sweep, DP_FULL=1 adds the 2401-grid)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
if not os.environ.get("DP_F32"):
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from functools import partial

from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel

DT = 1.0 / 240.0
SUB = 8
Z_CONTACT = 0.0125  # resting height of the ground clamp (core/dynamics.py)
Z0 = 0.025 / 2 + 0.1  # deterministic spawn height
HORIZON = 242  # 8 s at 30 Hz, timeout on the 242nd call (pre-increment counter, BaseAviary.py:376-382)
Z_LO, Z_HI = 0.0, 2.05
V_LO, V_HI = -3.0, 3.0


def _grids(nz, nv, na):
    """(z grid, vz grid, per-action accelerations)."""
    p = drone_params(DroneModel.CF2X)
    acts = jnp.linspace(-1.0, 1.0, na)
    accs = (4.0 * p.kf * (p.hover_rpm * (1.0 + 0.05 * acts)) ** 2 / p.m
            - p.g)
    return jnp.linspace(Z_LO, Z_HI, nz), jnp.linspace(V_LO, V_HI, nv), accs


def _substeps(z, v, acc):
    for _ in range(SUB):
        v = v + DT * acc
        z = z + DT * v
        below = z < Z_CONTACT
        z = jnp.where(below, Z_CONTACT, z)
        v = jnp.where(below, jnp.maximum(v, 0.0), v)
    return z, v


def _bilerp(Vtab, zn, vn, zs, vs):
    """Bilinear interpolation of the value table at (zn, vn)."""
    nz, nv = Vtab.shape
    zi = jnp.clip((zn - zs[0]) / (zs[1] - zs[0]), 0, nz - 1 - 1e-6)
    vi = jnp.clip((vn - vs[0]) / (vs[1] - vs[0]), 0, nv - 1 - 1e-6)
    z0i = jnp.floor(zi).astype(jnp.int32)
    v0i = jnp.floor(vi).astype(jnp.int32)
    zf, vf = zi - z0i, vi - v0i
    return ((1 - zf) * (1 - vf) * Vtab[z0i, v0i]
            + (1 - zf) * vf * Vtab[z0i, v0i + 1]
            + zf * (1 - vf) * Vtab[z0i + 1, v0i]
            + zf * vf * Vtab[z0i + 1, v0i + 1])


def _step_rewards(zt, zn, vn):
    """(reward, done) of landing at post-substep state (zn, vn)."""
    err = jnp.abs(zt - zn)
    r = jnp.maximum(0.0, 2.0 - err**4)
    done = (err < 1e-4) | (zn > 2.0)
    return r, done


@partial(jax.jit, static_argnums=(1, 2, 3))
def _solve_tables(zt, nz, nv, na):
    """Backward induction; returns stacked value tables, tables[k] = value
    with k+1 steps remaining (so tables[-1] is V at the episode start)."""
    zs, vs, accs = _grids(nz, nv, na)
    Z, V = jnp.meshgrid(zs, vs, indexing="ij")  # (nz, nv)

    def q_values(Vtab):
        def per_action(acc):
            zn, vn = _substeps(Z, V, acc)
            r, done = _step_rewards(zt, zn, vn)
            return r + jnp.where(done, 0.0, _bilerp(Vtab, zn, vn, zs, vs))
        return jax.lax.map(per_action, accs)  # (na, nz, nv); map not vmap:
        # vmap materializes the (na, nz, nv) substep chain 8 deep at once.

    def backup(Vtab, _):
        Vnew = jnp.max(q_values(Vtab), axis=0)
        return Vnew, Vnew

    _, tables = jax.lax.scan(backup, jnp.zeros((nz, nv)), None, length=HORIZON)
    return tables  # (HORIZON, nz, nv)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _greedy_rollout(zt, tables, nz, nv, na):
    """Greedy w.r.t. the tables from the EXACT continuous start state."""
    zs, vs, accs = _grids(nz, nv, na)

    def step(carry, Vnext):
        z, v, total, alive = carry
        zn, vn = _substeps(z, v, accs)  # (na,)
        r, d = _step_rewards(zt, zn, vn)
        q = r + jnp.where(d, 0.0, _bilerp(Vnext, zn, vn, zs, vs))
        k = jnp.argmax(q)
        total = total + jnp.where(alive, r[k], 0.0)
        carry = (jnp.where(alive, zn[k], z), jnp.where(alive, vn[k], v),
                 total, alive & ~d[k])
        return carry, None

    # Forward step t consumes V with (HORIZON-1-t) steps remaining after it:
    # tables[HORIZON-2-t], and V=0 (appended zeros) on the last step.
    rev = jnp.concatenate(
        [tables[HORIZON - 2::-1], jnp.zeros((1,) + tables.shape[1:])])
    (z, v, total, alive), _ = jax.lax.scan(
        step, (jnp.asarray(Z0), jnp.asarray(0.0), jnp.asarray(0.0),
               jnp.asarray(True)), rev)
    return total


def solve(climb, nz=1201, nv=601, na=101, greedy=True):
    """(DP optimum from the start state, greedy-rollout lower bound)."""
    zt = Z0 + climb
    tables = _solve_tables(zt, nz, nv, na)
    zs, vs, _ = _grids(nz, nv, na)
    opt = float(_bilerp(tables[-1], jnp.asarray(Z0), jnp.asarray(0.0), zs, vs))
    lo = float(_greedy_rollout(zt, tables, nz, nv, na)) if greedy else float("nan")
    return opt, lo


def main():
    grids = [(601, 301, 51), (1201, 601, 101)]
    if os.environ.get("DP_FULL"):
        grids.append((2401, 1201, 201))
    print("dtype:", jnp.zeros(()).dtype, flush=True)
    # Hover: absolute target [0,0,1] from z0=0.1125 -> climb 0.8875
    # MultiHover: per-drone targets INIT + [0,0,1/(i+1)] -> climbs 1.0, 0.5
    for label, climb in (("Hover single (climb 0.8875 m, threshold 474)", 0.8875),
                         ("MultiHover drone 0 (climb 1.0 m)", 1.0),
                         ("MultiHover drone 1 (climb 0.5 m)", 0.5)):
        print(label + ":", flush=True)
        for nz, nv, na in grids:
            opt, lo = solve(climb, nz, nv, na)
            print(f"  grid {nz}x{nv}x{na}: DP optimum {opt:.2f}, "
                  f"greedy-rollout lower bound {lo:.2f}", flush=True)


if __name__ == "__main__":
    main()
