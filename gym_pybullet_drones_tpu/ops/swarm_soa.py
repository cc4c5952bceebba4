"""SoA coupled-swarm step: fused substep chain + tiled Pallas pair kernels.

`runtime/swarm.make_big_swarm_physics` runs the AoS `substep_pyb` between
Pallas pair passes; at 4096 drones the AoS chain of stack/concat/einsum ops —
not the pair kernels — bounds throughput (docs/PERF.md tile sweep). This
module re-expresses that chain in the structure-of-arrays form of
`ops/velocity_soa.physics_substep_soa` (every component a flat (N,) column,
every op elementwise, so XLA fuses whole substeps) and feeds the Pallas
kernels through their column-level entry points — no (N,3) packing anywhere
in the loop.

Semantics match `make_big_swarm_physics` exactly:
  * wake magnitude from pre-substep positions, entering the substep's force
    assembly as a body-z COM force (``fz_body``) exactly like the dense dw
    term — same accel and resting-contact semantics;
  * with contact, substep k's resolve and substep k+1's wake share one fused
    pair pass (`ops/interact_pallas`), n+1 passes per control step.
PYB_DW only (the coupled-swarm mode); drag/ground-effect variants use the
AoS path.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.params import DroneParams
from gym_pybullet_drones_tpu.ops.velocity_soa import (
    _rot_cols_from_quat,
    physics_consts,
    physics_substep_soa,
)

def swarm_soa_from_kin(kin) -> Dict[str, jax.Array]:
    """KinState (leaves (N, d)) -> dict of (N,) columns."""
    s = {}
    for i, k in enumerate(("px", "py", "pz")):
        s[k] = kin.pos[:, i]
    for i, k in enumerate(("qx", "qy", "qz", "qw")):
        s[k] = kin.quat[:, i]
    for i, k in enumerate(("vx", "vy", "vz")):
        s[k] = kin.vel[:, i]
    for i, k in enumerate(("wx", "wy", "wz")):
        s[k] = kin.ang_v[:, i]
    return s


def swarm_soa_to_kin(s: Dict[str, jax.Array], template):
    """dict of (N,) columns -> KinState.

    rpy_rates follows `core/dynamics.substep_pyb`: R(quat)^T @ ang_v.
    """
    pack = lambda ks: jnp.stack([s[k] for k in ks], -1)
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rot_cols_from_quat(
        s["qx"], s["qy"], s["qz"], s["qw"])
    wx, wy, wz = s["wx"], s["wy"], s["wz"]
    rpy_rates = jnp.stack([r00 * wx + r10 * wy + r20 * wz,
                           r01 * wx + r11 * wy + r21 * wz,
                           r02 * wx + r12 * wy + r22 * wz], -1)
    return template.replace(
        pos=pack(("px", "py", "pz")),
        quat=pack(("qx", "qy", "qz", "qw")),
        vel=pack(("vx", "vy", "vz")),
        ang_v=pack(("wx", "wy", "wz")),
        rpy_rates=rpy_rates,
    )


def make_sorted_swarm(params: DroneParams, dt, n_substeps: int,
                      collisions: bool = False, interpret: bool = False,
                      order: str = "z", resort_every: int = 4,
                      cone: bool = True, neighbor_cap=None,
                      bt: int = 256, bs=None):
    """Persistently-sorted coupled-swarm loop (round-3 neighbor pruning).

    Returns ``(init, step, export)``:
      * ``init(kin) -> s`` sorts the fleet by ``order`` ("z" or "morton"),
        keeps original indices in ``s['ids']``, and seeds the carried wake;
      * ``step(s, rpm_cols) -> s`` advances one control period entirely in
        permuted space (rpm columns are given in ORIGINAL drone order and
        gathered once per step); the fleet re-sorts every ``resort_every``
        control steps under ``lax.cond``;
      * ``export(s, template) -> KinState`` scatters back to original order.

    Why this beats the per-pass z_sort path (measured, scripts/pair_profile.py
    at 65k): each sorted pair pass spent ~9 ms on argsort+gather+scatter —
    a third of the pass. Here the state never leaves permuted space; the pair
    kernels are the mask-gated variants (ops/{downwash,interact}_pallas
    ``make_*_masked``) whose tile live masks are computed from the ACTUAL
    coordinates each pass (ops/spatial), so correctness never depends on how
    stale the ordering is — staleness only loosens the culling. The wake is
    carried ACROSS control steps (the pass after substep n-1 seeds the next
    step's substep 0), cutting contact mode from 6 pair passes per control
    step to 5. With contact the carried wake is computed from pre-correction
    positions — the same stated deviation class as the fused within-step
    passes (ops/interact_pallas docstring).
    """
    from gym_pybullet_drones_tpu.ops.downwash_pallas import (
        make_downwash_masked,
    )
    from gym_pybullet_drones_tpu.ops.interact_pallas import (
        make_interact_masked,
    )
    from gym_pybullet_drones_tpu.ops.spatial import sort_key

    c = physics_consts(params)
    dw_m = make_downwash_masked(params, bt=bt, bs=bs, interpret=interpret,
                                cone=cone, neighbor_cap=neighbor_cap)
    ia_m = (make_interact_masked(params, bt=bt, bs=bs, interpret=interpret,
                                 cone=cone, neighbor_cap=neighbor_cap)
            if collisions else None)
    _COLS = ("px", "py", "pz", "qx", "qy", "qz", "qw",
             "vx", "vy", "vz", "wx", "wy", "wz", "mag", "ids")

    def _resort(s):
        o = jnp.argsort(sort_key(s["px"], s["py"], s["pz"], order))
        out = {k: (s[k][o] if k in _COLS else s[k]) for k in s}
        return out

    def init(kin):
        s = swarm_soa_from_kin(kin)
        n = s["px"].shape[0]
        s["ids"] = jnp.arange(n, dtype=jnp.int32)
        s["mag"] = jnp.zeros_like(s["px"])
        s["t"] = jnp.int32(0)
        s = _resort(s)
        s["mag"] = dw_m.cols(s["px"], s["py"], s["pz"])
        return s

    def step(s, rpm_cols):
        s = jax.lax.cond((s["t"] % resort_every) == 0, _resort,
                         lambda x: x, s)
        ids = s["ids"]
        rpm_sorted = [r[ids] for r in rpm_cols]
        px, py, pz = s["px"], s["py"], s["pz"]
        qx, qy, qz, qw = s["qx"], s["qy"], s["qz"], s["qw"]
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        wx, wy, wz = s["wx"], s["wy"], s["wz"]
        mag = s["mag"]
        for _ in range(n_substeps):
            (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz) = (
                physics_substep_soa(c, dt, px, py, pz, qx, qy, qz, qw,
                                    vx, vy, vz, wx, wy, wz, rpm_sorted,
                                    fz_body=mag))
            if collisions:
                mag, dp, dv = ia_m.cols(px, py, pz, vx, vy, vz)
                px, py, pz = px + dp[0], py + dp[1], pz + dp[2]
                vx, vy, vz = vx + dv[0], vy + dv[1], vz + dv[2]
            else:
                mag = dw_m.cols(px, py, pz)
        return dict(px=px, py=py, pz=pz, qx=qx, qy=qy, qz=qz, qw=qw,
                    vx=vx, vy=vy, vz=vz, wx=wx, wy=wy, wz=wz,
                    mag=mag, ids=ids, t=s["t"] + 1)

    def export(s, template):
        ids = s["ids"]
        unsorted = {k: jnp.zeros_like(s[k]).at[ids].set(s[k])
                    for k in _COLS if k not in ("mag", "ids")}
        return swarm_soa_to_kin(unsorted, template)

    return init, step, export


def make_swarm_step_soa(params: DroneParams, dt, n_substeps: int,
                        collisions: bool = False, interpret: bool = False,
                        z_sort=None):
    """Build `step(s, rpm_cols) -> s` over SoA columns: PYB_DW physics with
    the Pallas wake (and optionally the fused wake+contact pass). ``z_sort``
    (default auto by fleet size) runs pair passes in z-ascending order for
    exact tile culling — see runtime/swarm.make_big_swarm_physics."""
    from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_pallas
    from gym_pybullet_drones_tpu.ops.interact_pallas import make_interact_pallas
    from gym_pybullet_drones_tpu.ops.collide_pallas import make_collide_pallas

    c = physics_consts(params)
    dw_fn = make_downwash_pallas(params, interpret=interpret, z_sort=z_sort)
    interact_fn = (make_interact_pallas(params, interpret=interpret,
                                        z_sort=z_sort)
                   if collisions else None)
    collide_fn = (make_collide_pallas(params, interpret=interpret,
                                      z_sort=z_sort)
                  if collisions else None)

    def step(s: Dict[str, jax.Array], rpm_cols):
        px, py, pz = s["px"], s["py"], s["pz"]
        qx, qy, qz, qw = s["qx"], s["qy"], s["qz"], s["qw"]
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        wx, wy, wz = s["wx"], s["wy"], s["wz"]

        mag = dw_fn.cols(px, py, pz)
        for k in range(n_substeps):
            (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz) = (
                physics_substep_soa(c, dt, px, py, pz, qx, qy, qz, qw,
                                    vx, vy, vz, wx, wy, wz, rpm_cols,
                                    fz_body=mag))
            if collisions:
                if k < n_substeps - 1:
                    mag, dp, dv = interact_fn.cols(px, py, pz, vx, vy, vz)
                else:
                    dp, dv = collide_fn.cols(px, py, pz, vx, vy, vz)
                px, py, pz = px + dp[0], py + dp[1], pz + dp[2]
                vx, vy, vz = vx + dv[0], vy + dv[1], vz + dv[2]
            elif k < n_substeps - 1:
                mag = dw_fn.cols(px, py, pz)

        return dict(px=px, py=py, pz=pz, qx=qx, qy=qy, qz=qz, qw=qw,
                    vx=vx, vy=vy, vz=vz, wx=wx, wy=wy, wz=wz)

    return step
