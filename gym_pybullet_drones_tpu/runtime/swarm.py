"""Sharded interacting swarm: one aviary's drone axis spans the device mesh.

`runtime/mesh.py` shards the *env* axis (independent instances, zero
collectives). This module shards the *drone* axis of a single physically
coupled swarm — the scaling story for BASELINE config 5 ("4096 vectorized
drones ... sharded over hosts") when the drones interact through downwash
(the reference's only cross-drone force, BaseAviary.py:798-811).

Inside `shard_map`, each shard advances its local (N/D)-drone slab through
the full PYB substep pipeline; the downwash term reads wake sources from an
`all_gather` of ALL drone positions over ICI (a few KB per substep at 4096
drones). Everything else — thrust, ground effect, drag, integration — stays
shard-local, so the collective volume per step is `n_substeps * N * 3`
floats.
"""

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gym_pybullet_drones_tpu.core.collisions import resolve_drone_collisions
from gym_pybullet_drones_tpu.core.dynamics import _PYB_FLAGS, KinState, substep_pyb
from gym_pybullet_drones_tpu.core.params import DroneParams
from gym_pybullet_drones_tpu.envs.spec import Physics


def make_sharded_swarm_physics(mesh: Mesh, params: DroneParams, dt,
                               n_substeps: int,
                               physics: Physics = Physics.PYB_DW,
                               axis: str = "env",
                               collisions: bool = False,
                               pallas: bool = False,
                               interpret: bool = False,
                               z_sort=None,
                               pallas_opts: dict = None):
    """Build `step(kin, rpm, last_rpm) -> (kin, last_rpm)` where every leaf's
    leading drone axis is sharded over `mesh` and downwash couples shards.

    Matches `core.dynamics.step_physics` for the PYB modes (incl. the
    previous-action drag quirk); `Physics.DYN` has no cross-drone terms, so
    use the plain sharded env path for it. With ``collisions`` the drone-drone
    sphere contact (core/collisions.py) also couples shards: each shard
    resolves its slab against the all-gathered global fleet (positions +
    velocities ride the same ICI collective as the wake sources).

    ``pallas``: compute the cross-shard pair interactions with the
    RECTANGULAR tiled kernels (local targets x gathered global sources,
    `ops/downwash_pallas` / `ops/collide_pallas`) instead of dense
    (N_local, N_global) tensors. The dense form needs ~6 GB of pair
    intermediates per chip at 65k drones / 8 chips; the tiled form is
    O(N_global + tile), so coupled 100k+ fleets shard over a mesh. The
    Pallas wake magnitude feeds `substep_pyb(dw_force_body_z=...)`, entering
    the force assembly exactly like the dense dw term (same accel, same
    resting-contact test — same construction as `make_big_swarm_physics`);
    ``z_sort`` bound-culling applies per shard (see the kernel docstrings).
    """
    flags = dict(_PYB_FLAGS[physics])
    use_dw = flags.pop("dw")

    if pallas:
        from gym_pybullet_drones_tpu.ops.collide_pallas import make_collide_pallas
        from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_pallas

        opts = dict(interpret=interpret, z_sort=z_sort, **(pallas_opts or {}))
        dw_fn = make_downwash_pallas(params, **opts) if use_dw else None
        collide_fn = (make_collide_pallas(params, return_delta=True, **opts)
                      if collisions else None)

        def local_step(kin: KinState, rpm, last_rpm):
            for _ in range(n_substeps):
                mag = None
                if use_dw:
                    gpos = jax.lax.all_gather(kin.pos, axis, axis=0,
                                              tiled=True)
                    mag = dw_fn(kin.pos, src_pos=gpos)
                kin = substep_pyb(kin, rpm, last_rpm, params, dt,
                                  dw=False, dw_force_body_z=mag, **flags)
                if collisions:
                    gpos = jax.lax.all_gather(kin.pos, axis, axis=0,
                                              tiled=True)
                    gvel = jax.lax.all_gather(kin.vel, axis, axis=0,
                                              tiled=True)
                    dpos, dvel = collide_fn(kin.pos, kin.vel,
                                            src_pos=gpos, src_vel=gvel)
                    kin = kin.replace(pos=kin.pos + dpos, vel=kin.vel + dvel)
                last_rpm = rpm
            return kin, last_rpm

    else:

        def local_step(kin: KinState, rpm, last_rpm):
            for _ in range(n_substeps):
                dw_src = (jax.lax.all_gather(kin.pos, axis, axis=0, tiled=True)
                          if use_dw else None)
                kin = substep_pyb(kin, rpm, last_rpm, params, dt,
                                  dw=use_dw, dw_src_pos=dw_src, **flags)
                if collisions:
                    # Contact resolves on *post-integration* kinematics (same
                    # order as the dense substep_pyb): gather the stepped
                    # fleet, then project the local slab against it.
                    gpos = jax.lax.all_gather(kin.pos, axis, axis=0, tiled=True)
                    gvel = jax.lax.all_gather(kin.vel, axis, axis=0, tiled=True)
                    new_pos, new_vel = resolve_drone_collisions(
                        kin.pos, kin.vel, params.collision_r,
                        other_pos=gpos, other_vel=gvel)
                    kin = kin.replace(pos=new_pos, vel=new_vel)
                last_rpm = rpm
            return kin, last_rpm

    spec_kin = KinState(pos=P(axis), quat=P(axis), vel=P(axis),
                        ang_v=P(axis), rpy_rates=P(axis))
    stepped = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_kin, P(axis), P(axis)),
        out_specs=(spec_kin, P(axis)),
        # pallas_call's out_shape carries no varying-mesh-axes annotation, so
        # shard_map's vma check cannot type it; the kernels are per-shard
        # local by construction (targets sharded, sources pre-gathered).
        check_vma=not pallas,
    )
    return jax.jit(stepped)


def shard_swarm_kin(mesh: Mesh, kin: KinState, axis: str = "env") -> KinState:
    """Place a KinState (leading drone axis) onto the mesh, sharded
    (multi-process-safe: one jitted identity, see runtime.mesh._put_tree)."""
    from gym_pybullet_drones_tpu.runtime.mesh import _put_tree

    return _put_tree(kin, NamedSharding(mesh, P(axis)))


def select_swarm_backend(pos, mesh: Mesh = None,
                         min_n: int = 16384, min_pitch: float = 2.0) -> str:
    """Geometry-based swarm-backend choice (the ``backend="auto"`` rule of
    `make_swarm_physics`): ``"binned"`` for big spread fleets (N >= min_n
    and mean lattice pitch >= min_pitch — the measured crossover of
    docs/PERF.md round-4b, where the 10 m wake cutoff of BaseAviary.py:801
    makes k << N) or whenever the drone axis shards over a mesh;
    ``"soa"`` otherwise."""
    import numpy as np

    if mesh is not None:
        return "binned"
    if pos is None:
        return "soa"
    pos = np.asarray(pos.pos if hasattr(pos, "pos") else pos)
    if pos.shape[0] < min_n:
        return "soa"
    ext = np.maximum(pos.max(0) - pos.min(0), 1e-6)
    pitch = float(np.prod(ext) ** (1 / 3) / pos.shape[0] ** (1 / 3))
    return "binned" if pitch >= min_pitch else "soa"


def make_swarm_physics(params: DroneParams, dt, n_substeps: int,
                       collisions: bool = False, init_pos=None,
                       backend: str = "auto", mesh: Mesh = None,
                       axis: str = "env", interpret: bool = False,
                       **backend_opts):
    """First-class coupled-swarm factory (VERDICT r4 #1): one entry point,
    uniform ``(init, step, export)`` contract, geometry-based backend
    selection — no environment variables.

      * ``init(kin) -> s`` — backend state from a KinState;
      * ``step(s, rpm_cols) -> s`` — one control period (PYB_DW physics,
        optional drone-drone contact), rpm columns in ORIGINAL drone order;
      * ``export(s, template) -> KinState`` — back to original order.

    ``backend``:
      * ``"soa"`` — dense SoA pair passes with z-sorted tile culling
        (ops/swarm_soa.make_swarm_step_soa). Best at <= ~16k drones or
        dense packs where most pairs genuinely interact.
      * ``"binned"`` — padded xy-cell cell-list layout, O(N*k) pair work
        (ops/swarm_binned). Best for spread fleets (pitch >= ~2 m) at
        scale; the only backend that composes with ``mesh`` (slot axis
        sharded, whole-cell slabs per device).
      * ``"auto"`` — ``binned`` when the fleet is big AND spread
        (N >= 16384 and mean lattice pitch >= 2 m, the measured crossover
        in docs/PERF.md round-4b; the 10 m wake cutoff of
        BaseAviary.py:801 is what makes k << N there), or whenever a
        ``mesh`` is given; ``soa`` otherwise. Requires ``init_pos``
        (an (N, 3) array or the KinState about to be passed to init) to
        judge the geometry — without it, auto picks ``soa`` (mesh: the
        10 m default binning).

    ``backend_opts`` pass through to the backend maker (cell_size/nx/ny/
    cap/resort_every/bt/bs/neighbor_cap for binned; order/resort_every/
    neighbor_cap/bt/bs for the persistently-sorted soa variant via
    ``sorted=True``).
    """
    import numpy as np

    from gym_pybullet_drones_tpu.ops.swarm_binned import (
        binned_geometry,
        make_binned_swarm,
    )
    from gym_pybullet_drones_tpu.ops.swarm_soa import (
        make_sorted_swarm,
        make_swarm_step_soa,
        swarm_soa_from_kin,
        swarm_soa_to_kin,
    )

    pos = init_pos
    if pos is not None and hasattr(pos, "pos"):
        pos = pos.pos
    pos = None if pos is None else np.asarray(pos)

    if backend == "auto":
        backend = select_swarm_backend(pos, mesh=mesh)

    if backend == "binned":
        geo = {k: backend_opts.pop(k) for k in
               ("cell_size", "nx", "ny", "cap") if k in backend_opts}
        if len(geo) < 4:
            if pos is None:
                raise ValueError(
                    "binned backend needs init_pos (or explicit "
                    "cell_size/nx/ny/cap) to size the cell grid")
            cell, nx, ny, cap = binned_geometry(
                pos, **{k: backend_opts.pop(k) for k in
                        ("occ_target", "headroom", "max_cap", "min_cell",
                         "cell") if k in backend_opts})
            auto = dict(cell_size=cell, nx=nx, ny=ny, cap=cap)
            auto.update(geo)  # explicit values win over the auto geometry
            geo = auto
            if mesh is not None:
                while (geo["nx"] * geo["ny"]) % mesh.shape[axis] != 0:
                    geo["ny"] += 1  # pad to whole-cell slabs per device
        return make_binned_swarm(params, dt, n_substeps,
                                 collisions=collisions, interpret=interpret,
                                 mesh=mesh, axis=axis, **geo, **backend_opts)

    if backend == "soa":
        if mesh is not None:
            raise ValueError(
                "the dense soa backend does not shard the drone axis; use "
                "backend='binned' (or make_sharded_swarm_physics for the "
                "AoS rectangular path)")
        if backend_opts.pop("sorted", False):
            return make_sorted_swarm(params, dt, n_substeps,
                                     collisions=collisions,
                                     interpret=interpret, **backend_opts)
        step = make_swarm_step_soa(params, dt, n_substeps,
                                   collisions=collisions,
                                   interpret=interpret, **backend_opts)
        return (swarm_soa_from_kin,
                lambda s, rpm_cols: step(s, rpm_cols),
                swarm_soa_to_kin)

    raise ValueError(f"unknown swarm backend {backend!r}")


def make_big_swarm_physics(params: DroneParams, dt, n_substeps: int,
                           physics: Physics = Physics.PYB_DW,
                           collisions: bool = False,
                           interpret: bool = False,
                           z_sort=None):
    """Single-device large-swarm step using the tiled Pallas pair kernels.

    The dense all-pairs downwash in `substep_pyb` materializes (N, N)
    intermediates — fine to ~8k drones, prohibitive beyond. This variant
    computes the wake sum with `ops/downwash_pallas` (O(N) memory, measured
    70 Gpairs/s at 65k drones) and feeds it into the same substep pipeline
    through `substep_pyb(dw_force_body_z=...)`: the substep's own dw term is
    disabled and the Pallas magnitude joins the force assembly in its place
    (identical accel and resting-contact semantics to the dense term). With
    ``collisions`` the drone-drone contact resolve runs through the analogous
    tiled kernel (`ops/collide_pallas`) after each substep — same order as
    the dense pipeline. ``interpret`` runs the Pallas kernels in interpreter
    mode (CPU tests). ``z_sort`` (default auto: on for fleets >=
    ops.downwash_pallas.Z_SORT_MIN_N) runs every pair pass in z-ascending
    order, which lets the kernels skip provably-masked tiles exactly
    (downwash_pallas docstring); it only reorders the f32 pair sums, so
    force it False when comparing against a fixed summation order on
    ill-conditioned (near-coincident) geometry.
    """
    from gym_pybullet_drones_tpu.ops.collide_pallas import make_collide_pallas
    from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_pallas
    from gym_pybullet_drones_tpu.ops.interact_pallas import make_interact_pallas

    flags = dict(_PYB_FLAGS[physics])
    use_dw = flags.pop("dw")
    dw_fn = (make_downwash_pallas(params, interpret=interpret, z_sort=z_sort)
             if use_dw else None)
    collide_fn = (make_collide_pallas(params, interpret=interpret,
                                      z_sort=z_sort)
                  if collisions else None)
    # With BOTH interactions on, one fused pair pass computes substep k's
    # contact AND substep k+1's wake from the post-integration positions:
    # n+1 passes per control step instead of 2n. NOT exactly the dense
    # pipeline: the dense path feeds substep k+1's wake the post-PUSHOUT
    # positions, so on contacting swarms the fused wake lags by up to one
    # max_push (1 cm) per substep — the stated deviation in
    # ops/interact_pallas.py's header.
    interact_fn = (make_interact_pallas(params, interpret=interpret,
                                        z_sort=z_sort)
                   if (use_dw and collisions) else None)
    collide_last = (make_collide_pallas(params, interpret=interpret,
                                        return_delta=True, z_sort=z_sort)
                    if interact_fn is not None else None)

    if interact_fn is not None:

        @jax.jit
        def step(kin: KinState, rpm, last_rpm):
            mag = dw_fn(kin.pos)  # wake for the first substep
            for k in range(n_substeps):
                kin = substep_pyb(kin, rpm, last_rpm, params, dt,
                                  dw=False, dw_force_body_z=mag, **flags)
                if k < n_substeps - 1:
                    mag, dpos, dvel = interact_fn(kin.pos, kin.vel)
                else:
                    dpos, dvel = collide_last(kin.pos, kin.vel)
                kin = kin.replace(pos=kin.pos + dpos, vel=kin.vel + dvel)
                last_rpm = rpm
            return kin, last_rpm

        return step

    @jax.jit
    def step(kin: KinState, rpm, last_rpm):
        for _ in range(n_substeps):
            # The pair sum is exactly what the dense dw term computes; it
            # joins the substep's force assembly via dw_force_body_z.
            mag = dw_fn(kin.pos) if use_dw else None  # (N,)
            kin = substep_pyb(kin, rpm, last_rpm, params, dt,
                              dw=False, dw_force_body_z=mag, **flags)
            if collide_fn is not None:
                new_pos, new_vel = collide_fn(kin.pos, kin.vel)
                kin = kin.replace(pos=new_pos, vel=new_vel)
            last_rpm = rpm
        return kin, last_rpm

    return step
