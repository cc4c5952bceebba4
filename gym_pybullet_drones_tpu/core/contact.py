"""Sequential-impulse rigid-body contact solver (Bullet-faithful mode).

The reference gets every contact regime — resting, impact, sliding with
friction, tumbling, drone-drone bumps — from Bullet's velocity-level LCP pass
inside ``p.stepSimulation`` (reference BaseAviary.py:370; the collision
cylinder is cf2x.urdf:31-36, the plane is pybullet_data's plane.urdf). This
module is the TPU-native replacement for that pass, selectable alongside the
fast plane clamp via ``AviaryConfig.contact_mode="impulse"``.

What Bullet's btSequentialImpulseConstraintSolver does per step, replicated
here (see docs/PYB_DERIVATION.md §5 for the full derivation):

* Contacts are detected on the PRE-integration pose; velocity impulses are
  solved on the already force-integrated velocities; positions then integrate
  with the corrected velocities (btDiscreteDynamicsWorld order:
  predictUnconstraintMotion -> collision detection -> solveConstraints ->
  integrateTransforms).
* Speculative contacts: a contact with positive separation ``d`` (within the
  breaking threshold, Bullet's gContactBreakingThreshold = 0.02) constrains
  the approach speed to at most ``d/dt`` — a falling body stops exactly at the
  surface instead of tunnelling (setupContactConstraint's
  ``velocityError -= penetration/dt`` branch for positive distance).
* Penetrating contacts get a Baumgarte separating bias ``erp·pen/dt`` after a
  slop allowance (Bullet's shallow-penetration branch; the split-impulse path
  only engages beyond 4 cm penetration, unreachable at 240 Hz substeps —
  documented in PYB_DERIVATION.md).
* Restitution 0 (URDF default), Coulomb friction box-clamped per tangent
  direction against ``mu * lambda_n`` (Bullet box-clamps too), friction rows
  solved after all normal rows within each Gauss-Seidel iteration (Bullet's
  default, SOLVER_INTERLEAVE_CONTACT_AND_FRICTION off).
* Friction coefficients combine multiplicatively (btManifoldResult::
  calculateCombinedFriction): plane.urdf ships 1.0, the drone URDFs default to
  0.5 -> mu_plane = 0.5; drone-drone and drone-obstacle pairs = 0.25.

Documented approximations vs Bullet (bounds in PYB_DERIVATION.md §5):

* The collision cylinder is sampled at ``RIM_SAMPLES`` points per rim instead
  of Bullet's incremental persistent manifold (<= 4 cached support points).
  More simultaneous points, same resting/tumbling statics; rolling-contact
  positions differ within one rim-segment arc (2π r / RIM_SAMPLES ≈ 4.7 cm).
* Two fixed orthogonal friction directions per contact instead of Bullet's
  single direction along the initial slip velocity (a *better* cone cover).
* Drone-drone / drone-obstacle shapes are the circumscribing spheres of the
  collision cylinder footprint (round-2 convention, core/collisions.py).
* No warm starting across substeps: cold-start convergence is covered by the
  iteration count (``n_iter=10``, Bullet's default m_numIterations).

Everything is shaped for XLA: contact sets are static-size and masked, the
Gauss-Seidel sweeps are ``lax.scan`` chains over the contact axis (sequential
within a body — that is the algorithm), and all drones advance in parallel
wherever the physics decouples them (plane and obstacle rows). Pair rows run
the exact Bullet-order sequential scan up to ``PAIR_GS_MAX_N`` drones;
bigger local fleets (round-5, VERDICT r4 #4) use NEIGHBOR-COMPACTED rows —
each drone's ``NBR_K`` nearest candidates with the full normal + friction +
angular row physics, swept as K slot-colored sub-passes per iteration
(Gauss-Seidel across slots; isolated contacting pairs solve identically to
the exact order, pinned in tests/test_contact.py). Candidates come from the
dense N^2 top-k up to ``NBR_MAX_N``; above it ``build_pair_candidates_binned``
builds the SAME candidate rows from a spatial hash grid in O(N*k) — every
in-band partner lands in the 27-cell neighborhood by construction (cell edge
>= selection band), so the solve is bit-identical to the dense builder's
whenever no hash bucket overflows (pinned in tests/test_contact.py). Only
cross-shard partners and env-batched fleets still take the normal-only
masked Jacobi pass (deviation bounded by the core/collisions.py argument).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gym_pybullet_drones_tpu.core.rotations import quat_to_matrix

# Solver constants (Bullet defaults; see module docstring for provenance).
N_ITER = 10          # btContactSolverInfo::m_numIterations
ERP = 0.2            # contact ERP (m_erp2)
SLOP = 0.001         # linear slop: penetration allowance before correction
BREAKING = 0.02      # gContactBreakingThreshold: contact generation distance
MU_PLANE = 0.5       # 1.0 (plane.urdf) x 0.5 (drone URDF default)
MU_PAIR = 0.25       # 0.5 x 0.5
RIM_SAMPLES = 8      # cylinder rim sample points per rim (x2 rims)
PAIR_GS_MAX_N = 16   # fleets above this use the neighbor-compacted rows
NBR_K = 8            # candidate partners per drone in neighbor pair mode
NBR_MAX_N = 16384    # above this the dense candidate top-k is off-budget
                     # (N^2 distance matrix) -> the O(N*k) hash-grid
                     # builder (build_pair_candidates_binned) takes over


def _world_inv_inertia(R, J_inv):
    """I_w^-1 = R J^-1 R^T for (..., N, 3, 3) rotations."""
    return jnp.einsum("...ij,jk,...lk->...il", R, J_inv, R)


def _target_vn(d, dt, erp, slop):
    """Per-contact normal-velocity target (Bullet setupContactConstraint).

    Separated (d_eff > 0): allow approach up to the gap per step (speculative
    contact). Penetrating: Baumgarte separating bias erp*pen/dt.
    """
    d_eff = d + slop
    return jnp.where(d_eff > 0.0, -d_eff / dt, -erp * d_eff / dt)


def _plane_rim_points(params, dtype):
    """(2*RIM_SAMPLES, 3) body-frame sample points on the collision-cylinder
    rims (bottom rim at z_off - h/2, top rim at z_off + h/2)."""
    th = 2.0 * np.pi * np.arange(RIM_SAMPLES) / RIM_SAMPLES
    unit = jnp.asarray(np.stack([np.cos(th), np.sin(th)], -1), dtype)  # (S, 2)
    xy = unit * params.collision_r
    zs = []
    for s in (-1.0, 1.0):
        z = jnp.full((RIM_SAMPLES, 1),
                     params.collision_z_offset + s * params.collision_h / 2.0,
                     dtype)
        zs.append(jnp.concatenate([xy, z], -1))
    return jnp.concatenate(zs, 0)  # (C, 3)


def build_pair_candidates(pos, radius, k=NBR_K, margin=0.05,
                          breaking=BREAKING):
    """Per-drone K-nearest candidate partners for the neighbor pair rows:
    (idx (N, K) int32, in_band (N, K) bool).

    Built from ONE pose and reusable across the substeps of a control
    period (core/dynamics.step_physics does this — Bullet persists contact
    manifolds across solver invocations the same way): ``margin`` extends
    the selection band beyond the contact-generation distance
    (2r + breaking) so pairs that come into contact DURING the period are
    already in the set — 5 cm covers >2 m/s of relative closing speed at
    the 30 Hz control rate. Candidate ORDER (ascending distance at build
    time) fixes the sub-pass sweep order for the whole period."""
    n = pos.shape[0]
    k = min(k, n - 1)
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, -1)
    d2 = jnp.where(jnp.eye(n, dtype=bool),
                   jnp.asarray(jnp.inf, pos.dtype), d2)
    neg_d2, idx = lax.top_k(-d2, k)
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    band = 2.0 * radius + breaking + margin
    return idx, dist < band


def build_pair_candidates_binned(pos, radius, k=NBR_K, margin=0.05,
                                 breaking=BREAKING, cap=16, table_mult=2):
    """O(N*k) replacement for :func:`build_pair_candidates` at swarm scale.

    Same contract — per-drone candidate partners ``(idx (N, K) int32,
    in_band (N, K) bool)`` in ascending build-time distance — built from a
    spatial hash grid instead of the dense N^2 distance matrix (which costs
    17 GB at 65k drones). Cell edge equals the selection band
    (2r + breaking + margin), so every in-band partner is inside the 27-cell
    neighborhood by construction; candidates beyond the band may differ from
    the dense builder's, but those rows are inert in the solver (``act`` and
    the friction-cone limit are both zero), so the solve is bit-identical
    whenever caps hold (tests/test_contact.py pins this at 2048 drones).

    Capacity model: each of the ``table_mult*N`` (pow2) hash buckets holds
    ``cap`` drones; a bucket overflows only when >cap drones occupy one
    band-sized (~0.19 m for CF2X) cell or distinct cells collide under the
    hash — overflowed drones silently stop being *found* as partners (their
    own rows still solve). cap=16 covers ~2x the densest physical sphere
    packing of CF2X collision radii in one cell.

    Mirrors Bullet's broadphase role (btDbvtBroadphase culls the pair set
    before the narrowphase/solver at BaseAviary.py:370); persistence across
    the control period follows build_pair_candidates' margin argument.
    """
    n = pos.shape[0]
    k = min(k, n - 1)
    if k <= 0:
        return (jnp.zeros((n, 0), jnp.int32), jnp.zeros((n, 0), bool))
    band = 2.0 * radius + breaking + margin
    cells = jnp.floor(pos / band).astype(jnp.int32)            # (N, 3)
    n_buckets = max(64, 1 << int(np.ceil(np.log2(max(table_mult * n, 2)))))

    def _hash(c):
        h = (c[..., 0] * np.int32(73856093)
             ^ c[..., 1] * np.int32(19349663)
             ^ c[..., 2] * np.int32(83492791))
        return h & np.int32(n_buckets - 1)

    # Build: sort by bucket, rank within the bucket's run, scatter ids into
    # bucket*cap + rank slots (rank >= cap drops into a shared spill slot).
    hb = _hash(cells)                                          # (N,)
    order = jnp.argsort(hb).astype(jnp.int32)
    hs = hb[order]
    rank = (jnp.arange(n, dtype=jnp.int32)
            - jnp.searchsorted(hs, hs, side="left").astype(jnp.int32))
    slot = jnp.where(rank < cap, hs * cap + rank, n_buckets * cap)
    table = jnp.full((n_buckets * cap + 1,), -1, jnp.int32).at[slot].set(order)

    # Query: 27 neighbor cells -> buckets (deduped: a repeated bucket id in
    # the stencil reads identical slots, which would duplicate pair rows and
    # double the friction-cone budget) -> gather cap ids each -> true
    # distances -> top-k ascending, matching the dense builder's row order.
    # Everything stays 2-D (N, M): a trailing size-3 axis lane-pads 3->128
    # on TPU and the (N, 27*cap, 3) gathered-position intermediate was a
    # 29 GB compile-time OOM at 131k drones.
    hx = cells[:, 0] * np.int32(73856093)
    hy = cells[:, 1] * np.int32(19349663)
    hz = cells[:, 2] * np.int32(83492791)
    qb = jnp.stack(
        [(hx + np.int32(dx * 73856093))
         ^ (hy + np.int32(dy * 19349663))
         ^ (hz + np.int32(dz * 83492791))
         for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        axis=1) & np.int32(n_buckets - 1)                          # (N, 27)
    dup = jnp.any((qb[:, :, None] == qb[:, None, :])
                  & (np.arange(27)[None, :, None]
                     > np.arange(27)[None, None, :]), -1)          # (N, 27)
    slots = (jnp.repeat(qb, cap, axis=1) * cap
             + jnp.tile(jnp.arange(cap, dtype=jnp.int32), 27)[None, :])
    cand = jnp.where(jnp.repeat(dup, cap, axis=1), -1, table[slots])
    safe = jnp.maximum(cand, 0)                                    # (N, M)
    d2 = jnp.zeros(cand.shape, pos.dtype)
    for axis in range(3):
        comp = pos[:, axis]
        d2 = d2 + (comp[:, None] - comp[safe]) ** 2
    bad = (cand < 0) | (cand == jnp.arange(n, dtype=jnp.int32)[:, None])
    d2 = jnp.where(bad, jnp.asarray(jnp.inf, pos.dtype), d2)
    neg_d2, sel = lax.top_k(-d2, k)
    idx = jnp.maximum(jnp.take_along_axis(cand, sel, 1), 0)
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    return idx, dist < band


def _orthonormal_tangents(n):
    """Two unit tangents orthogonal to n (..., 3); robust near n = ±z."""
    z = jnp.zeros_like(n)
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                    z.at[..., 2].set(1.0), z.at[..., 0].set(1.0))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def solve_contacts(
    pos,
    quat,
    vel,
    ang_v,
    params,
    dt,
    *,
    drone_drone=False,
    other_pos=None,
    other_vel=None,
    obstacles=None,
    pair_candidates=None,
    n_iter=N_ITER,
    erp=ERP,
    slop=SLOP,
    breaking=BREAKING,
    mu_plane=MU_PLANE,
    mu_pair=MU_PAIR,
):
    """One Bullet-style sequential-impulse pass; returns (vel', ang_v').

    pos/quat/vel/ang_v: (..., N, dim) PRE-integration pose with the
    force-integrated (unconstrained) velocities. ``obstacles`` is an
    ``ObstacleSet`` (core/collisions.py) of static bodies — boxes
    (nonzero half-extents; closest-point contact) and spheres. ``other_pos`` /
    ``other_vel`` optionally supply cross-shard partner drones for the pair
    rows (sharded swarms; Jacobi mode only, the partners' own velocities are
    corrected on their home shard). ``pair_candidates`` — a
    `build_pair_candidates` result built from an earlier pose of the SAME
    control period: skips the per-call O(N^2) candidate top-k (the dominant
    cost of the neighbor pair mode); row geometry, distances and activity
    are still recomputed FRESH from the current pose.
    """
    dtype = pos.dtype
    n_drones = pos.shape[-2]
    R = quat_to_matrix(quat)
    inv_m = 1.0 / params.m
    I_inv_w = _world_inv_inertia(R, params.J_inv)  # (..., N, 3, 3)

    # ---- plane contact rows (cylinder rim samples vs z = 0) ---------------
    pts_body = _plane_rim_points(params, dtype)  # (C, 3)
    r_pl = jnp.einsum("...nij,cj->...nci", R, pts_body)  # lever arms (...,N,C,3)
    d_pl = pos[..., 2][..., None] + r_pl[..., 2]  # point height above plane
    active_pl = (d_pl < breaking).astype(dtype)
    target_pl = _target_vn(d_pl, dt, erp, slop)
    # Angular jacobians for n = z, t1 = x, t2 = y (constant world axes).
    rxn = jnp.stack([r_pl[..., 1], -r_pl[..., 0], jnp.zeros_like(d_pl)], -1)
    rxt1 = jnp.stack([jnp.zeros_like(d_pl), r_pl[..., 2], -r_pl[..., 1]], -1)
    rxt2 = jnp.stack([-r_pl[..., 2], jnp.zeros_like(d_pl), r_pl[..., 0]], -1)
    Jn = jnp.einsum("...nij,...ncj->...nci", I_inv_w, rxn)
    Jt1 = jnp.einsum("...nij,...ncj->...nci", I_inv_w, rxt1)
    Jt2 = jnp.einsum("...nij,...ncj->...nci", I_inv_w, rxt2)
    kn_inv_pl = 1.0 / (inv_m + jnp.einsum("...ci,...ci->...c", rxn, Jn))
    kt1_inv_pl = 1.0 / (inv_m + jnp.einsum("...ci,...ci->...c", rxt1, Jt1))
    kt2_inv_pl = 1.0 / (inv_m + jnp.einsum("...ci,...ci->...c", rxt2, Jt2))

    def cm(a):  # contact axis (-2 for scalars-per-contact) to scan-major
        return jnp.moveaxis(a, -1, 0)

    def cmv(a):  # vector-per-contact (..., N, C, 3) -> (C, ..., N, 3)
        return jnp.moveaxis(a, -2, 0)

    plane_xs_n = (cmv(r_pl), cmv(Jn), cm(kn_inv_pl), cm(target_pl),
                  cm(active_pl))
    plane_xs_f = (cmv(r_pl), cmv(Jt1), cmv(Jt2), cm(kt1_inv_pl),
                  cm(kt2_inv_pl), cm(active_pl))

    def plane_normal_sweep(vel, ang_v, lam):
        def step(carry, xs):
            vel, ang_v = carry
            r, Jn_c, kinv, tgt, act, lam_c = xs
            u_n = vel[..., 2] + ang_v[..., 0] * r[..., 1] - ang_v[..., 1] * r[..., 0]
            dlam = (tgt - u_n) * kinv * act
            new_lam = jnp.maximum(lam_c + dlam, 0.0)
            applied = new_lam - lam_c
            vel = vel.at[..., 2].add(applied * inv_m)
            ang_v = ang_v + applied[..., None] * Jn_c
            return (vel, ang_v), new_lam

        (vel, ang_v), lam = lax.scan(step, (vel, ang_v), plane_xs_n + (lam,))
        return vel, ang_v, lam

    def plane_friction_sweep(vel, ang_v, lam_n, lam_t1, lam_t2):
        def step(carry, xs):
            vel, ang_v = carry
            (r, Jt1_c, Jt2_c, k1inv, k2inv, act, ln, l1, l2) = xs
            limit = mu_plane * ln
            # t1 = world x
            u = vel + jnp.cross(ang_v, r)
            dlam = -u[..., 0] * k1inv * act
            new1 = jnp.clip(l1 + dlam, -limit, limit)
            a1 = new1 - l1
            vel = vel.at[..., 0].add(a1 * inv_m)
            ang_v = ang_v + a1[..., None] * Jt1_c
            # t2 = world y (recompute slip velocity after the t1 row)
            u = vel + jnp.cross(ang_v, r)
            dlam = -u[..., 1] * k2inv * act
            new2 = jnp.clip(l2 + dlam, -limit, limit)
            a2 = new2 - l2
            vel = vel.at[..., 1].add(a2 * inv_m)
            ang_v = ang_v + a2[..., None] * Jt2_c
            return (vel, ang_v), (new1, new2)

        (vel, ang_v), (lam_t1, lam_t2) = lax.scan(
            step, (vel, ang_v), plane_xs_f + (lam_n, lam_t1, lam_t2))
        return vel, ang_v, lam_t1, lam_t2

    # ---- drone-drone pair rows (collision spheres) ------------------------
    # Three regimes (round-5, VERDICT r4 #4):
    #   * n <= PAIR_GS_MAX_N: exact Bullet-order sequential sweep (triu scan);
    #   * PAIR_GS_MAX_N < n <= NBR_MAX_N, unbatched, local: neighbor-
    #     compacted rows — each drone's NBR_K nearest candidates (contact
    #     reach 2r + breaking = 0.14 m << any sane spacing, so K bounds the
    #     simultaneous-contact count; kissing adversaries need K raised),
    #     full normal+friction+angular physics, swept as K slot-colored
    #     sub-passes per iteration: sub-pass k solves every drone's k-th row
    #     in parallel reading the freshest velocities from sub-passes < k —
    #     Gauss-Seidel across slots, Jacobi only within a slot's rare
    #     owner collisions (scatter-adds accumulate);
    #   * beyond / cross-shard (other_pos) / env-batched: the normal-only
    #     Jacobi projection pass (partners' own velocities are corrected on
    #     their home shard, so sequential sweeps cannot apply).
    use_pairs = drone_drone and (n_drones > 1 or other_pos is not None)
    pair_jacobi = (n_drones > PAIR_GS_MAX_N) or (other_pos is not None)
    pair_nbr = (pair_jacobi and other_pos is None and pos.ndim == 2
                and (n_drones <= NBR_MAX_N or pair_candidates is not None))
    radius = params.collision_r
    if use_pairs and not pair_jacobi:
        iu = np.triu_indices(n_drones, k=1)
        pi = jnp.asarray(iu[0]); pj = jnp.asarray(iu[1])
        ci = jnp.take(pos, pi, axis=-2); cj = jnp.take(pos, pj, axis=-2)
        delta = ci - cj
        dist = jnp.linalg.norm(delta, axis=-1)
        n_pair = delta / jnp.maximum(dist, 1e-9)[..., None]  # toward i
        d_pair = dist - 2.0 * radius
        act_pair = (d_pair < breaking).astype(dtype)
        tgt_pair = _target_vn(d_pair, dt, erp, slop)
        point = 0.5 * (ci + cj)
        r_i = point - ci
        r_j = point - cj
        t1p, t2p = _orthonormal_tangents(n_pair)
        Ii = jnp.take(I_inv_w, pi, axis=-3)
        Ij = jnp.take(I_inv_w, pj, axis=-3)

        def _jac(Iw, r, axis):
            return jnp.einsum("...ij,...j->...i", Iw, jnp.cross(r, axis))

        def _kinv(Ji_, Jj_, r_i_, r_j_, axis):
            k = (2.0 * inv_m
                 + jnp.einsum("...i,...i->...", jnp.cross(r_i_, axis), Ji_)
                 + jnp.einsum("...i,...i->...", jnp.cross(r_j_, axis), Jj_))
            return 1.0 / k

        Jn_i = _jac(Ii, r_i, n_pair); Jn_j = _jac(Ij, r_j, n_pair)
        Jt1_i = _jac(Ii, r_i, t1p); Jt1_j = _jac(Ij, r_j, t1p)
        Jt2_i = _jac(Ii, r_i, t2p); Jt2_j = _jac(Ij, r_j, t2p)
        kn_inv_p = _kinv(Jn_i, Jn_j, r_i, r_j, n_pair)
        kt1_inv_p = _kinv(Jt1_i, Jt1_j, r_i, r_j, t1p)
        kt2_inv_p = _kinv(Jt2_i, Jt2_j, r_i, r_j, t2p)

        def pm(a):  # pair axis to scan-major: (..., P[, 3]) -> (P, ...[, 3])
            ax = -1 if a.ndim == d_pair.ndim else -2
            return jnp.moveaxis(a, ax, 0)

        pair_static = (pi, pj)
        pair_xs = tuple(map(pm, (n_pair, t1p, t2p, r_i, r_j, Jn_i, Jn_j,
                                 Jt1_i, Jt1_j, Jt2_i, Jt2_j, kn_inv_p,
                                 kt1_inv_p, kt2_inv_p, tgt_pair, act_pair)))

        def _u_rel(vel, ang_v, i, j, r_i_, r_j_):
            vi = vel[..., i, :] + jnp.cross(ang_v[..., i, :], r_i_)
            vj = vel[..., j, :] + jnp.cross(ang_v[..., j, :], r_j_)
            return vi - vj

        def pair_normal_sweep(vel, ang_v, lam):
            def step(carry, xs):
                vel, ang_v = carry
                (i, j, n, r_i_, r_j_, Jni, Jnj, kinv, tgt, act, lam_c) = xs
                u = _u_rel(vel, ang_v, i, j, r_i_, r_j_)
                un = jnp.sum(u * n, -1)
                dlam = (tgt - un) * kinv * act
                new = jnp.maximum(lam_c + dlam, 0.0)
                a = new - lam_c
                imp = a[..., None] * n * inv_m
                vel = vel.at[..., i, :].add(imp).at[..., j, :].add(-imp)
                ang_v = (ang_v.at[..., i, :].add(a[..., None] * Jni)
                         .at[..., j, :].add(-a[..., None] * Jnj))
                return (vel, ang_v), new

            xs = (pair_static[0], pair_static[1], pair_xs[0], pair_xs[3],
                  pair_xs[4], pair_xs[5], pair_xs[6], pair_xs[11],
                  pair_xs[14], pair_xs[15], lam)
            (vel, ang_v), lam = lax.scan(step, (vel, ang_v), xs)
            return vel, ang_v, lam

        def pair_friction_sweep(vel, ang_v, lam_n, lam_t1, lam_t2):
            def step(carry, xs):
                vel, ang_v = carry
                (i, j, t1, t2, r_i_, r_j_, J1i, J1j, J2i, J2j, k1inv, k2inv,
                 act, ln, l1, l2) = xs
                limit = mu_pair * ln
                out = []
                for t, Jti, Jtj, kinv, l in ((t1, J1i, J1j, k1inv, l1),
                                             (t2, J2i, J2j, k2inv, l2)):
                    u = _u_rel(vel, ang_v, i, j, r_i_, r_j_)
                    ut = jnp.sum(u * t, -1)
                    dlam = -ut * kinv * act
                    new = jnp.clip(l + dlam, -limit, limit)
                    a = new - l
                    imp = a[..., None] * t * inv_m
                    vel = vel.at[..., i, :].add(imp).at[..., j, :].add(-imp)
                    ang_v = (ang_v.at[..., i, :].add(a[..., None] * Jti)
                             .at[..., j, :].add(-a[..., None] * Jtj))
                    out.append(new)
                return (vel, ang_v), (out[0], out[1])

            xs = (pair_static[0], pair_static[1], pair_xs[1], pair_xs[2],
                  pair_xs[3], pair_xs[4], pair_xs[7], pair_xs[8], pair_xs[9],
                  pair_xs[10], pair_xs[12], pair_xs[13], pair_xs[15],
                  lam_n, lam_t1, lam_t2)
            (vel, ang_v), (lam_t1, lam_t2) = lax.scan(step, (vel, ang_v), xs)
            return vel, ang_v, lam_t1, lam_t2

        n_pairs = len(iu[0])
    elif use_pairs and pair_nbr:
        # Neighbor-compacted pair rows: K nearest candidates per drone from
        # the dense distance matrix (O(N^2) build, O(N*K) rows/solve). Each
        # contacting pair appears once, owned by its smaller index (the
        # partner is in the owner's K-nearest by symmetry of distance).
        if pair_candidates is not None:
            # Candidate set persisted across the control period (see
            # build_pair_candidates): only the INDICES are stale — row
            # geometry, distances and activity recompute fresh below.
            nbr_idx = pair_candidates[0].astype(jnp.int32)
            K = nbr_idx.shape[-1]
            pos_j = pos[nbr_idx]                   # (N, K, 3)
            dfr = pos[:, None, :] - pos_j
            nbr_dist = jnp.sqrt(jnp.maximum(jnp.sum(dfr * dfr, -1), 0.0))
        else:
            K = min(NBR_K, n_drones - 1)
            d2_full = jnp.sum(
                (pos[:, None, :] - pos[None, :, :]) ** 2, -1)
            d2_full = jnp.where(jnp.eye(n_drones, dtype=bool),
                                jnp.asarray(jnp.inf, dtype), d2_full)
            neg_d2, nbr_idx = lax.top_k(-d2_full, K)  # ascending distance
            nbr_dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
            pos_j = pos[nbr_idx]                   # (N, K, 3)
        i_col = jnp.arange(n_drones)[:, None]
        d_nbr = nbr_dist - 2.0 * radius
        own = (nbr_idx > i_col) & (d_nbr < breaking)
        act_nbr = own.astype(dtype)
        tgt_nbr = _target_vn(d_nbr, dt, erp, slop)

        delta_n = pos[:, None, :] - pos_j          # ci - cj
        n_nbr = delta_n / jnp.maximum(nbr_dist, 1e-9)[..., None]  # toward i
        r_i_n = -0.5 * delta_n                     # midpoint - ci
        r_j_n = 0.5 * delta_n                      # midpoint - cj
        t1_n, t2_n = _orthonormal_tangents(n_nbr)
        Ii_n = I_inv_w[:, None, :, :]              # (N, 1, 3, 3)
        Ij_n = I_inv_w[nbr_idx]                    # (N, K, 3, 3)

        def _jac_n(Iw, r, axis):
            return jnp.einsum("...ij,...j->...i", Iw, jnp.cross(r, axis))

        def _kinv_n(Ji_, Jj_, axis):
            k = (2.0 * inv_m
                 + jnp.einsum("...i,...i->...", jnp.cross(r_i_n, axis), Ji_)
                 + jnp.einsum("...i,...i->...", jnp.cross(r_j_n, axis), Jj_))
            return 1.0 / k

        Jn_in = _jac_n(Ii_n, r_i_n, n_nbr); Jn_jn = _jac_n(Ij_n, r_j_n, n_nbr)
        J1_in = _jac_n(Ii_n, r_i_n, t1_n); J1_jn = _jac_n(Ij_n, r_j_n, t1_n)
        J2_in = _jac_n(Ii_n, r_i_n, t2_n); J2_jn = _jac_n(Ij_n, r_j_n, t2_n)
        kn_inv_n = _kinv_n(Jn_in, Jn_jn, n_nbr)
        k1_inv_n = _kinv_n(J1_in, J1_jn, t1_n)
        k2_inv_n = _kinv_n(J2_in, J2_jn, t2_n)

        def _u_rel_n(vel, ang_v, k):
            jk = nbr_idx[:, k]
            u_i = vel + jnp.cross(ang_v, r_i_n[:, k])
            u_j = vel[jk] + jnp.cross(ang_v[jk], r_j_n[:, k])
            return u_i - u_j, jk

        def nbr_normal_sweep(vel, ang_v, lam):
            for k in range(K):
                u, jk = _u_rel_n(vel, ang_v, k)
                un = jnp.sum(u * n_nbr[:, k], -1)
                dlam = (tgt_nbr[:, k] - un) * kn_inv_n[:, k] * act_nbr[:, k]
                new = jnp.maximum(lam[:, k] + dlam, 0.0)
                a = new - lam[:, k]
                imp = a[:, None] * n_nbr[:, k] * inv_m
                vel = (vel + imp).at[jk].add(-imp)
                ang_v = (ang_v + a[:, None] * Jn_in[:, k]).at[jk].add(
                    -a[:, None] * Jn_jn[:, k])
                lam = lam.at[:, k].set(new)
            return vel, ang_v, lam

        def nbr_friction_sweep(vel, ang_v, lam_n, lam_t1, lam_t2):
            for k in range(K):
                limit = mu_pair * lam_n[:, k]
                for t, Jti, Jtj, kinv, lam_t in (
                        (t1_n, J1_in, J1_jn, k1_inv_n, lam_t1),
                        (t2_n, J2_in, J2_jn, k2_inv_n, lam_t2)):
                    u, jk = _u_rel_n(vel, ang_v, k)
                    ut = jnp.sum(u * t[:, k], -1)
                    dlam = -ut * kinv[:, k] * act_nbr[:, k]
                    new = jnp.clip(lam_t[:, k] + dlam, -limit, limit)
                    a = new - lam_t[:, k]
                    imp = a[:, None] * t[:, k] * inv_m
                    vel = (vel + imp).at[jk].add(-imp)
                    ang_v = (ang_v + a[:, None] * Jti[:, k]).at[jk].add(
                        -a[:, None] * Jtj[:, k])
                    if lam_t is lam_t1:
                        lam_t1 = lam_t1.at[:, k].set(new)
                    else:
                        lam_t2 = lam_t2.at[:, k].set(new)
            return vel, ang_v, lam_t1, lam_t2

        n_pairs = K
    elif use_pairs:
        # Jacobi fallback (swarm scale / cross-shard): all pair rows computed
        # from the same iterate and applied summed — Bullet's strict sweep
        # order is traded for a dense vectorized pass (core/collisions.py has
        # the convergence argument; n_iter iterations supply the sweeps).
        src_pos = pos if other_pos is None else other_pos
        src_vel = vel if other_vel is None else other_vel
        delta = pos[..., :, None, :] - src_pos[..., None, :, :]  # (...,N,M,3)
        dist = jnp.linalg.norm(delta, axis=-1)
        n_mat = delta / jnp.maximum(dist, 1e-9)[..., None]
        d_mat = dist - 2.0 * radius
        self_mask = (dist > 1e-9).astype(dtype)
        act_mat = (d_mat < breaking).astype(dtype) * self_mask
        tgt_mat = _target_vn(d_mat, dt, erp, slop)
        # Sphere contact at the midpoint: r = -radius * n per body; with the
        # equal-mass equal-radius geometry the angular terms cancel in the
        # normal row (r x n = 0 for central contacts) — normal-only Jacobi,
        # matching core/collisions.py's projection but impulse-accumulated.
        kn_inv_mat = 1.0 / (2.0 * inv_m)

        def pair_jacobi_pass(vel, ang_v, lam):
            v_src = vel if other_vel is None else src_vel
            u = vel[..., :, None, :] - v_src[..., None, :, :]
            un = jnp.sum(u * n_mat, -1)
            dlam = (tgt_mat - un) * kn_inv_mat * act_mat
            new = jnp.maximum(lam + dlam, 0.0)
            a = new - lam
            vel = vel + jnp.sum(a[..., None] * n_mat, -2) * inv_m
            return vel, ang_v, new

        n_pairs = d_mat.shape[-1]

    # ---- obstacle rows (drone sphere vs static boxes/spheres) -------------
    if obstacles is not None:
        from gym_pybullet_drones_tpu.core.collisions import obstacle_delta

        # Sphere-vs-rounded-box: the normal runs from the closest point on
        # the obstacle's box core (spheres: the center — zero half-extents
        # degenerate exactly) to the drone center; centers INSIDE a box core
        # fall back to the center direction with full penetration depth
        # (obstacle_delta docstring).
        delta_o, inside_o = obstacle_delta(pos, obstacles)  # (..., N, M, 3)
        raw_dist_o = jnp.linalg.norm(delta_o, axis=-1)  # fallback: nonzero
        dist_o = jnp.where(inside_o, 0.0, raw_dist_o)
        n_obs = delta_o / jnp.maximum(raw_dist_o, 1e-9)[..., None]
        d_obs = dist_o - (radius + obstacles.radius)
        act_obs = (d_obs < breaking).astype(dtype)
        tgt_obs = _target_vn(d_obs, dt, erp, slop)
        r_obs = -radius * n_obs  # contact point on the drone sphere
        t1o, t2o = _orthonormal_tangents(n_obs)

        def _jac_o(r, axis):
            return jnp.einsum("...nij,...nmj->...nmi", I_inv_w,
                              jnp.cross(r, axis))

        Jn_o = _jac_o(r_obs, n_obs)
        Jt1_o = _jac_o(r_obs, t1o)
        Jt2_o = _jac_o(r_obs, t2o)

        def _kinv_o(J, r, axis):
            return 1.0 / (inv_m + jnp.einsum("...i,...i->...",
                                             jnp.cross(r, axis), J))

        kn_inv_o = _kinv_o(Jn_o, r_obs, n_obs)
        kt1_inv_o = _kinv_o(Jt1_o, r_obs, t1o)
        kt2_inv_o = _kinv_o(Jt2_o, r_obs, t2o)

        def om(a):  # obstacle axis to scan-major
            ax = -1 if a.ndim == d_obs.ndim else -2
            return jnp.moveaxis(a, ax, 0)

        obs_xs = tuple(map(om, (n_obs, t1o, t2o, r_obs, Jn_o, Jt1_o, Jt2_o,
                                kn_inv_o, kt1_inv_o, kt2_inv_o, tgt_obs,
                                act_obs)))

        def obstacle_normal_sweep(vel, ang_v, lam):
            def step(carry, xs):
                vel, ang_v = carry
                (n, r, Jn_c, kinv, tgt, act, lam_c) = xs
                u = vel + jnp.cross(ang_v, r)
                un = jnp.sum(u * n, -1)
                dlam = (tgt - un) * kinv * act
                new = jnp.maximum(lam_c + dlam, 0.0)
                a = new - lam_c
                vel = vel + a[..., None] * n * inv_m
                ang_v = ang_v + a[..., None] * Jn_c
                return (vel, ang_v), new

            xs = (obs_xs[0], obs_xs[3], obs_xs[4], obs_xs[7], obs_xs[10],
                  obs_xs[11], lam)
            (vel, ang_v), lam = lax.scan(step, (vel, ang_v), xs)
            return vel, ang_v, lam

        def obstacle_friction_sweep(vel, ang_v, lam_n, lam_t1, lam_t2):
            def step(carry, xs):
                vel, ang_v = carry
                (t1, t2, r, J1, J2, k1inv, k2inv, act, ln, l1, l2) = xs
                limit = mu_pair * ln
                outs = []
                for t, Jt, kinv, l in ((t1, J1, k1inv, l1), (t2, J2, k2inv, l2)):
                    u = vel + jnp.cross(ang_v, r)
                    ut = jnp.sum(u * t, -1)
                    dlam = -ut * kinv * act
                    new = jnp.clip(l + dlam, -limit, limit)
                    a = new - l
                    vel = vel + a[..., None] * t * inv_m
                    ang_v = ang_v + a[..., None] * Jt
                    outs.append(new)
                return (vel, ang_v), (outs[0], outs[1])

            xs = (obs_xs[1], obs_xs[2], obs_xs[3], obs_xs[5], obs_xs[6],
                  obs_xs[8], obs_xs[9], obs_xs[11], lam_n, lam_t1, lam_t2)
            (vel, ang_v), (lam_t1, lam_t2) = lax.scan(step, (vel, ang_v), xs)
            return vel, ang_v, lam_t1, lam_t2

        n_obstacles = obstacles.pos.shape[0]

    # ---- Gauss-Seidel iterations ------------------------------------------
    batch = d_pl.shape[:-1]  # (..., N)
    n_contacts_pl = 2 * RIM_SAMPLES
    lam0 = dict(
        pl_n=jnp.zeros((n_contacts_pl,) + batch, dtype),
        pl_t1=jnp.zeros((n_contacts_pl,) + batch, dtype),
        pl_t2=jnp.zeros((n_contacts_pl,) + batch, dtype),
    )
    if use_pairs and not pair_jacobi:
        pshape = (n_pairs,) + batch[:-1]
        lam0.update(p_n=jnp.zeros(pshape, dtype),
                    p_t1=jnp.zeros(pshape, dtype),
                    p_t2=jnp.zeros(pshape, dtype))
    elif use_pairs and pair_nbr:
        nshape = batch + (n_pairs,)  # (N, K)
        lam0.update(p_n=jnp.zeros(nshape, dtype),
                    p_t1=jnp.zeros(nshape, dtype),
                    p_t2=jnp.zeros(nshape, dtype))
    elif use_pairs:
        lam0.update(p_n=jnp.zeros(batch + (n_pairs,), dtype))
    if obstacles is not None:
        oshape = (n_obstacles,) + batch
        lam0.update(o_n=jnp.zeros(oshape, dtype),
                    o_t1=jnp.zeros(oshape, dtype),
                    o_t2=jnp.zeros(oshape, dtype))

    def body(_, carry):
        vel, ang_v, lam = carry
        lam = dict(lam)
        vel, ang_v, lam["pl_n"] = plane_normal_sweep(vel, ang_v, lam["pl_n"])
        if use_pairs and not pair_jacobi:
            vel, ang_v, lam["p_n"] = pair_normal_sweep(vel, ang_v, lam["p_n"])
        elif use_pairs and pair_nbr:
            vel, ang_v, lam["p_n"] = nbr_normal_sweep(vel, ang_v, lam["p_n"])
        elif use_pairs:
            vel, ang_v, lam["p_n"] = pair_jacobi_pass(vel, ang_v, lam["p_n"])
        if obstacles is not None:
            vel, ang_v, lam["o_n"] = obstacle_normal_sweep(
                vel, ang_v, lam["o_n"])
        vel, ang_v, lam["pl_t1"], lam["pl_t2"] = plane_friction_sweep(
            vel, ang_v, lam["pl_n"], lam["pl_t1"], lam["pl_t2"])
        if use_pairs and not pair_jacobi:
            vel, ang_v, lam["p_t1"], lam["p_t2"] = pair_friction_sweep(
                vel, ang_v, lam["p_n"], lam["p_t1"], lam["p_t2"])
        elif use_pairs and pair_nbr:
            vel, ang_v, lam["p_t1"], lam["p_t2"] = nbr_friction_sweep(
                vel, ang_v, lam["p_n"], lam["p_t1"], lam["p_t2"])
        if obstacles is not None:
            vel, ang_v, lam["o_t1"], lam["o_t2"] = obstacle_friction_sweep(
                vel, ang_v, lam["o_n"], lam["o_t1"], lam["o_t2"])
        return vel, ang_v, lam

    vel, ang_v, _ = lax.fori_loop(0, n_iter, body, (vel, ang_v, lam0))
    return vel, ang_v
