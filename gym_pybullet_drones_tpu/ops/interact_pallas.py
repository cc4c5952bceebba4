"""Fused drone-interaction Pallas kernel: downwash + contact in ONE pair pass.

`ops/downwash_pallas.py` and `ops/collide_pallas.py` each tile the O(N^2)
pair space; running both per substep walks every pair twice and loads the
position columns twice. This kernel computes both interactions from one
(BT, BS) tile — the pair deltas/distances are shared — cutting the pair-pass
cost of a contact-enabled coupled swarm by ~2x. Arithmetic is the
squared-distance/rsqrt form of `core/aero.downwash_forces_body_z`
(BaseAviary._downwash, :798-811) and
`core/collisions.resolve_drone_collisions` — algebraically identical,
parity-tested against the dense path at 1e-4.

Outputs per target drone: wake magnitude (N,), position pushout (N, 3),
velocity correction (N, 3).

Stated deviation from the dense pipeline: the wake magnitude is computed from
the same (pre-contact-correction) positions as the contact pass, while the
dense path feeds the NEXT substep's wake the post-correction positions. The
difference exists only for drones in active contact; in the wake model's
regular regime it is bounded by the per-substep pushout (max_push = 1 cm)
through the wake's spatial gradient. In the *ill-conditioned* regime —
near-coincident drones where the 1/dz^2 magnitude and the dz>0 mask are
chaotic in position (see the note at tests/test_rollout.py:228) — ANY
reordering (this one included) diverges from dense, as dense itself diverges
under f32 reassociation there. Contact-free and co-planar-contact swarms
match dense to round-off (tests/test_collisions.py).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_drones_tpu.core.params import DroneParams

_BT = 256
_BS = None


def make_interact_pallas(params: DroneParams, bt: int = _BT, bs=_BS,
                         max_push: float = 0.01, interpret: bool = False,
                         z_sort=None):
    """Build `interact(pos, vel) -> (dw_mag, dpos, dvel)` for (N, 3) fleets
    (block sizes clamp to legal divisors per call — spatial.fit_block).

    ``z_sort``: internally sort by altitude and scatter results back. Two
    exact tile-level culls then apply (see downwash_pallas / collide_pallas
    for the derivations and the f32-reorder caveat): the wake section is
    skipped on tiles entirely below the sorted diagonal (dz <= 0 everywhere),
    and the contact section on tiles whose block z-intervals are more than
    min_dist apart. The shared pair deltas are recomputed per live section —
    a few elementwise ops against an entire section's math skipped.
    Default ``None`` = auto: sort when N >= downwash_pallas.Z_SORT_MIN_N."""
    from gym_pybullet_drones_tpu.ops.downwash_pallas import Z_SORT_MIN_N

    c2 = float(params.dw_coeff_2)
    c3 = float(params.dw_coeff_3)
    # alpha = c1 * (pr / (4 dz))^2 = K / dz^2 with the constant prefolded
    K = float(params.dw_coeff_1) * float(params.prop_radius) ** 2 / 16.0
    min_dist = 2.0 * float(params.collision_r)
    eps = 1e-9

    def make_kernel(use_sort, bt_e, bs_e):
        return lambda *refs: kernel(use_sort, bt_e, bs_e, *refs)

    def kernel(use_sort, bt_e, bs_e, xt, yt, zt, vxt, vyt, vzt,
               xs, ys, zs, vxs, vys, vzs,
               dw, dpx, dpy, dpz, dvx, dvy, dvz):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            for o in (dw, dpx, dpy, dpz, dvx, dvy, dvz):
                o[:] = jnp.zeros_like(o)

        def wake_math():
            # Pair geometry, squared-distance form: the lateral cutoff and
            # the Gaussian consume dxy^2 — no sqrt per pair.
            dxs = xs[:] - xt[:]   # source minus target (downwash convention)
            dys = ys[:] - yt[:]
            dzs = zs[:] - zt[:]
            dxy2 = dxs * dxs + dys * dys

            # Downwash: sources strictly above within 10 m lateral
            safe_dz = jnp.where(dzs > 0, dzs, 1.0)
            alpha = K / (safe_dz * safe_dz)
            beta = c2 * safe_dz + c3
            safe_beta2 = jnp.where(jnp.abs(beta) > 1e-12, beta * beta, 1.0)
            mag = alpha * jnp.exp(-0.5 * dxy2 / safe_beta2)
            wake = jnp.where((dzs > 0) & (dxy2 < 100.0), mag, 0.0)
            dw[:] -= jnp.sum(wake, axis=1, keepdims=True)

        def contact_math():
            # Contact: normal points from source toward target = -delta;
            # rsqrt(d2) yields the normal and (d2*inv) the distance.
            dxs = xs[:] - xt[:]
            dys = ys[:] - yt[:]
            dzs = zs[:] - zt[:]
            d2 = dxs * dxs + dys * dys + dzs * dzs
            contact = (d2 < min_dist * min_dist) & (d2 > eps * eps)
            inv = jax.lax.rsqrt(jnp.maximum(d2, eps * eps))
            dist = d2 * inv
            overlap = jnp.where(contact, min_dist - dist, 0.0)
            nx, ny, nz = -dxs * inv, -dys * inv, -dzs * inv
            push = jnp.minimum(0.5 * overlap, max_push)
            dpx[:] += jnp.sum(push * nx, axis=1, keepdims=True)
            dpy[:] += jnp.sum(push * ny, axis=1, keepdims=True)
            dpz[:] += jnp.sum(push * nz, axis=1, keepdims=True)

            rvx = vxt[:] - vxs[:]
            rvy = vyt[:] - vys[:]
            rvz = vzt[:] - vzs[:]
            vn = rvx * nx + rvy * ny + rvz * nz
            appr = jnp.where(contact & (vn < 0.0), vn, 0.0)
            dvx[:] += jnp.sum(-0.5 * appr * nx, axis=1, keepdims=True)
            dvy[:] += jnp.sum(-0.5 * appr * ny, axis=1, keepdims=True)
            dvz[:] += jnp.sum(-0.5 * appr * nz, axis=1, keepdims=True)

        if use_sort:
            # square grid: index-arithmetic triangle cull (see
            # downwash_pallas — cheaper than reading z bounds per tile)
            i = pl.program_id(0)

            @pl.when((j + 1) * bs_e - 1 > i * bt_e)  # dz > 0 possible
            def _():
                wake_math()

            live = ((zs[0, bs_e - 1] >= zt[0, 0] - min_dist)
                    & (zs[0, 0] <= zt[bt_e - 1, 0] + min_dist))

            @pl.when(live)  # |dz| < min_dist possible
            def _():
                contact_math()
        else:
            wake_math()
            contact_math()

    def interact_cols(x, y, z, vx, vy, vz):
        """Column-level entry: six (N,) arrays -> (dw_mag, (dpx,dpy,dpz),
        (dvx,dvy,dvz)) column tuples (SoA swarm path)."""
        from gym_pybullet_drones_tpu.ops.spatial import auto_bs, fit_block

        N = x.shape[0]
        bt_e = fit_block(bt, N, 8)
        bs_e = fit_block(auto_bs(bs, N), N, 128)
        use_sort = (N >= Z_SORT_MIN_N) if z_sort is None else z_sort
        in_dtype = x.dtype  # kernel is f32; cast in and back out
        comps = [a.astype(jnp.float32) for a in (x, y, z, vx, vy, vz)]
        if use_sort:
            order = jnp.argsort(comps[2])
            comps = [a[order] for a in comps]
        cols_t = [a.reshape(N, 1) for a in comps]
        cols_s = [a.reshape(1, N) for a in comps]
        t_spec = pl.BlockSpec((bt_e, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, bs_e), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((bt_e, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            make_kernel(use_sort, bt_e, bs_e),
            grid=(N // bt_e, N // bs_e),
            in_specs=[t_spec] * 6 + [s_spec] * 6,
            out_specs=[o_spec] * 7,
            out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32)] * 7,
            interpret=interpret,
        )(*cols_t, *cols_s)
        cols = [o[:, 0] for o in outs]
        if use_sort:
            cols = [jnp.zeros_like(o).at[order].set(o) for o in cols]
        cols = [o.astype(in_dtype) for o in cols]
        return cols[0], tuple(cols[1:4]), tuple(cols[4:7])

    def interact(pos, vel):
        mag, dp, dv = interact_cols(pos[:, 0], pos[:, 1], pos[:, 2],
                                    vel[:, 0], vel[:, 1], vel[:, 2])
        return mag, jnp.stack(dp, -1), jnp.stack(dv, -1)

    interact.cols = interact_cols
    return interact


def make_interact_masked(params: DroneParams, bt: int = _BT, bs=_BS,
                         max_push: float = 0.01, interpret: bool = False,
                         cone: bool = True, neighbor_cap=None,
                         dense_fallback: bool = True):
    """Mask-gated fused wake+contact pass for arbitrarily permuted fleets.

    The round-3 counterpart of `make_interact_pallas` for the persistently-
    sorted swarm loop (see `make_downwash_masked` for the rationale): exact
    value-based tile masks (ops/spatial) gate the wake and contact sections
    independently — no per-pass argsort/gather/scatter, and the contact
    section dies on everything but box-adjacent tiles in ALL THREE axes
    (the z-sorted path could only cull contact along z).

    ``neighbor_cap``: round-4 cell-list path — compacted live-tile lists
    with prefetch-indexed source blocks and dense-grid fallback on overflow;
    semantics and caveats exactly as `make_downwash_masked` — including
    ``dense_fallback=False`` (z-sorted dense overflow branch, SMEM-free at
    binned-cell tile counts) and the ``valid`` padding column on the column
    entry. The packed prefetch words carry BOTH mask bits
    (wake|contact<<1), so the fused kernel body is unchanged."""
    from gym_pybullet_drones_tpu.ops.spatial import (
        subtile_count,
        subtile_packed_mask,
    )

    c2 = float(params.dw_coeff_2)
    c3 = float(params.dw_coeff_3)
    K = float(params.dw_coeff_1) * float(params.prop_radius) ** 2 / 16.0
    min_dist = 2.0 * float(params.collision_r)
    eps = 1e-9

    def make_kernel(sub_n, bs_e):
        # Round-4 sub-tile gating (see downwash_pallas.make_downwash_masked):
        # word bits 0..sub_n-1 = wake-live per 128-lane source slice, bits
        # 8..8+sub_n-1 = contact-live per slice.
        sub_w = bs_e // sub_n

        def kernel(mask_ref, xt, yt, zt, vxt, vyt, vzt,
                   xs, ys, zs, vxs, vys, vzs,
                   dw, dpx, dpy, dpz, dvx, dvy, dvz):
            i = pl.program_id(0)
            j = pl.program_id(1)
            ns = pl.num_programs(1)
            m = mask_ref[i * ns + j] & 0xFFFF

            @pl.when(j == 0)
            def _():
                for o in (dw, dpx, dpy, dpz, dvx, dvy, dvz):
                    o[:] = jnp.zeros_like(o)

            for k in range(sub_n):
                sl = slice(k * sub_w, (k + 1) * sub_w)

                @pl.when(((m >> k) & 1) != 0)
                def _(sl=sl):
                    dxs = xs[:, sl] - xt[:]
                    dys = ys[:, sl] - yt[:]
                    dzs = zs[:, sl] - zt[:]
                    dxy2 = dxs * dxs + dys * dys
                    safe_dz = jnp.where(dzs > 0, dzs, 1.0)
                    alpha = K / (safe_dz * safe_dz)
                    beta = c2 * safe_dz + c3
                    safe_beta2 = jnp.where(jnp.abs(beta) > 1e-12,
                                           beta * beta, 1.0)
                    mag = alpha * jnp.exp(-0.5 * dxy2 / safe_beta2)
                    wake = jnp.where((dzs > 0) & (dxy2 < 100.0), mag, 0.0)
                    dw[:] -= jnp.sum(wake, axis=1, keepdims=True)

                @pl.when(((m >> (k + 8)) & 1) != 0)
                def _(sl=sl):
                    dxs = xs[:, sl] - xt[:]
                    dys = ys[:, sl] - yt[:]
                    dzs = zs[:, sl] - zt[:]
                    d2 = dxs * dxs + dys * dys + dzs * dzs
                    contact = (d2 < min_dist * min_dist) & (d2 > eps * eps)
                    inv = jax.lax.rsqrt(jnp.maximum(d2, eps * eps))
                    dist = d2 * inv
                    overlap = jnp.where(contact, min_dist - dist, 0.0)
                    nx, ny, nz = -dxs * inv, -dys * inv, -dzs * inv
                    push = jnp.minimum(0.5 * overlap, max_push)
                    dpx[:] += jnp.sum(push * nx, axis=1, keepdims=True)
                    dpy[:] += jnp.sum(push * ny, axis=1, keepdims=True)
                    dpz[:] += jnp.sum(push * nz, axis=1, keepdims=True)
                    rvx = vxt[:] - vxs[:, sl]
                    rvy = vyt[:] - vys[:, sl]
                    rvz = vzt[:] - vzs[:, sl]
                    vn = rvx * nx + rvy * ny + rvz * nz
                    appr = jnp.where(contact & (vn < 0.0), vn, 0.0)
                    dvx[:] += jnp.sum(-0.5 * appr * nx, axis=1, keepdims=True)
                    dvy[:] += jnp.sum(-0.5 * appr * ny, axis=1, keepdims=True)
                    dvz[:] += jnp.sum(-0.5 * appr * nz, axis=1, keepdims=True)

        return kernel

    def interact_cols(x, y, z, vx, vy, vz, valid=None, src=None,
                      src_valid=None):
        """``src``/``src_valid`` (round-5): optional 6-tuple
        (xs, ys, zs, vxs, vys, vzs) of a DIFFERENT (Ns,) source set with its
        own padding column — the rectangular sharded-binned form (see
        make_downwash_masked). Outputs stay per-TARGET."""
        from gym_pybullet_drones_tpu.ops.spatial import (
            auto_bs,
            auto_nbr_cap,
            compact_live_tiles,
            fit_block,
        )

        N = x.shape[0]
        Ns = N if src is None else src[0].shape[0]
        bt_e = fit_block(bt, N, 8)
        bs_e = fit_block(auto_bs(bs, Ns), Ns, 128)
        sub_n = subtile_count(bs_e)
        in_dtype = x.dtype
        comps = [a.astype(jnp.float32) for a in (x, y, z, vx, vy, vz)]
        if src is None:
            src_comps = comps
            src_valid = valid
        else:
            src_comps = [a.astype(jnp.float32) for a in src]
        # packed per-sub-tile wake|contact mask; rides scalar prefetch (SMEM)
        mask = subtile_packed_mask(
            comps[0], comps[1], comps[2], bt_e, bs_e, min_dist=min_dist,
            params=params, cone=cone, valid=valid,
            src_cols=None if src is None else tuple(src_comps[:3]),
            src_valid=None if src is None else src_valid)
        cols_t = [a.reshape(N, 1) for a in comps]
        cols_s = [a.reshape(1, Ns) for a in src_comps]
        kernel = make_kernel(sub_n, bs_e)

        def run(grid, prefetch, s_index):
            t_spec = pl.BlockSpec((bt_e, 1), lambda i, j, m: (i, 0),
                                  memory_space=pltpu.VMEM)
            s_spec = pl.BlockSpec((1, bs_e), s_index,
                                  memory_space=pltpu.VMEM)
            o_spec = pl.BlockSpec((bt_e, 1), lambda i, j, m: (i, 0),
                                  memory_space=pltpu.VMEM)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[t_spec] * 6 + [s_spec] * 6,
                out_specs=[o_spec] * 7,
            )
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32)] * 7,
                interpret=interpret,
            )(prefetch, *cols_t, *cols_s)

        nt, ns = N // bt_e, Ns // bs_e
        if neighbor_cap is None:
            outs = run((nt, ns), mask, lambda i, j, m: (0, j))
        else:
            cap = auto_nbr_cap(ns) if neighbor_cap is True else neighbor_cap
            cap = min(cap, ns)
            idx, count_max = compact_live_tiles(mask, nt, ns, cap)
            if dense_fallback:
                overflow = lambda: run((nt, ns), mask,
                                       lambda i, j, m: (0, j))
            elif src is None:
                plain = make_interact_pallas(params, bt=bt, bs=bs,
                                             max_push=max_push,
                                             interpret=interpret, z_sort=True)

                def overflow():
                    mag, dp, dv = plain.cols(*comps)
                    return tuple(o.reshape(N, 1) for o in (mag, *dp, *dv))
            else:
                # Rectangular overflow: the fused plain kernel is square-only,
                # so fall back to the z-sorted rectangular downwash + collide
                # pair (same outputs; only the f32 pair-summation order
                # differs — the stated property of every overflow branch).
                from gym_pybullet_drones_tpu.ops.collide_pallas import (
                    make_collide_pallas,
                )
                from gym_pybullet_drones_tpu.ops.downwash_pallas import (
                    make_downwash_pallas,
                )

                plain_dw = make_downwash_pallas(params, bt=bt, bs=bs,
                                                interpret=interpret,
                                                z_sort=True)
                plain_co = make_collide_pallas(params, bt=bt, bs=bs,
                                               max_push=max_push,
                                               return_delta=True,
                                               interpret=interpret,
                                               z_sort=True)

                def overflow():
                    mag = plain_dw.cols(*comps[:3],
                                        src=tuple(src_comps[:3]))
                    dp, dv = plain_co.cols(*comps, src=tuple(src_comps))
                    return tuple(o.reshape(N, 1)
                                 for o in (mag, *dp, *dv))

            outs = jax.lax.cond(
                count_max > cap,
                overflow,
                lambda: run((nt, cap), idx,
                            lambda i, j, m: (0, m[i * cap + j] >> 16)),
            )
        cols = [o[:, 0].astype(in_dtype) for o in outs]
        return cols[0], tuple(cols[1:4]), tuple(cols[4:7])

    def interact(pos, vel):
        mag, dp, dv = interact_cols(pos[:, 0], pos[:, 1], pos[:, 2],
                                    vel[:, 0], vel[:, 1], vel[:, 2])
        return mag, jnp.stack(dp, -1), jnp.stack(dv, -1)

    interact.cols = interact_cols
    return interact
