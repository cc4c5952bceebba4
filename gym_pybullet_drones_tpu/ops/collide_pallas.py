"""Tiled Pallas drone-drone contact: all-pairs resolve without O(N^2) memory.

Same n-body tiling as `ops/downwash_pallas.py`: a 2-D grid over (target block,
source block), each cell computing a (BT, BS) interaction tile in VMEM and
accumulating the source-sum into the target block's outputs. Arithmetic is
identical to `core/collisions.resolve_drone_collisions` (Jacobi projection,
equal-mass inelastic normal impulse): per target drone the kernel returns the
position pushout and the velocity correction summed over all overlapping
partners. Peak memory O(N + BT*BS) — the dense jnp path materializes (N, N, 3)
normals (~200 MB at 4096 drones), this kernel a few tiles.

Targets ride the sublane axis ((BT, 1) columns), sources the lane axis
((1, BS) rows); the (BT, BS) tile is a plain VPU outer-product broadcast.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_drones_tpu.core.params import DroneParams

_BT = 256
_BS = None


def make_collide_pallas(params: DroneParams, bt: int = _BT, bs=_BS,
                        max_push: float = 0.01, interpret: bool = False,
                        return_delta: bool = False, z_sort=None):
    """Build `resolve(pos, vel) -> (new_pos, new_vel)` for (N, 3) fleets
    (block sizes clamp to legal divisors per call — spatial.fit_block).
    With ``return_delta`` the corrections
    (dpos, dvel) are returned directly — callers that re-derive deltas by
    subtracting absolute outputs would lose low-order bits of mm-scale
    pushouts against large coordinates.

    The kernel computes in float32 (the production swarm dtype); other input
    dtypes are cast in and the results cast back.

    ``z_sort``: internally sort the fleet by altitude (scattering the
    corrections back). Contact needs |dz| < min_dist, so in sorted order a
    tile contributes only when its source block's z-interval comes within
    min_dist of the target block's — read off the tile's own first/last
    elements — and every other tile's math is skipped exactly. On a fleet
    spread over a z-extent >> min_dist this removes almost all pair work.
    Sorting reorders the f32 correction sums (round-off on well-conditioned
    geometry; see the downwash_pallas note for the ill-conditioned caveat).
    Default ``None`` = auto: sort when N >= downwash_pallas.Z_SORT_MIN_N."""
    from gym_pybullet_drones_tpu.ops.downwash_pallas import Z_SORT_MIN_N

    min_dist = 2.0 * float(params.collision_r)
    eps = 1e-9

    def make_kernel(use_sort, bt_e, bs_e):
        return lambda *refs: kernel(use_sort, bt_e, bs_e, *refs)

    def kernel(use_sort, bt_e, bs_e, xt, yt, zt, vxt, vyt, vzt,
               xs, ys, zs, vxs, vys, vzs,
               dpx, dpy, dpz, dvx, dvy, dvz):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            dpx[:] = jnp.zeros_like(dpx)
            dpy[:] = jnp.zeros_like(dpy)
            dpz[:] = jnp.zeros_like(dpz)
            dvx[:] = jnp.zeros_like(dvx)
            dvy[:] = jnp.zeros_like(dvy)
            dvz[:] = jnp.zeros_like(dvz)

        def contact_math():
            # delta points from source partner toward the target drone.
            # Squared-distance form: rsqrt(d2) gives the unit normal and (via
            # d2*inv) the distance — one rsqrt, no sqrt/divide per pair.
            dx = xt[:] - xs[:]  # (BT, BS)
            dy = yt[:] - ys[:]
            dz = zt[:] - zs[:]
            d2 = dx * dx + dy * dy + dz * dz
            contact = (d2 < min_dist * min_dist) & (d2 > eps * eps)
            inv = jax.lax.rsqrt(jnp.maximum(d2, eps * eps))
            dist = d2 * inv
            overlap = jnp.where(contact, min_dist - dist, 0.0)
            nx, ny, nz = dx * inv, dy * inv, dz * inv

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
            # z-ascending tiles: first/last elements ARE the block's z
            # bounds; skip tiles whose z-intervals are > min_dist apart.
            live = ((zs[0, bs_e - 1] >= zt[0, 0] - min_dist)
                    & (zs[0, 0] <= zt[bt_e - 1, 0] + min_dist))

            @pl.when(live)
            def _():
                contact_math()
        else:
            contact_math()

    def resolve_cols(x, y, z, vx, vy, vz, src=None):
        """Column-level entry: six (Nt,) arrays -> ((dpx,dpy,dpz),
        (dvx,dvy,dvz)) correction columns (always delta form).

        ``src``: optional 6-tuple of source columns (Ns,) for the
        rectangular form (sharded swarm: local targets vs the all-gathered
        fleet). Default: sources = targets."""
        from gym_pybullet_drones_tpu.ops.spatial import auto_bs, fit_block

        Nt = x.shape[0]
        src_comps = (x, y, z, vx, vy, vz) if src is None else src
        Ns = src_comps[0].shape[0]
        bt_e = fit_block(bt, Nt, 8)
        bs_e = fit_block(auto_bs(bs, Ns), Ns, 128)
        use_sort = (max(Nt, Ns) >= Z_SORT_MIN_N) if z_sort is None else z_sort
        in_dtype = x.dtype
        comps = [a.astype(jnp.float32) for a in (x, y, z, vx, vy, vz)]
        src_comps = [a.astype(jnp.float32) for a in src_comps]
        if use_sort:
            order = jnp.argsort(comps[2])
            comps = [a[order] for a in comps]
            if src is None:
                src_comps = comps
            else:
                s_order = jnp.argsort(src_comps[2])
                src_comps = [a[s_order] for a in src_comps]
        cols_t = [a.reshape(Nt, 1) for a in comps]
        cols_s = [a.reshape(1, Ns) for a in src_comps]
        t_spec = pl.BlockSpec((bt_e, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, bs_e), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((bt_e, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            make_kernel(use_sort, bt_e, bs_e),
            grid=(Nt // bt_e, Ns // bs_e),
            in_specs=[t_spec] * 6 + [s_spec] * 6,
            out_specs=[o_spec] * 6,
            out_shape=[jax.ShapeDtypeStruct((Nt, 1), jnp.float32)] * 6,
            interpret=interpret,
        )(*cols_t, *cols_s)
        cols = [o[:, 0] for o in outs]
        if use_sort:
            cols = [jnp.zeros_like(o).at[order].set(o) for o in cols]
        cols = [o.astype(in_dtype) for o in cols]
        return tuple(cols[0:3]), tuple(cols[3:6])

    def resolve(pos, vel, src_pos=None, src_vel=None):
        src = (None if src_pos is None else
               tuple(src_pos[:, i] for i in range(3))
               + tuple(src_vel[:, i] for i in range(3)))
        dp, dv = resolve_cols(pos[:, 0], pos[:, 1], pos[:, 2],
                              vel[:, 0], vel[:, 1], vel[:, 2], src=src)
        dpos, dvel = jnp.stack(dp, -1), jnp.stack(dv, -1)
        if return_delta:
            return dpos, dvel
        return pos + dpos, vel + dvel

    resolve.cols = resolve_cols
    return resolve
