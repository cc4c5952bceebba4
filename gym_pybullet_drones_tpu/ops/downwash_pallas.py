"""Tiled Pallas downwash: O(N^2) pair interactions without O(N^2) memory.

The vectorized downwash in `core/aero.py` materializes the full (N, N) pair
tensor — fine at 4096 drones (~67 MB of intermediates), impossible at 65k+
(17 GB). This kernel tiles the pair space like an n-body kernel: a 2-D grid
over (target block, source block), each cell computing a (BT, BS) interaction
tile in VMEM and accumulating the source-sum into the target block's output.
Peak memory is O(N + BT*BS); arithmetic is the squared-distance form of
`aero.downwash_forces_body_z` (BaseAviary._downwash semantics, :798-811) —
algebraically identical, parity-tested at 1e-4.

Layout: target coordinates ride the sublane axis ((BT, 1) blocks), source
coordinates the lane axis ((1, BS) blocks), so the (BT, BS) tile is a plain
VPU outer-product broadcast.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_drones_tpu.core.params import DroneParams

_BT = 256  # targets per block (sublane axis)
_BS = None  # sources per block: None = auto by fleet size (fit_block)

# Fleet size above which z-sorted tile culling pays for its argsort + gather
# + scatter overhead (measured crossover on one chip, docs/PERF.md: hurts at
# 4096 where the pair pass is not dominant, +42-60% at 16384+).
Z_SORT_MIN_N = 8192


def make_downwash_pallas(params: DroneParams, bt: int = _BT, bs=_BS,
                         interpret: bool = False, z_sort=None):
    """Build `dw(pos) -> (N,)` for (N, 3) positions (block sizes are
    clamped to legal divisors of the fleet per call — spatial.fit_block).

    ``z_sort``: internally sort the fleet by altitude before the pair pass
    (and scatter the result back). The wake mask needs dz > 0, and in
    z-ascending order every pair whose source index <= target index has
    dz <= 0 — so tiles entirely below the sorted diagonal are PROVABLY all
    masked and the kernel skips their math: an exact ~2x cut of the pair
    work, not an approximation. Sorting reorders the f32 wake summation;
    on well-conditioned geometry the difference is round-off (the dense
    path's own reduction order is unspecified anyway), but in the
    ill-conditioned near-coincident regime (tests/test_rollout.py:228 note)
    ANY reorder diverges — same caveat as every other execution order.
    Default ``None`` = auto: sort when N >= Z_SORT_MIN_N (the measured
    crossover where culling beats the sort/scatter overhead)."""
    c2 = float(params.dw_coeff_2)
    c3 = float(params.dw_coeff_3)
    # alpha = c1 * (pr / (4 dz))^2 = K / dz^2 with the constant prefolded
    K = float(params.dw_coeff_1) * float(params.prop_radius) ** 2 / 16.0

    def make_kernel(use_sort, square, bt_e, bs_e):
        def kernel(xt, yt, zt, xs, ys, zs, out):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                out[:] = jnp.zeros_like(out)

            def pair_math():
                # Squared-distance form: the lateral cutoff and the Gaussian
                # both consume dxy^2, so the per-pair sqrt of the naive form
                # is dead work.
                dx = xs[:] - xt[:]  # (BT, BS) via (1, BS) - (BT, 1)
                dy = ys[:] - yt[:]
                dz = zs[:] - zt[:]
                dxy2 = dx * dx + dy * dy
                safe_dz = jnp.where(dz > 0, dz, 1.0)
                alpha = K / (safe_dz * safe_dz)
                beta = c2 * safe_dz + c3
                safe_beta2 = jnp.where(jnp.abs(beta) > 1e-12, beta * beta, 1.0)
                mag = alpha * jnp.exp(-0.5 * dxy2 / safe_beta2)
                mask = (dz > 0) & (dxy2 < 100.0)
                contrib = jnp.where(mask, mag, 0.0)
                out[:] -= jnp.sum(contrib, axis=1, keepdims=True)

            if use_sort and square:
                # Same z-sorted set on both axes: a tile whose every source
                # INDEX <= every target index holds only dz <= 0 pairs.
                # Pure grid-index arithmetic — measurably cheaper (~7%) than
                # reading the z bounds out of VMEM per tile.
                i = pl.program_id(0)

                @pl.when((j + 1) * bs_e - 1 > i * bt_e)
                def _():
                    pair_math()
            elif use_sort:
                # Rectangular (targets != sources), both sets z-ascending: a
                # tile contributes only if its max source z (last element)
                # exceeds its min target z (first element).
                @pl.when(zs[0, bs_e - 1] > zt[0, 0])
                def _():
                    pair_math()
            else:
                pair_math()

        return kernel

    def dw_cols(x, y, z, src=None):
        """Column-level entry: (Nt,) f32 coordinate arrays -> (Nt,) wake
        magnitudes (no (N,3) packing — the SoA swarm path feeds columns).

        ``src``: optional (xs, ys, zs) column tuple of a DIFFERENT source
        set (Ns,) — the rectangular form used by the sharded swarm, where
        each shard's local targets read wakes from the all-gathered global
        fleet. Default: sources = targets (square all-pairs)."""
        from gym_pybullet_drones_tpu.ops.spatial import auto_bs, fit_block

        Nt = x.shape[0]
        xs_c, ys_c, zs_c = (x, y, z) if src is None else src
        Ns = xs_c.shape[0]
        bt_e = fit_block(bt, Nt, 8)
        bs_e = fit_block(auto_bs(bs, Ns), Ns, 128)
        use_sort = (max(Nt, Ns) >= Z_SORT_MIN_N) if z_sort is None else z_sort
        in_dtype = x.dtype  # kernel is f32; cast in and back out
        x, y, z = (a.astype(jnp.float32) for a in (x, y, z))
        xs_c, ys_c, zs_c = (a.astype(jnp.float32) for a in (xs_c, ys_c, zs_c))
        if use_sort:
            order = jnp.argsort(z)
            x, y, z = x[order], y[order], z[order]
            if src is None:
                xs_c, ys_c, zs_c = x, y, z
            else:
                s_order = jnp.argsort(zs_c)
                xs_c, ys_c, zs_c = (xs_c[s_order], ys_c[s_order],
                                    zs_c[s_order])
        xt = x.reshape(Nt, 1)
        yt = y.reshape(Nt, 1)
        zt = z.reshape(Nt, 1)
        xs = xs_c.reshape(1, Ns)
        ys = ys_c.reshape(1, Ns)
        zs = zs_c.reshape(1, Ns)
        t_spec = pl.BlockSpec((bt_e, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, bs_e), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            make_kernel(use_sort, src is None, bt_e, bs_e),
            grid=(Nt // bt_e, Ns // bs_e),
            in_specs=[t_spec, t_spec, t_spec, s_spec, s_spec, s_spec],
            out_specs=pl.BlockSpec((bt_e, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Nt, 1), jnp.float32),
            interpret=interpret,
        )(xt, yt, zt, xs, ys, zs)
        res = out[:, 0]
        if use_sort:
            res = jnp.zeros_like(res).at[order].set(res)
        return res.astype(in_dtype)

    def dw(pos, src_pos=None):
        src = (None if src_pos is None
               else (src_pos[:, 0], src_pos[:, 1], src_pos[:, 2]))
        return dw_cols(pos[:, 0], pos[:, 1], pos[:, 2], src=src)

    dw.cols = dw_cols
    return dw


def make_downwash_masked(params: DroneParams, bt: int = _BT, bs=_BS,
                         interpret: bool = False, cone: bool = True,
                         neighbor_cap=None, dense_fallback: bool = True):
    """Mask-gated downwash pass for ARBITRARILY permuted fleets.

    Round-3 variant (VERDICT r2 item #3): instead of sorting around every
    pass, the caller keeps the fleet in any spatially-coherent permutation
    (persistently z- or Morton-sorted, possibly a few control steps stale —
    ops/swarm_soa.make_sorted_swarm_step) and this pass computes exact
    value-based tile live masks from the actual coordinates
    (ops/spatial.wake_live_mask: dz > 0 + 10 m xy box cutoff + optional f32
    cone cull). No argsort/gather/scatter per pass — the measured 9 ms
    overhead of the z_sort path at 65k (scripts/pair_profile.py) disappears,
    and on spread-out fleets the xy terms cull far more than the z triangle.
    Masks gate whole tiles; per-pair masks inside live tiles are unchanged,
    so results match the dense path wherever the sorted kernels do.

    ``neighbor_cap`` (round-4 cell-list path, VERDICT r3 item #3): compact
    each target row's live source tiles (ops/spatial.compact_live_tiles) and
    run a (nt, cap) grid whose source blocks are PREFETCH-INDEXED — dead
    tiles are never enumerated, so the tile size can shrink to the
    culling-optimal value (pass bt/bs explicitly, e.g. (256, 128)) without
    dense-grid overhead. True = auto cap (spatial.auto_nbr_cap); an int pins
    it. Rows keep ascending source order -> results are BIT-IDENTICAL to the
    dense masked grid at equal (bt, bs); if any row exceeds the cap the pass
    falls back to the dense masked grid under lax.cond (exact, never drops).

    ``dense_fallback=False`` (round-4 binned layouts): the cap-overflow
    branch becomes the plain z-sorted dense kernel instead of the dense
    MASKED grid — at binned-cell tile counts (nt = ns = number of cells,
    e.g. 484 at 131k) the dense grid's nt*ns prefetch mask would approach
    the v5e's 1 MB SMEM cap even as dead code inside lax.cond. The z-sorted
    pass needs no mask array; it reorders the f32 pair sums (docstring
    above), so this mode trades the bit-identical-fallback guarantee for
    SMEM safety — the fallback only fires when a row's live tiles exceed
    the cap, which the binned geometry bounds by construction.

    The column entries accept ``valid`` — a bool column marking real slots
    in a padded binned layout. It only tightens the tile bounds
    (spatial.tile_bounds6): padding sentinels are already per-pair inert in
    the kernel (z = -1e9 fails dz > 0 against any real drone).

    ``src``/``src_valid`` (round-5): optional (xs, ys, zs) source columns of
    a DIFFERENT (Ns,) set with their own padding column — the rectangular
    form for the sharded binned swarm, where each shard's local targets
    read wake sources from the all-gathered global slot arrays. The grid
    becomes (N/bt, Ns/bs); masks, compaction and the z-sorted overflow
    fallback all operate on the rectangular tile space.
    """
    from gym_pybullet_drones_tpu.ops.spatial import (
        subtile_count,
        subtile_packed_mask,
    )

    c2 = float(params.dw_coeff_2)
    c3 = float(params.dw_coeff_3)
    K = float(params.dw_coeff_1) * float(params.prop_radius) ** 2 / 16.0

    def make_kernel(sub_n, bs_e):
        # Round-4 sub-tile gating: mask word bit k = wake-live of the k-th
        # 128-lane slice of the source block (spatial.subtile_packed_mask) —
        # pair math runs per LIVE SLICE, so the cull resolution is the
        # bs/sub_n box while grid/DMA stay at the wide-tile optimum. The
        # low 16 bits are the mask whichever grid feeds the kernel (dense:
        # raw words; neighbor-compacted: idx << 16 | word).
        sub_w = bs_e // sub_n

        def kernel(mask_ref, xt, yt, zt, xs, ys, zs, out):
            i = pl.program_id(0)
            j = pl.program_id(1)
            ns = pl.num_programs(1)

            @pl.when(j == 0)
            def _():
                out[:] = jnp.zeros_like(out)

            m = mask_ref[i * ns + j] & 0xFFFF
            for k in range(sub_n):
                @pl.when(((m >> k) & 1) != 0)
                def _(k=k):
                    sl = slice(k * sub_w, (k + 1) * sub_w)
                    dx = xs[:, sl] - xt[:]
                    dy = ys[:, sl] - yt[:]
                    dz = zs[:, sl] - zt[:]
                    dxy2 = dx * dx + dy * dy
                    safe_dz = jnp.where(dz > 0, dz, 1.0)
                    alpha = K / (safe_dz * safe_dz)
                    beta = c2 * safe_dz + c3
                    safe_beta2 = jnp.where(jnp.abs(beta) > 1e-12,
                                           beta * beta, 1.0)
                    mag = alpha * jnp.exp(-0.5 * dxy2 / safe_beta2)
                    live = (dz > 0) & (dxy2 < 100.0)
                    out[:] -= jnp.sum(jnp.where(live, mag, 0.0), axis=1,
                                      keepdims=True)

        return kernel

    def dw_cols(x, y, z, valid=None, src=None, src_valid=None):
        from gym_pybullet_drones_tpu.ops.spatial import (
            auto_bs,
            auto_nbr_cap,
            compact_live_tiles,
            fit_block,
        )

        N = x.shape[0]
        xs_c, ys_c, zs_c = (x, y, z) if src is None else src
        Ns = xs_c.shape[0]
        bt_e = fit_block(bt, N, 8)
        bs_e = fit_block(auto_bs(bs, Ns), Ns, 128)
        sub_n = subtile_count(bs_e)
        in_dtype = x.dtype
        x, y, z = (a.astype(jnp.float32) for a in (x, y, z))
        if src is None:
            xs_c, ys_c, zs_c = x, y, z
            src_valid = valid
        else:
            xs_c, ys_c, zs_c = (a.astype(jnp.float32)
                                for a in (xs_c, ys_c, zs_c))
        # Mask rides the scalar-prefetch path (SMEM, readable per grid cell).
        mask = subtile_packed_mask(
            x, y, z, bt_e, bs_e, params=params, cone=cone, valid=valid,
            src_cols=None if src is None else (xs_c, ys_c, zs_c),
            src_valid=None if src is None else src_valid)
        args = (x.reshape(N, 1), y.reshape(N, 1), z.reshape(N, 1),
                xs_c.reshape(1, Ns), ys_c.reshape(1, Ns),
                zs_c.reshape(1, Ns))
        kernel = make_kernel(sub_n, bs_e)

        def run(grid, prefetch, s_index):
            t_spec = pl.BlockSpec((bt_e, 1), lambda i, j, m: (i, 0),
                                  memory_space=pltpu.VMEM)
            s_spec = pl.BlockSpec((1, bs_e), s_index,
                                  memory_space=pltpu.VMEM)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[t_spec, t_spec, t_spec, s_spec, s_spec, s_spec],
                out_specs=pl.BlockSpec((bt_e, 1), lambda i, j, m: (i, 0),
                                       memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
                interpret=interpret,
            )(prefetch, *args)

        nt, ns = N // bt_e, Ns // bs_e
        if neighbor_cap is None:
            out = run((nt, ns), mask, lambda i, j, m: (0, j))
        else:
            cap = auto_nbr_cap(ns) if neighbor_cap is True else neighbor_cap
            cap = min(cap, ns)
            idx, count_max = compact_live_tiles(mask, nt, ns, cap)
            if dense_fallback:
                overflow = lambda: run((nt, ns), mask,
                                       lambda i, j, m: (0, j))
            else:
                plain = make_downwash_pallas(params, bt=bt, bs=bs,
                                             interpret=interpret, z_sort=True)
                overflow = lambda: plain.cols(
                    x, y, z,
                    src=None if src is None else (xs_c, ys_c, zs_c),
                ).reshape(N, 1)
            out = jax.lax.cond(
                count_max > cap,
                overflow,
                lambda: run((nt, cap), idx,
                            lambda i, j, m: (0, m[i * cap + j] >> 16)),
            )
        return out[:, 0].astype(in_dtype)

    def dw(pos):
        return dw_cols(pos[:, 0], pos[:, 1], pos[:, 2])

    dw.cols = dw_cols
    return dw
