"""Spatial orderings and exact tile-level live masks for the pair kernels.

Round-3 neighbor pruning (VERDICT r2 item #3). The round-2 pair kernels cull
tiles by *index arithmetic on a freshly z-sorted fleet*, which forces an
argsort + gather + scatter around EVERY pair pass (measured 9 ms of a 27 ms
pass at 65k, scripts/pair_profile.py). This module decouples culling from
sortedness: per pass it computes each tile's axis-aligned bounding box
directly from the (arbitrarily permuted) coordinate columns — a trivial
reshape/min/max — and derives **exact, value-based live masks** per
(target-tile, source-tile) pair:

* wake rows live only if the source box can be strictly above the target box
  (``dz > 0``, BaseAviary.py:798-811) AND the boxes' closest xy approach is
  inside the 10 m cutoff (:801) AND — optionally — the Gaussian can produce a
  non-negligible f32 value anywhere in the box pair (the "cone cull": for
  small dz the wake's ``beta = 0.16 dz - 0.11`` makes the Gaussian narrower
  than one drone spacing; contributions beyond ``~13 sigma`` underflow f32);
* contact rows live only if the boxes approach within the 0.12 m collision
  diameter on every axis (cf2x.urdf:31-36 geometry).

Masks are conservative (never cull a contributing pair — cone margins below),
so they are correct for ANY permutation of the fleet; sorting (by z or a
Morton key) merely concentrates live pairs into few tiles. That enables the
persistently-sorted swarm loop (ops/swarm_soa.make_sorted_swarm_step): sort
every K control steps, keep the state permuted, and let the masks absorb the
in-between disorder — no per-pass gather/scatter at all.
"""

import numpy as np

import jax
import jax.numpy as jnp

# f32 exp underflow margin for the cone cull: exp(x) is subnormal below
# x = -87.3 and flushes to 0 below -103.3; alpha = K/dz^2 can multiply the
# Gaussian back up by at most ~exp(28) for dz >= 1e-6, so -0.5 q < -(103+60)
# guarantees an exact-zero f32 contribution with a 2x safety margin on top.
_CONE_Q = 2.0 * (103.3 + 60.0)


def fit_block(b, n, floor):
    """Largest Mosaic-legal block size <= b for an axis of length n.

    Legal means: divides n AND is either a multiple of the hardware granule
    (8 sublanes / 128 lanes) or equal to the full dimension (Pallas TPU's
    block-shape rule). The pair kernels default to large blocks for
    grid-overhead amortization (measured -18% at 65k for bs 512 -> 1024) and
    clamp here so small/odd fleets (tests, dry runs) keep working. The
    search walks granule multiples downward (not halving), so e.g.
    fit_block(512, 768, 128) returns 384, the true largest legal divisor."""
    b = min(b, n)
    if n % b == 0 and (b % floor == 0 or b == n):
        return b
    for cand in range((b // floor) * floor, floor - 1, -floor):
        if n % cand == 0:
            return cand
    return n  # the full dimension is always legal


def auto_bs(bs, n):
    """Source-block lane width: explicit value, or the size-adaptive default.

    Wide 1024-lane source blocks amortize grid overhead for big fleets
    (+18-21% measured at 65k) but lose at 4096 ((256, 1024) tiles pressure
    VMEM); the measured crossover is ~16k. Round 4: with the per-sub-tile
    masks (the kernels skip dead 128-lane slices, so an extra-wide block no
    longer drags dead lanes through the VPU) 2048 lanes win from 65k up —
    65k pitch-4 0.79->0.84M / 0.51->0.56M, 131k pitch-4 0.63->0.67M /
    0.42->0.49M drone-steps/s (docs/PERF.md round-4 table). ONE definition
    for the five pair-kernel entry points — retune here, not per kernel."""
    if bs is not None:
        return bs
    if n >= 65536:
        return 2048
    return 1024 if n >= 16384 else 512


def tile_bounds(col, block):
    """(N,) column -> per-tile (min, max), each (N // block,)."""
    t = col.reshape(-1, block)
    return t.min(axis=1), t.max(axis=1)


def tile_bounds6(x, y, z, block, valid=None):
    """All six per-tile bounds in ONE reduction kernel.

    The masks are recomputed inside the fused swarm step every pair pass and
    sit on the serial dependency chain between the substep and the Pallas
    kernel (the scalar-prefetch mask must be ready before the kernel starts);
    a naive per-column min/max is ~12 tiny reduce kernels whose launch
    latency adds up. Stacking into (6, nt, block) keeps it to one.

    ``valid`` (round-4 binned cell-list layout): optional (N,) bool column;
    invalid (padding) slots are EXCLUDED from the bounds, so tiles made only
    of padding get an EMPTY box (min=+1e30 > max=-1e30) — every box-gap test
    then reads "infinitely far" and the tile goes dead in all masks. Mixed
    tiles get the exact bounds of their real members. (Without this, the
    padding sentinel coordinates would inflate the boxes and defeat culling;
    the sentinels themselves stay per-pair-masked in the kernels either way.)

    Returns (xmin, ymin, zmin, xmax, ymax, zmax), each (N // block,).
    """
    a = jnp.stack([x, y, z, -x, -y, -z]).reshape(6, -1, block)
    if valid is not None:
        a = jnp.where(valid.reshape(1, -1, block), a, jnp.float32(1e30))
    m = a.min(axis=2)
    return m[0], m[1], m[2], -m[3], -m[4], -m[5]


def _box_gap(tmin, tmax, smin, smax):
    """Closest approach of target-tile and source-tile intervals: (nt, ns)."""
    return jnp.maximum(
        jnp.maximum(smin[None, :] - tmax[:, None],
                    tmin[:, None] - smax[None, :]), 0.0)


def _wake_live_from_bounds(tb, sb, params, cone):
    """Wake-live (nt, ns) bool from target/source tile bounds (see
    wake_live_mask for semantics)."""
    txmin, tymin, tzmin, txmax, tymax, tzmax = tb
    sxmin, symin, szmin, sxmax, symax, szmax = sb
    gx = _box_gap(txmin, txmax, sxmin, sxmax)
    gy = _box_gap(tymin, tymax, symin, symax)
    dxy2_min = gx * gx + gy * gy
    dz_max = szmax[None, :] - tzmin[:, None]  # largest possible source-above
    live = (dz_max > 0.0) & (dxy2_min < 100.0)
    if cone and params is not None:
        # |beta| is maximized at an endpoint of the tile pair's dz range
        # (clipped to the wake's dz > 0 domain).
        c2 = float(params.dw_coeff_2)
        c3 = float(params.dw_coeff_3)
        dz_min = jnp.maximum(szmin[None, :] - tzmax[:, None], 0.0)
        dz_hi = jnp.maximum(dz_max, 0.0)
        beta_abs = jnp.maximum(jnp.abs(c2 * dz_min + c3),
                               jnp.abs(c2 * dz_hi + c3))
        live = live & (dxy2_min < _CONE_Q * beta_abs * beta_abs)
    return live


def _contact_live_from_bounds(tb, sb, min_dist):
    txmin, tymin, tzmin, txmax, tymax, tzmax = tb
    sxmin, symin, szmin, sxmax, symax, szmax = sb
    live = None
    for tmin, tmax, smin, smax in (
            (txmin, txmax, sxmin, sxmax),
            (tymin, tymax, symin, symax),
            (tzmin, tzmax, szmin, szmax)):
        g = _box_gap(tmin, tmax, smin, smax) < min_dist
        live = g if live is None else live & g
    return live


def _bounds_pair(x, y, z, bt, bs, src_cols=None, valid=None, src_valid=None):
    tb = tile_bounds6(x, y, z, bt, valid=valid)
    if src_cols is None and bt == bs:
        sb = tb
    else:
        xs, ys, zs = (x, y, z) if src_cols is None else src_cols
        sb = tile_bounds6(xs, ys, zs, bs,
                          valid=src_valid if src_cols is not None else valid)
    return tb, sb


def wake_live_mask(x, y, z, bt, bs, params=None, cone=True,
                   src_cols=None):
    """(nt, ns) int32 mask: 1 where a (bt-target, bs-source) tile pair can
    hold a wake-contributing pair. Exact w.r.t. the reference's dz > 0 and
    10 m lateral cutoff; the cone cull additionally drops tile pairs whose
    every pair's Gaussian underflows f32 — exact zeros in the dense path too.
    """
    tb, sb = _bounds_pair(x, y, z, bt, bs, src_cols)
    return _wake_live_from_bounds(tb, sb, params, cone).astype(jnp.int32)


def contact_live_mask(x, y, z, bt, bs, min_dist, src_cols=None):
    """(nt, ns) int32 mask: 1 where tile boxes approach within ``min_dist``
    on every axis (superset of the sphere-contact condition — exact cull)."""
    tb, sb = _bounds_pair(x, y, z, bt, bs, src_cols)
    return _contact_live_from_bounds(tb, sb, min_dist).astype(jnp.int32)


def packed_live_mask(x, y, z, bt, bs, min_dist, params=None, cone=True,
                     src_cols=None):
    """Flat (nt*ns,) int32: bit 0 = wake live, bit 1 = contact live.

    One bounds reduction + one elementwise fusion — this sits on the serial
    chain before every fused interact pass (see tile_bounds6)."""
    tb, sb = _bounds_pair(x, y, z, bt, bs, src_cols)
    wake = _wake_live_from_bounds(tb, sb, params, cone)
    contact = _contact_live_from_bounds(tb, sb, min_dist)
    return (wake.astype(jnp.int32)
            | (contact.astype(jnp.int32) << 1)).reshape(-1)


def subtile_count(bs):
    """Sub-tile slices per source block for the packed sub-tile masks: the
    source block divides into 128-lane-ALIGNED slices (each slice width a
    multiple of the hardware lane granule — Mosaic faults on unaligned
    lane-dimension slices, seen at cap=1280 where 1280/8 = 160), capped at
    8 so wake and contact bit fields fit one int32 byte each.
    bs < 128 (tiny test fleets) -> one slice."""
    if bs % 128 != 0:
        return 1
    lanes = bs // 128
    for sub in range(int(min(8, lanes)), 0, -1):
        if lanes % sub == 0:
            return sub
    return 1


def subtile_packed_mask(x, y, z, bt, bs, min_dist=None, params=None,
                        cone=True, valid=None, src_cols=None,
                        src_valid=None):
    """Flat (nt*ns,) int32 with PER-SUB-TILE live bits (round 4).

    The round-3 masks gate whole (bt, bs) tiles, so the culling floor is the
    tile-box size: at 65k/pitch-4 the live fraction is ~33% at bs=1024 but
    ~20% at bs=128 (measured, docs/PERF.md round-4) — yet bs=128 tiles lose
    on grid/DMA overhead. This packing keeps the wide-tile grid and gives
    the kernel finer kill resolution: word bit k = wake-live of the k-th
    128-lane slice of the source block (bits 0..7), bit 8+k = contact-live
    of that slice. The kernel pair-maths only live slices — the live-
    fraction delta is saved as pure VPU work, with zero extra grid cells
    and the same SMEM footprint (still one word per tile pair).

    ``min_dist`` None -> wake bits only (downwash pass).
    ``valid``: optional padding-exclusion column for binned layouts
    (tile_bounds6) — all-padding tiles AND all-padding 128-lane slices get
    empty boxes and go dead, which is what makes padded-cell capacity
    headroom nearly free in the binned backend.
    ``src_cols``/``src_valid`` (round-5 sharded binned path): an optional
    DIFFERENT source set (xs, ys, zs) with its own padding column — the
    rectangular form where each shard's local targets read pair sources
    from the all-gathered global slot arrays (runtime/swarm.py).
    """
    sub = subtile_count(bs)
    sub_w = bs // sub
    tb, sb = _bounds_pair(x, y, z, bt, sub_w, src_cols=src_cols,
                          valid=valid, src_valid=src_valid)
    nt = tb[0].shape[0]
    wake = _wake_live_from_bounds(tb, sb, params, cone)  # (nt, ns*sub)
    bits = jnp.arange(sub, dtype=jnp.int32)
    packed = (wake.reshape(nt, -1, sub).astype(jnp.int32) << bits).sum(
        -1, dtype=jnp.int32)
    if min_dist is not None:
        contact = _contact_live_from_bounds(tb, sb, min_dist)
        packed |= (contact.reshape(nt, -1, sub).astype(jnp.int32)
                   << (bits + 8)).sum(-1, dtype=jnp.int32)
    return packed.reshape(-1)


def compact_live_tiles(packed, nt, ns, cap):
    """Compact a flat (nt*ns,) packed tile mask into per-target-row live
    source-tile lists — the round-4 cell-list path (VERDICT r3 item #3).

    The masked kernels still ENUMERATE every (target, source) tile pair in
    their grid; dead tiles cost only ~2 ns each, but the culling floor is the
    TILE box size: at 65k/pitch-4 the live fraction bottoms out at ~0.2 while
    the true per-pair live fraction is ~0.5% (docs/PERF.md) — large source
    tiles (1024 lanes) were needed to amortize the dense grid. Compaction
    removes the dense-enumeration constraint: the grid becomes
    (nt, cap) over each row's ACTUAL live tiles, so tiles can shrink to the
    culling-optimal size without grid-overhead blowup, and the SMEM budget
    drops from nt*ns mask words to nt*cap packed words.

    Returns ``(packed_idx, count_max)``:
      * ``packed_idx``: (nt*cap,) int32, each ``source_tile_index << 16 |
        bits`` (bits = the tile's mask word, up to 16 sub-tile bits —
        subtile_packed_mask; 0 marks a padding slot). Rows keep ascending
        source order, so a kernel consuming this sums in EXACTLY the order of
        the dense masked grid — results are bit-identical.
      * ``count_max``: () int32, the largest per-row live count. If it
        exceeds ``cap`` the compaction dropped live tiles and the caller MUST
        fall back to the dense masked pass (lax.cond) — correctness never
        depends on cap.
    """
    m = packed.reshape(nt, ns).astype(jnp.int32)
    live = m != 0
    # position of each live column within its row; dead/overflow slots land
    # in the scratch column `cap` of a (cap+1)-wide row and are sliced away
    pos = jnp.cumsum(live, axis=1) - 1
    pos = jnp.where(live & (pos < cap), pos, cap)
    rows = jnp.broadcast_to(jnp.arange(nt)[:, None], (nt, ns))
    cols = jnp.broadcast_to(jnp.arange(ns, dtype=jnp.int32)[None, :], (nt, ns))
    packed_vals = (cols << 16) | (m & 0xFFFF)
    out = jnp.zeros((nt, cap + 1), jnp.int32).at[rows, pos].set(packed_vals)
    return out[:, :cap].reshape(-1), live.sum(axis=1).max().astype(jnp.int32)


def auto_nbr_cap(ns):
    """Default live-tile cap per target row: ns/4 (pitch >= 2 fleets measure
    ~5-12% live rows; 4x headroom before the dense fallback), floored for
    tiny test fleets and ceiled to keep the packed prefetch array well under
    the 1 MB SMEM cap at 131k (nt=512 rows x 256 -> 512 KB)."""
    return int(min(max(8, ns // 4), 256))


def _spread_bits(v):
    """Spread the low 10 bits of v so consecutive bits land 3 apart."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_key(x, y, z, bits=10):
    """Interleaved-bit (Morton / z-order curve) key per drone: (N,) uint32.

    Coordinates are quantized to ``bits`` levels over the fleet's bounding
    box; sorting by the key makes blocks of consecutive drones spatially
    compact in all three axes — the ordering that makes the xy terms of the
    live masks effective on spread-out fleets (a z-sort's thin slabs span the
    whole field laterally)."""
    lo = jnp.stack([x.min(), y.min(), z.min()])
    hi = jnp.stack([x.max(), y.max(), z.max()])
    scale = ((1 << bits) - 1) / jnp.maximum(hi - lo, 1e-9)
    q = [jnp.uint32(jnp.clip((c - lo[i]) * scale[i], 0, (1 << bits) - 1))
         for i, c in enumerate((x, y, z))]
    return (_spread_bits(q[0]) | (_spread_bits(q[1]) << 1)
            | (_spread_bits(q[2]) << 2))


def sort_key(x, y, z, order: str):
    """Per-drone sort key for ``order`` in {"z", "morton"}."""
    if order == "z":
        return z
    if order == "morton":
        return morton_key(x, y, z)
    raise ValueError(f"unknown order {order!r}")
