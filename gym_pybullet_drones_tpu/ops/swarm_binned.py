"""Padded xy-cell binned swarm backend: the true cell-list pair path.

Round 4's sub-tile masks and compacted tile lists (ops/spatial) hit a
measured floor: with a Morton-sorted fleet the culling resolution is the
TILE BOX size — a 256-drone Morton box is ~25 m wide against the wake's
10 m lateral cutoff (BaseAviary.py:801), so at 65k/pitch-4 the live pair
fraction bottoms out at ~20% while the true per-pair live fraction is
~0.5% (docs/PERF.md round-4 microprofile). This module removes that floor
by changing the LAYOUT instead of the kernel: the fleet lives in padded
xy-cell bins —

  * the footprint is divided into an (nx, ny) grid of square cells
    (``cell_size`` >= nothing in particular: correctness never depends on
    it — the exact value-based masks are computed from actual coordinates);
  * each cell owns a fixed ``cap``-slot block of the state arrays; its
    drones occupy the first slots sorted by z, the rest are padding;
  * pair-kernel tiles are exactly cell blocks (bt = bs = cap), so a tile's
    bounding box is one cell's real extent: the existing value-based masks
    (ops/spatial.subtile_packed_mask with ``valid``-aware bounds) kill every
    tile pair whose cells are farther than 10 m apart in xy — the cell-list
    neighborhood emerges from the masks with NO new kernel code — and the
    per-128-lane sub-tile bits kill all-padding z-slices, so capacity
    headroom costs ~nothing in pair math;
  * the compacted live-tile grid (spatial.compact_live_tiles via
    ``neighbor_cap``) then enumerates only each cell's ~(2*ceil(10/s)+1)^2
    live neighbor tiles: total pair work is O(ncells * ring * cap^2)
    = O(N * k) at fixed density, independent of fleet size.

Padding slots hold inert sentinels (pos (0, 0, -1e9), identity quat, zero
velocity): z = -1e9 fails the wake's dz > 0 against any real drone and
puts contact distances at ~1e18, and coincident padding pairs are killed
by the kernels' own d2 > eps^2 / dz > 0 guards — so padding is per-pair
invisible even when a tile mask conservatively includes it. Padding rows
are frozen back to their sentinels immediately after every substep —
BEFORE the pair pass, because the substep's ground clamp would otherwise
park them at (0, 0, z_min) where they'd phantom-contact real drones
landed near the origin — and again after the pair updates.

Layout overflow NEVER drops a drone: if any cell exceeds ``cap`` at a
rebin, the new layout packs the whole (cell, z)-sorted fleet densely into
the first N slots instead (a Morton-quality coherent order) — the value
masks stay exact for any permutation, only culling efficiency degrades.
A pass-level second guard (``dense_fallback=False`` in the masked kernels)
handles live-tile-cap overflow with the z-sorted dense kernel, SMEM-free.

Round 5 (VERDICT r4 #1) makes this a first-class runtime path: the slot
axis shards over a `jax.sharding.Mesh` in whole-cell slabs per device
(``make_binned_swarm(mesh=...)``; pair sources ride one all-gather per
pass through the kernels' rectangular ``src`` entries, rebins run as
global XLA ops), and `runtime.make_swarm_physics` selects this backend by
fleet geometry with no environment variables. 524k- and 1M-drone ladder
rows: docs/PERF.md round-5.

Semantics match `swarm_soa.make_sorted_swarm` exactly (same substep chain,
same carried-wake schedule, same stated f32-reorder caveats); parity is
pinned in tests/test_soa.py, and the sharded mode is bit-identical to
single-device in tests/test_swarm_binned_sharded.py.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.params import DroneParams
from gym_pybullet_drones_tpu.ops.velocity_soa import (
    physics_consts,
    physics_substep_soa,
)
from gym_pybullet_drones_tpu.ops.swarm_soa import (
    swarm_soa_from_kin,
    swarm_soa_to_kin,
)

_ZPAD = -1e9  # padding z sentinel: below any flyable altitude by ~1e9 m

# state columns and their padding sentinels
_SENT = dict(px=0.0, py=0.0, pz=_ZPAD, qx=0.0, qy=0.0, qz=0.0, qw=1.0,
             vx=0.0, vy=0.0, vz=0.0, wx=0.0, wy=0.0, wz=0.0, mag=0.0)


def binned_geometry(pos, occ_target=256, headroom=1.25, max_cap=2048,
                    min_cell=10.0, cell=None):
    """Host-side helper: pick (cell_size, nx, ny, cap) for an initial fleet.

    Aims for ~``occ_target`` drones per cell COLUMN (cells span all z — the
    wake's dz is unbounded, only xy is cut at 10 m), capacity = measured max
    occupancy x ``headroom`` rounded up to the 128-lane granule. Cells are
    clamped at ``min_cell`` = the 10 m wake cutoff: a smaller cell widens
    the live ring from 3x3 to 5x5 tiles and loses more than the finer
    occupancy wins (measured at 131k/pitch-4: cell 8.82 m -> 0.90M,
    cell 10 m -> 1.18M drone-steps/s). Purely a performance choice: any
    (cell_size, nx, ny, cap) is correct.

    ``cell``: pin the cell size instead of deriving it from ``occ_target``;
    the grid AND the cap are recomputed for that size (a larger pinned cell
    raises per-cell occupancy, and keeping the auto-size cap would push
    every rebin into the dense-packed overflow fallback — advisor round-4
    finding on the SWARM_CELL bench override).
    """
    p = np.asarray(pos)
    x, y = p[:, 0], p[:, 1]
    n = x.shape[0]
    ex = max(float(x.max() - x.min()), 1e-6)
    ey = max(float(y.max() - y.min()), 1e-6)
    s = (float(cell) if cell is not None
         else max(math.sqrt(ex * ey * occ_target / n), min_cell))
    nx = int(np.ceil(ex / s)) + 1
    ny = int(np.ceil(ey / s)) + 1
    cx = np.clip(np.floor((x - x.min()) / s).astype(np.int64), 0, nx - 1)
    cy = np.clip(np.floor((y - y.min()) / s).astype(np.int64), 0, ny - 1)
    occ = int(np.bincount(cx * ny + cy, minlength=nx * ny).max())
    cap = min(max_cap, int(np.ceil(occ * headroom / 128)) * 128)
    cap = max(cap, 128)
    while nx * ny * cap < n:  # identity fallback must fit the whole fleet
        cap += 128
    return float(s), nx, ny, cap


def shard_binned_state(mesh, s, axis: str = "env"):
    """Place a binned slot-state dict onto ``mesh``: slot-axis leaves
    sharded `P(axis)`, the step counter ``t`` replicated. Multi-process-safe
    (one jitted identity per sharding — runtime.mesh._put_tree)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from gym_pybullet_drones_tpu.runtime.mesh import _put_tree

    sharded = _put_tree({k: v for k, v in s.items() if k != "t"},
                        NamedSharding(mesh, PartitionSpec(axis)))
    sharded["t"] = _put_tree(s["t"], NamedSharding(mesh, PartitionSpec()))
    return sharded


def make_binned_swarm(params: DroneParams, dt, n_substeps: int,
                      collisions: bool = False, cell_size: float = 10.0,
                      nx: int = 8, ny: int = 8, cap: int = 256,
                      resort_every: int = 4, cone: bool = True,
                      neighbor_cap=None, bt=None, bs=None,
                      interpret: bool = False, mesh=None, axis: str = "env"):
    """Binned cell-list coupled-swarm loop. Returns ``(init, step, export)``
    with the same contract as `swarm_soa.make_sorted_swarm` (rpm columns in
    ORIGINAL drone order; export scatters back).

    ``cap`` slots per cell (128-multiple); ``bt``/``bs`` sub-divide the cell
    block into (target, source) tiles — both are clamped to divisors of
    ``cap`` so tiles never straddle cells (a straddling box would span two
    cells and loosen the masks). ``bs`` defaults to the whole cell; ``bt``
    defaults to the largest cap divisor that keeps the tile inside the
    v5e's 16 MB scoped-VMEM budget PER KERNEL — measured: the 13-stream
    fused interact kernel OOMs above ~bt*bs = 512*512 tile elements
    ((640, 640) allocates 17.38 M), the 7-stream downwash above ~512*1024 —
    so big-cell layouts (cap 1408 at pitch 2) get sub-cell target slabs
    automatically. Sub-cell targets cost grid overhead (measured 0.96M vs
    1.18M drone-steps/s at 131k/pitch-4 for a gratuitous bt=256 at
    cap=640), so the default only shrinks bt when VMEM forces it.
    ``neighbor_cap`` live source tiles kept per target row (default: 2x the
    wake ring (2*ceil(10/cell)+1)^2 scaled by cap//bs — overflow falls back
    to the z-sorted dense pass, never drops).

    ``mesh``/``axis`` (round-5, VERDICT r4 #1): shard the SLOT axis of the
    same loop over a `jax.sharding.Mesh` — each device owns a contiguous
    x-slab of whole cells (``nx * ny`` must divide by the mesh axis size).
    Substeps and target-side pair math run shard-local; pair sources are
    the all-gathered global slot columns through the kernels' rectangular
    ``src`` entry (masks cull the non-neighbor global tiles exactly as in
    the square pass, so per-device pair work stays O(N_local * k)). Rebins
    are global permutations and run outside shard_map under jit. Callers
    place the init() state with `shard_binned_state` and pass rpm columns
    replicated. Results are bit-identical to the single-device masked pass
    at equal (bt, bs) when no per-device neighbor-cap overflow fires (rows
    keep ascending source order).
    """
    from gym_pybullet_drones_tpu.ops.downwash_pallas import (
        make_downwash_masked,
    )
    from gym_pybullet_drones_tpu.ops.interact_pallas import (
        make_interact_masked,
    )
    from gym_pybullet_drones_tpu.ops.spatial import fit_block

    ncells = nx * ny
    nslots = ncells * cap
    if cap % 128 != 0:
        raise ValueError(f"cap must be a 128-lane multiple, got {cap}")
    bs = cap if bs is None else fit_block(bs, cap, 128)
    if cap % bs != 0:
        raise ValueError(f"bs must divide cap, got bs={bs} cap={cap}")
    if mesh is not None and ncells % mesh.shape[axis] != 0:
        raise ValueError(
            f"cell count {nx}x{ny} must divide over the {mesh.shape[axis]}"
            f"-device '{axis}' mesh axis (whole-cell slabs per device)")

    def vmem_bt(budget_elems):
        # largest cap divisor (8-sublane granule) whose (bt, bs) tile stays
        # inside the kernel's measured scoped-VMEM budget
        want = max(8, min(cap, (budget_elems // bs) // 8 * 8))
        return fit_block(want, cap, 8)

    bt_dw = vmem_bt(512 * 1024) if bt is None else fit_block(bt, cap, 8)
    bt_ia = vmem_bt(512 * 512) if bt is None else fit_block(bt, cap, 8)
    if neighbor_cap is None:
        ring = 2 * int(math.ceil(10.0 / cell_size)) + 1
        neighbor_cap = min(nslots // bs, 2 * ring * ring * (cap // bs))
        # The scalar-prefetch row table (nt * neighbor_cap int32 words) must
        # fit the v5e's ~1 MB SMEM; at megadrone layouts (2.2M slots at 1M
        # drones) the 2x-headroom default busts it and the kernel faults.
        # Clamp toward the EXACT ring bound: cell-aligned tiles can have at
        # most ring^2 live source cells (boxes 2 cells apart sit exactly at
        # the 10 m cutoff, which the masks exclude), so ring^2 * (cap//bs)
        # rows suffice whenever the layout is cell-aligned; the dense-packed
        # overflow layout exceeds it and correctly takes the z-sorted
        # pass-level fallback.
        nt_max = nslots // min(bt_dw, bt_ia)
        smem_rows = max((800_000 // 4) // max(nt_max, 1), 1)
        if neighbor_cap > smem_rows:
            neighbor_cap = max(ring * ring * (cap // bs),
                               min(smem_rows, neighbor_cap))
    c = physics_consts(params)
    dw_m = make_downwash_masked(params, bt=bt_dw, bs=bs, interpret=interpret,
                                cone=cone, neighbor_cap=neighbor_cap,
                                dense_fallback=False)
    ia_m = (make_interact_masked(params, bt=bt_ia, bs=bs, interpret=interpret,
                                 cone=cone, neighbor_cap=neighbor_cap,
                                 dense_fallback=False)
            if collisions else None)
    _COLS = tuple(_SENT)  # state columns (incl. mag), excl. ids/valid/t

    def _layout(ox, oy, oz):
        """Original-order coordinate columns -> (ids, valid) slot arrays.

        ids[slot] = original drone index (N for padding); drones of a cell
        occupy its slot block sorted by z (so 128-lane sub-tiles are z-slabs
        and the sub-tile mask bits double as a z cull). If any cell
        overflows ``cap``, the ENTIRE fleet instead packs densely into the
        first N slots in (cell, z) order — never drops, stays coherent.
        """
        n = ox.shape[0]
        cx = jnp.clip(jnp.floor((ox - ox.min()) / cell_size), 0, nx - 1)
        cy = jnp.clip(jnp.floor((oy - oy.min()) / cell_size), 0, ny - 1)
        cell = cx.astype(jnp.int32) * ny + cy.astype(jnp.int32)
        o1 = jnp.argsort(oz)
        o2 = jnp.argsort(cell[o1], stable=True)  # stable: z order kept
        perm = o1[o2]
        cell_p = cell[perm]
        counts = jnp.bincount(cell, length=ncells)
        starts = jnp.cumsum(counts) - counts
        rank = jnp.arange(n, dtype=jnp.int32) - starts[cell_p].astype(
            jnp.int32)
        overflow = counts.max() > cap
        slot = jnp.where(overflow, jnp.arange(n, dtype=jnp.int32),
                         cell_p * cap + rank)
        ids = jnp.full((nslots,), n, jnp.int32).at[slot].set(
            perm.astype(jnp.int32))
        return ids, ids < n

    def _gather(orig, ids, valid):
        """Original-order column dict -> sentinel-padded slot columns."""
        safe = jnp.clip(ids, 0, orig["px"].shape[0] - 1)
        return {k: jnp.where(valid, orig[k][safe],
                             jnp.asarray(_SENT[k], orig[k].dtype))
                for k in orig}

    def _freeze(s_cols, valid):
        """Pin padding rows to their sentinels after a substep/pair pass."""
        return {k: jnp.where(valid, v, jnp.asarray(_SENT[k], v.dtype))
                for k, v in s_cols.items()}

    def _unbin(s, N):
        """Slot columns -> original-order columns (padding dropped).

        ``N`` is the STATIC fleet size (taken from a shape, never carried
        in the traced state). Padding slots hold ids == N, which the
        out-of-bounds scatter drops; every real slot writes its original
        row exactly once.
        """
        orig = {}
        for k in _COLS:
            orig[k] = jnp.zeros((N,), s[k].dtype).at[s["ids"]].set(
                s[k], mode="drop")
        return orig

    def _rebin(s, N):
        orig = _unbin(s, N)
        ids, valid = _layout(orig["px"], orig["py"], orig["pz"])
        out = _gather(orig, ids, valid)
        out["ids"], out["valid"], out["t"] = ids, valid, s["t"]
        return out

    def init(kin):
        orig = swarm_soa_from_kin(kin)
        n = orig["px"].shape[0]
        if nslots < n:
            raise ValueError(
                f"binned layout too small: {nslots} slots < {n} drones")
        orig["mag"] = jnp.zeros_like(orig["px"])
        ids, valid = _layout(orig["px"], orig["py"], orig["pz"])
        s = _gather(orig, ids, valid)
        s["ids"], s["valid"], s["t"] = ids, valid, jnp.int32(0)
        s["mag"] = jnp.where(
            valid, dw_m.cols(s["px"], s["py"], s["pz"], valid=valid), 0.0)
        return s

    def _substeps(cols, valid, rpm_sorted, gather_src):
        """The substep chain over one rpm period. ``gather_src(cols, valid)``
        returns (src3, src6, src_valid) pair-source columns — (None, None,
        None) for the square single-device pass, the all-gathered global
        slot columns for the sharded rectangular pass."""
        for _ in range(n_substeps):
            (cols["px"], cols["py"], cols["pz"], cols["qx"], cols["qy"],
             cols["qz"], cols["qw"], cols["vx"], cols["vy"], cols["vz"],
             cols["wx"], cols["wy"], cols["wz"]) = physics_substep_soa(
                c, dt, cols["px"], cols["py"], cols["pz"], cols["qx"],
                cols["qy"], cols["qz"], cols["qw"], cols["vx"], cols["vy"],
                cols["vz"], cols["wx"], cols["wy"], cols["wz"], rpm_sorted,
                fz_body=cols["mag"])
            # Freeze BEFORE the pair pass: the substep's plane-contact clamp
            # (velocity_soa.py:206-213) snaps padding rows from pz = -1e9 to
            # z_min, which would otherwise turn every padding slot of a live
            # tile into a phantom drone resting at the world origin — a real
            # drone landed within min_dist of (0, 0, z_min) would receive
            # phantom contact pushes (the valid-aware tile bounds exclude
            # padding from the boxes, but the kernel still computes padding
            # lanes of live tiles with only per-pair guards, and
            # (0, 0, z_min) passes them). Advisor round-4 finding.
            cols = _freeze(cols, valid)
            src3, src6, src_valid = gather_src(cols, valid)
            if collisions:
                mag, dp, dv = ia_m.cols(cols["px"], cols["py"], cols["pz"],
                                        cols["vx"], cols["vy"], cols["vz"],
                                        valid=valid, src=src6,
                                        src_valid=src_valid)
                cols["mag"] = mag
                cols["px"] = cols["px"] + dp[0]
                cols["py"] = cols["py"] + dp[1]
                cols["pz"] = cols["pz"] + dp[2]
                cols["vx"] = cols["vx"] + dv[0]
                cols["vy"] = cols["vy"] + dv[1]
                cols["vz"] = cols["vz"] + dv[2]
            else:
                cols["mag"] = dw_m.cols(cols["px"], cols["py"], cols["pz"],
                                        valid=valid, src=src3,
                                        src_valid=src_valid)
            cols = _freeze(cols, valid)
        return cols

    def step(s, rpm_cols):
        N = rpm_cols[0].shape[0]  # static fleet size
        s = jax.lax.cond((s["t"] % resort_every) == 0,
                         lambda x: _rebin(x, N), lambda x: x, s)
        ids, valid = s["ids"], s["valid"]
        cols = {k: s[k] for k in _COLS}
        if mesh is None:
            safe = jnp.clip(ids, 0, N - 1)
            rpm_sorted = [r[safe] for r in rpm_cols]  # padding rows frozen
            cols = _substeps(cols, valid, rpm_sorted,
                             lambda c, v: (None, None, None))
        else:
            # Sharded: each device owns a contiguous slab of whole cells;
            # substeps and target-side pair math are shard-local, sources
            # ride ONE all-gather per pair pass (O(N_global) floats over
            # ICI — the same collective budget as runtime/swarm.py's
            # rectangular path). The rebin above runs OUTSIDE shard_map as
            # plain global ops: XLA inserts the gather/scatter collectives
            # for the argsort permutation every ``resort_every`` steps.
            from jax import shard_map
            from jax.sharding import PartitionSpec

            P_ = PartitionSpec

            def local(cols_l, valid_l, ids_l, rpm_g):
                safe = jnp.clip(ids_l, 0, N - 1)
                rpm_sorted = [r[safe] for r in rpm_g]

                def gather(cc, vv):
                    g = lambda a: jax.lax.all_gather(a, axis, axis=0,
                                                     tiled=True)
                    gxyz = (g(cc["px"]), g(cc["py"]), g(cc["pz"]))
                    gvalid = g(vv)
                    if collisions:
                        return None, gxyz + (g(cc["vx"]), g(cc["vy"]),
                                             g(cc["vz"])), gvalid
                    return gxyz, None, gvalid

                return _substeps(cols_l, valid_l, rpm_sorted, gather)

            pcols = {k: P_(axis) for k in _COLS}
            cols = shard_map(
                local, mesh=mesh,
                in_specs=(pcols, P_(axis), P_(axis), [P_()] * 4),
                out_specs=pcols,
                # pallas_call outputs carry no varying-mesh-axes annotation
                # (same note as runtime/swarm.make_sharded_swarm_physics)
                check_vma=False,
            )(cols, valid, ids, list(rpm_cols))
        out = dict(cols)
        out["ids"], out["valid"], out["t"] = ids, valid, s["t"] + 1
        return out

    def export(s, template):
        orig = _unbin(s, template.pos.shape[0])
        orig.pop("mag")
        return swarm_soa_to_kin(orig, template)

    return init, step, export
