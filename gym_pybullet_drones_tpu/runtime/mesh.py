"""Device-mesh placement: sharded env batches and cross-chip swarm physics.

The reference is strictly single-process (SURVEY §2.3: one PyBullet client,
sequential per-drone loops, SB3 with n_envs=1). Its TPU-native replacement
scales along two data axes:

* the **env axis** — independent environment instances sharded over chips via
  `NamedSharding(mesh, P('env'))`; no cross-shard communication at all.
* the **drone axis** of one big swarm — sharded drones of a single aviary,
  where the only cross-drone couplings are downwash (BaseAviary.py:798-811)
  and the adjacency matrix (:658-675). Both need each shard to see *all* drone
  positions: an `all_gather` of the (N, 3) position block over ICI, a few KB
  at 4096 drones, inside `shard_map`.

Multi-host: call `init_distributed()` first (jax.distributed), then every host
builds the same global mesh; DCN carries only orchestration, all collectives
ride ICI.
"""

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gym_pybullet_drones_tpu.core import aero
from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig
from gym_pybullet_drones_tpu.runtime.rollout import make_batched_step


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host pods (no-op single-host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(axis_names: Sequence[str] = ("env",),
              devices: Optional[Sequence] = None,
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """A device mesh over all (or the given) devices.

    Default: 1-D mesh named `env` — the primary data axis of the suite. Pass
    `axis_names=('host', 'env')` with a matching `shape` for explicit host ×
    chip layouts.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    return Mesh(devices.reshape(tuple(shape)), tuple(axis_names))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Sharding that splits a leading env/batch axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def _tree_identity(tree):
    return tree


def _put_tree(tree, shardings):
    """Place a whole pytree onto `shardings` (one sharding or a matching
    pytree of them), multi-process-safe.

    `jax.device_put` refuses host arrays on NON-ADDRESSABLE shardings (a
    multi-host mesh where this process owns only some devices); a jitted
    identity with `out_shardings` performs the same placement through the
    runtime's global-array machinery (the CLAUDE.md-documented workaround,
    exercised by tests/distributed_worker.py). The whole tree goes through
    ONE jitted call (cached on the module-level identity) — a per-leaf jit
    would pay a trace round-trip per leaf. Zero-sized leaves (e.g. an empty
    action buffer) are placed by device_put instead: XLA force-replicates
    empty outputs, so the jitted identity cannot honor their sharding (and
    there is no data to distribute anyway)."""
    if isinstance(shardings, jax.sharding.Sharding):
        sh_tree = jax.tree.map(lambda _: shardings, tree)
    else:
        sh_tree = shardings
    leaves, treedef = jax.tree.flatten(tree)
    sh_leaves = jax.tree.flatten(sh_tree)[0]
    live = [i for i, x in enumerate(leaves) if x.size > 0]
    out = list(leaves)
    for i, x in enumerate(leaves):
        if x.size == 0:
            out[i] = jax.device_put(x, sh_leaves[i])
    placed = jax.jit(_tree_identity, out_shardings=tuple(
        sh_leaves[i] for i in live))(tuple(leaves[i] for i in live))
    for k, i in enumerate(live):
        out[i] = placed[k]
    return jax.tree.unflatten(treedef, out)


def shard_env_batch(mesh: Mesh, tree, axis: str = "env"):
    """Place a batched pytree (leading env axis) onto the mesh, sharded."""
    return _put_tree(tree, env_sharding(mesh, axis))


def make_sharded_batched_step(cfg: AviaryConfig, params, ctrl_params, target_pos,
                              mesh: Mesh, axis: str = "env",
                              auto_reset: bool = True, donate: bool = True):
    """Jitted env-batch step with explicit in/out shardings over `mesh`.

    The batch axis is fully data-parallel — XLA compiles one per-shard program
    and inserts zero collectives. State is donated so HBM holds one copy.
    """
    step = make_batched_step(cfg, params, ctrl_params, target_pos, auto_reset)
    sh = env_sharding(mesh, axis)
    return jax.jit(
        step,
        in_shardings=(sh, sh),
        out_shardings=(sh, sh),
        donate_argnums=(0,) if donate else (),
    )


################################################################################
# Sharded single-swarm physics: the drone axis spans the mesh.
################################################################################


def make_swarm_downwash_fn(mesh: Mesh, params, axis: str = "env"):
    """Cross-shard downwash: each shard holds a (N/D, 3) slab of positions and
    needs the source heights of *all* drones (BaseAviary.py:798-811 is a global
    O(N^2) pair sum). Implemented as `all_gather` of positions over ICI inside
    `shard_map`, then the local (N/D, N) vectorized pair kernel.
    """

    def local_dw(pos_local):
        pos_all = jax.lax.all_gather(pos_local, axis, axis=0, tiled=True)
        return aero.downwash_forces_body_z(pos_local, params, pos_above=pos_all)

    return shard_map(
        local_dw, mesh=mesh,
        in_specs=P(axis, None), out_specs=P(axis),
    )


def make_swarm_adjacency_fn(mesh: Mesh, neighbourhood_radius, axis: str = "env"):
    """Sharded adjacency: (N/D, N) strip per shard (BaseAviary.py:658-675)."""

    def local_adj(pos_local):
        pos_all = jax.lax.all_gather(pos_local, axis, axis=0, tiled=True)
        d = jnp.linalg.norm(pos_local[:, None, :] - pos_all[None, :, :], axis=-1)
        adj = (d < neighbourhood_radius).astype(pos_local.dtype)
        # Self-distance is 0 < radius, so the diagonal is already 1 as in the
        # reference (it adds the identity explicitly).
        return adj

    return shard_map(
        local_adj, mesh=mesh,
        in_specs=P(axis, None), out_specs=P(axis, None),
    )


def shard_swarm_state(mesh: Mesh, state, axis: str = "env"):
    """Place a single-aviary state onto the mesh with the DRONE axis sharded.

    Most leaves (kin components, last_rpm, controller memory) carry the drone
    axis first; `action_buffer` is (B, N, A) with the buffer-slot axis
    leading (envs/base.py AviaryState), so its *second* axis is sharded;
    scalars (`step_count`) are replicated.
    """
    sh = NamedSharding(mesh, P(axis))
    sh_second = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())

    buf = state.action_buffer
    buf_sh = sh_second if (buf.ndim >= 2 and buf.shape[0] > 0) else rep

    # held camera frames carry the drone axis first like kin; a None leaf
    # (KIN envs) passes through untouched. One _put_tree call places the
    # whole state (single jitted identity, not per-leaf compiles).
    def leaf_sh(x):
        return rep if x.ndim == 0 else sh

    sh_tree = state.replace(
        kin=jax.tree.map(leaf_sh, state.kin),
        last_rpm=leaf_sh(state.last_rpm),
        ctrl=jax.tree.map(leaf_sh, state.ctrl),
        action_buffer=buf_sh,
        step_count=rep,
        rgb_frames=(None if state.rgb_frames is None
                    else leaf_sh(state.rgb_frames)),
    )
    return _put_tree(state, sh_tree)
