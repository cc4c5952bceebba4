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


def _put(x, sharding):
    """Place one array onto a sharding, multi-process-safe.

    `jax.device_put` refuses host arrays on NON-ADDRESSABLE shardings (a
    multi-host mesh where this process owns only some devices); a jitted
    identity with `out_shardings` performs the same placement through the
    runtime's global-array machinery (the CLAUDE.md-documented workaround,
    exercised by tests/distributed_worker.py). Zero-sized arrays (e.g. an
    empty action buffer) fall back to device_put — XLA force-replicates
    empty outputs, so the jitted identity cannot honor the sharding (and
    there is no data to distribute anyway)."""
    if x.size == 0:
        return jax.device_put(x, sharding)
    return jax.jit(lambda a: a, out_shardings=sharding)(x)


def shard_env_batch(mesh: Mesh, tree, axis: str = "env"):
    """Place a batched pytree (leading env axis) onto the mesh, sharded."""
    sh = env_sharding(mesh, axis)
    return jax.tree.map(lambda x: _put(x, sh), tree)


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
    if buf.ndim >= 2 and buf.shape[0] > 0:
        buf = _put(buf, sh_second)
    else:
        buf = _put(buf, rep)

    def place(x):
        if x.ndim == 0:
            return _put(x, rep)
        return _put(x, sh)

    return state.replace(
        kin=jax.tree.map(place, state.kin),
        last_rpm=place(state.last_rpm),
        ctrl=jax.tree.map(place, state.ctrl),
        action_buffer=buf,
        step_count=_put(state.step_count, rep),
        # held camera frames carry the drone axis first like kin; a None
        # leaf (KIN envs) passes through untouched
        rgb_frames=(None if state.rgb_frames is None
                    else place(state.rgb_frames)),
    )
