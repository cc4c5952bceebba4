"""Pallas TPU kernel: whole VelocityAviary rollout chunks in VMEM.

The SoA step (`ops/velocity_soa.py`) already fuses one control step into a
few elementwise kernels, but a `lax.scan` still round-trips the state through
HBM every step. Here the *time loop moves inside a single Pallas kernel*: all
26 state components ((E,) f32 arrays, ~0.4 MB at E=4096) live in VMEM for the
entire chunk, and `velocity_step_soa` — shape-agnostic elementwise math —
runs on (E/128, 128) tiles inside a `fori_loop`. One kernel launch per chunk,
zero HBM traffic between steps.

Layout: E must be a multiple of 1024 (tiles of (8, 128) per grid row); the
drone axis is split across a 1-D grid so large fleets scale past one core's
VMEM.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_drones_tpu.ops.velocity_soa import SOA_KEYS, velocity_step_soa

_ACTION_KEYS = ("ax", "ay", "az", "amag")
# Per-grid-cell drone count. Grid cells execute serially on a TensorCore, so
# fewer/larger cells shorten the serial chain — but Mosaic compile time of the
# 26-carry fori_loop grows pathologically with tile rows (a (32, 128) block at
# E=4096 did not finish compiling in 8 minutes on v5p, while (8, 128) blocks
# compile in seconds and reach 25M env-steps/s). Measured end to end, the
# XLA-fused SoA scan (`velocity_step_soa` under `lax.scan`, 27.8M steps/s)
# still beats this kernel at 4096 drones; the Pallas path mainly demonstrates
# the VMEM-resident rollout pattern and wins only when HBM traffic dominates.
_MAX_BLOCK = 1024


def make_velocity_rollout_pallas(consts, ctrl_dt, pyb_dt, n_substeps,
                                 speed_limit, num_steps: int,
                                 interpret: bool = False):
    """Build `rollout(soa_dict, action_dict) -> soa_dict` advancing
    `num_steps` control steps in one Pallas kernel."""

    n_state = len(SOA_KEYS)
    step = partial(velocity_step_soa, consts, ctrl_dt, pyb_dt, n_substeps,
                   speed_limit)

    def kernel(*refs):
        in_refs = refs[:n_state]
        act_refs = refs[n_state:n_state + 4]
        out_refs = refs[n_state + 4:]
        ax, ay, az, amag = (r[:] for r in act_refs)

        def body(_, carry):
            s = dict(zip(SOA_KEYS, carry))
            s = step(s, ax, ay, az, amag)
            return tuple(s[k] for k in SOA_KEYS)

        init = tuple(r[:] for r in in_refs)
        final = jax.lax.fori_loop(0, num_steps, body, init)
        for r, v in zip(out_refs, final):
            r[:] = v

    def rollout(soa: Dict[str, jax.Array], action: Dict[str, jax.Array]):
        E = soa[SOA_KEYS[0]].shape[0]
        assert E % 1024 == 0, f"E={E} must be a multiple of 1024"
        block = min(E, _MAX_BLOCK)
        grid = (E // block,)
        tiled = {k: v.reshape(E // 128, 128) for k, v in soa.items()}
        tiled_a = {k: action[k].reshape(E // 128, 128) for k in _ACTION_KEYS}
        rows = block // 128
        spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * (n_state + 4),
            out_specs=tuple([spec] * n_state),
            out_shape=tuple(
                jax.ShapeDtypeStruct((E // 128, 128), jnp.float32)
                for _ in range(n_state)),
            interpret=interpret,
        )(*[tiled[k] for k in SOA_KEYS], *[tiled_a[k] for k in _ACTION_KEYS])
        return {k: o.reshape(E) for k, o in zip(SOA_KEYS, outs)}

    return rollout
