"""Checkpoint / resume for the full actor-learner pytree.

The reference has no env/trainer checkpointing — SB3 persists only the policy
(learn.py:98, play.py:26) and env state is never serialized (SURVEY §5). Here
the *entire* run state — env batch, policy params, optimizer state, RNG key,
update counter — is one pytree (`PPORunnerState` or any other), saved with
orbax so multi-hour training runs are resumable and bit-reproducible.
"""

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax always baked in this image
    _HAS_ORBAX = False

from flax import serialization


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def _unkey(tree):
    """Typed PRNG keys -> raw uint32 key data (serializable)."""
    return jax.tree.map(lambda x: jax.random.key_data(x) if _is_key(x) else x, tree)


def save_checkpoint(path: str, tree: Any, step: int = 0) -> str:
    """Write `tree` under `path/step_<step>`; returns the checkpoint dir.

    Leaves are handed to orbax AS-IS (after PRNG-key unwrapping): orbax
    serializes `jax.Array`s through their shardings, so arrays spanning
    non-addressable devices (multi-process meshes, `mesh.init_distributed`)
    save correctly — every process must call this collectively, as usual for
    a distributed checkpoint. Forcing leaves through `np.asarray` here would
    raise on exactly those arrays."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.join(path, f"step_{step}")
    tree = _unkey(tree)
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(ckpt_dir, tree, force=True)
    else:
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(ckpt_dir, "tree.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.tree.map(np.asarray, tree)))
    return ckpt_dir


def restore_checkpoint(path: str, template: Any, step: int = None) -> Any:
    """Restore into the structure of `template` (shapes/dtypes must match).
    With `step=None`, picks the highest `step_*` under `path`."""
    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step < 0:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckpt_dir = os.path.join(path, f"step_{step}")
    flat_template = _unkey(template)
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        # Restore jax.Array leaves straight onto the template's shardings
        # (multi-process-safe; no host-side np materialization of the tree).
        restore_args = ocp.checkpoint_utils.construct_restore_args(flat_template)
        restored = ckptr.restore(ckpt_dir, item=flat_template,
                                 restore_args=restore_args)
    else:
        with open(os.path.join(ckpt_dir, "tree.msgpack"), "rb") as f:
            restored = serialization.from_bytes(flat_template, f.read())

    # Re-materialize on device with the template's dtypes, rewrapping PRNG keys
    def back(t, r):
        if _is_key(t):
            return jax.random.wrap_key_data(jax.numpy.asarray(r))
        return jax.numpy.asarray(r, dtype=t.dtype if hasattr(t, "dtype") else None)

    # template and flat_template share structure; map over the original to
    # know which leaves were keys
    return jax.tree.map(back, template, restored)


def latest_step(path: str) -> int:
    """Largest completed step under ``path``. Non-numeric `step_*` entries —
    notably orbax's `step_<n>.orbax-checkpoint-tmp-<ts>` leftovers from an
    interrupted save — are skipped, so resume works after a crash mid-save."""
    steps = []
    for d in os.listdir(path):
        if not d.startswith("step_"):
            continue
        suffix = d.split("_", 1)[1]
        if suffix.isdigit():
            steps.append(int(suffix))
    return max(steps) if steps else -1
