"""Worker process for the true multi-process jax.distributed test
(tests/test_distributed.py; VERDICT round-1 item #6).

Each of 2 processes contributes 2 virtual CPU devices -> a global 4-device
('host', 'env') mesh spanning the process boundary. The worker then

  1. runs the sharded interacting-swarm physics (PYB_DW: the downwash
     all_gather crosses processes over the distributed backend),
  2. runs ONE full PPO train step with the env axis of the runner state
     sharded over the global mesh (params/opt replicated, gradients
     psum-reduced by XLA's SPMD partitioner),
  3. (when given a 5th arg) saves the globally-sharded runner through
     runtime/checkpoint.py COLLECTIVELY from both processes and restores it
     onto the same shardings — the multi-process checkpoint path that a
     host-side np.asarray of non-addressable arrays would crash,

and writes digests of the results to a JSON file for the parent to compare
across workers (must match exactly — same program, same global data).

Usage: python distributed_worker.py <proc_id> <num_procs> <port> <out.json>
       [ckpt_dir]
"""

import json
import os
import sys

proc_id, num_procs, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", ""))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

assert len(jax.devices()) == 2 * num_procs, jax.devices()
assert len(jax.local_devices()) == 2

from gym_pybullet_drones_tpu.core.dynamics import init_kin_state  # noqa: E402
from gym_pybullet_drones_tpu.core.params import drone_params  # noqa: E402
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER  # noqa: E402
from gym_pybullet_drones_tpu.envs.spec import (  # noqa: E402
    ActionType, DroneModel, ObservationType, Physics,
)
from gym_pybullet_drones_tpu.runtime.swarm import (  # noqa: E402
    make_sharded_swarm_physics,
)

results = {}

# ---- 1. cross-process sharded swarm (downwash all_gather over 2 processes)
devices = np.asarray(jax.devices()).reshape(2 * num_procs)
mesh = Mesh(devices, ("env",))
params = drone_params(DroneModel.CF2X)
n = 16
rng = np.random.default_rng(0)
pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
pos[:, 2] += 1.0
kin = init_kin_state(jnp.asarray(pos), jnp.tile(
    jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)

sh = NamedSharding(mesh, P("env"))
kin_sh = jax.tree.map(lambda x: jax.device_put(x, sh), kin)
rpm_sh = jax.device_put(rpm, sh)
step = make_sharded_swarm_physics(mesh, params, 1 / 240, 5, Physics.PYB_DW,
                                  collisions=True)
out_kin, _ = step(kin_sh, rpm_sh, rpm_sh)
gpos = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(out_kin.pos)))
results["swarm_pos_sum"] = float(np.sum(gpos))
results["swarm_pos_digest"] = [float(v) for v in gpos.reshape(-1)[:8]]

# ---- 1b. the SAME cross-process swarm through the rectangular Pallas path
# (local targets x all-gathered sources inside shard_map, interpret mode on
# CPU). Well-conditioned unique-z cloud (0.3 m gaps, see the CLAUDE.md
# testing note) so the pallas-vs-dense comparison is not chaotic.
pos_u = pos.copy()
pos_u[:, 2] = 1.0 + 0.3 * np.arange(n, dtype=np.float32)
kin_u = init_kin_state(jnp.asarray(pos_u), jnp.tile(
    jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
kin_u_sh = jax.tree.map(lambda x: jax.device_put(x, sh), kin_u)
step_pl = make_sharded_swarm_physics(
    mesh, params, 1 / 240, 5, Physics.PYB_DW, collisions=True,
    pallas=True, interpret=True, pallas_opts=dict(bt=4, bs=8))
out_pl, _ = step_pl(kin_u_sh, rpm_sh, rpm_sh)
out_dense_u, _ = step(kin_u_sh, rpm_sh, rpm_sh)
gather = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
gpos_pl = np.asarray(jax.device_get(gather(out_pl.pos)))
gpos_du = np.asarray(jax.device_get(gather(out_dense_u.pos)))
results["swarm_pallas_pos_digest"] = [float(v)
                                      for v in gpos_pl.reshape(-1)[:8]]
results["swarm_pallas_vs_dense_max"] = float(np.abs(gpos_pl - gpos_du).max())

# ---- 2. one PPO train step, env axis sharded over the global mesh
from gym_pybullet_drones_tpu.rl.ppo import (  # noqa: E402
    PPOConfig, make_ppo_train_step, ppo_init,
)

env_cfg = AviaryConfig(num_drones=1, task=TASK_HOVER,
                       action_type=ActionType.ONE_D_RPM,
                       obs_type=ObservationType.KIN, pyb_freq=240,
                       ctrl_freq=30, action_buffer_size=15)
ppo_cfg = PPOConfig(num_envs=8, n_steps=16, minibatch_size=32)
runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(0))

repl = NamedSharding(mesh, P())
env_sh = NamedSharding(mesh, P("env"))
# device_put cannot place host arrays onto non-addressable (multi-process)
# shardings; a jitted identity with out_shardings does the global placement.
shard_tree = runner.replace(
    params=jax.tree.map(lambda _: repl, runner.params),
    opt_state=jax.tree.map(lambda _: repl, runner.opt_state),
    env_state=jax.tree.map(lambda _: env_sh, runner.env_state),
    obs=env_sh,
    rng=repl,
    update_count=repl,
)
runner = jax.jit(lambda r: r, out_shardings=shard_tree)(runner)
train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux))
runner2, metrics = train(runner)
loss = float(jax.device_get(metrics["loss"]))
mr = float(jax.device_get(metrics["mean_reward"]))
lw = np.asarray(jax.device_get(jax.tree.leaves(runner2.params)[0]))
results["ppo_loss"] = loss
results["ppo_mean_reward"] = mr
results["ppo_param_digest"] = float(np.sum(lw))
results["num_global_devices"] = len(jax.devices())
results["process_id"] = proc_id

# ---- 3. multi-process checkpoint round-trip (shared tmp dir, collective)
if len(sys.argv) > 5:
    from gym_pybullet_drones_tpu.runtime.checkpoint import (  # noqa: E402
        restore_checkpoint,
        save_checkpoint,
    )

    save_checkpoint(sys.argv[5], runner2, step=1)
    restored = restore_checkpoint(sys.argv[5], runner2, step=1)
    rw = np.asarray(jax.device_get(jax.tree.leaves(restored.params)[0]))
    results["ckpt_param_digest"] = float(np.sum(rw))
    # env leaves come back on their (non-addressable) global sharding
    pos = restored.env_state.kin.pos
    results["ckpt_env_sharded"] = bool(pos.sharding.is_equivalent_to(
        runner2.env_state.kin.pos.sharding, pos.ndim))

# ---- 4. round-5 sections (6th arg "r5"): cross-process BINNED swarm +
# cross-TOPOLOGY checkpoint restore (VERDICT r4 #7).
if len(sys.argv) > 6 and sys.argv[6] == "r5":
    from gym_pybullet_drones_tpu.ops.swarm_binned import (  # noqa: E402
        make_binned_swarm,
        shard_binned_state,
    )

    ndev = len(jax.devices())

    # 4a. binned cell-list swarm sharded over the global process-spanning
    # mesh: whole-cell slabs per device, the pair-source all_gather and the
    # rebin permutation cross the process boundary.
    bn = 64
    bpos = np.zeros((bn, 3), np.float32)
    bpos[:, 0] = np.arange(bn) * 2.0   # 2 m line: spread, wake-coupled
    bpos[:, 2] = 1.0 + 0.1 * (np.arange(bn) % 7)
    bkin = init_kin_state(jnp.asarray(bpos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (bn, 1)))
    nx = ndev  # one 10 m cell column per device x 2 rows
    b_init, b_step, b_export = make_binned_swarm(
        params, 1 / 240, 5, collisions=True, cell_size=10.0, nx=nx, ny=2,
        cap=128, resort_every=2, interpret=True, mesh=mesh)
    b_state = shard_binned_state(mesh, jax.jit(b_init)(bkin))
    b_rpm = [jnp.full((bn,), float(params.hover_rpm), jnp.float32)] * 4
    for _ in range(3):  # crosses one rebin boundary
        b_state = jax.jit(b_step)(b_state, b_rpm)
    b_kin = b_export(b_state, bkin)
    b_gpos = np.asarray(jax.device_get(gather(b_kin.pos)))
    results["binned_pos_digest"] = [float(v) for v in b_gpos.reshape(-1)[:8]]
    results["binned_pos_sum"] = float(np.sum(b_gpos))

    # 4b. cross-topology checkpoint: save the runner sharded over a 2-axis
    # ('host', 'env') mesh, restore it onto the 1-axis ('env',) mesh — the
    # orbax layout is sharding-agnostic, so a pod checkpoint can move
    # between topologies (2x4 -> 1x8 at 4 processes x 2 devices).
    mesh_a = Mesh(np.asarray(jax.devices()).reshape(2, ndev // 2),
                  ("host", "env"))
    repl_a = NamedSharding(mesh_a, P())
    env_a = NamedSharding(mesh_a, P(("host", "env")))
    shard_a = runner2.replace(
        params=jax.tree.map(lambda _: repl_a, runner2.params),
        opt_state=jax.tree.map(lambda _: repl_a, runner2.opt_state),
        env_state=jax.tree.map(lambda _: env_a, runner2.env_state),
        obs=env_a, rng=repl_a, update_count=repl_a,
    )
    runner_a = jax.jit(lambda r: r, out_shardings=shard_a)(runner2)
    ck2 = sys.argv[5] + "_topo"
    save_checkpoint(ck2, runner_a, step=7)
    # template on topology B = the original 1-axis mesh placement
    restored_b = restore_checkpoint(ck2, runner2, step=7)
    rb = np.asarray(jax.device_get(jax.tree.leaves(restored_b.params)[0]))
    results["topo_param_digest"] = float(np.sum(rb))
    results["topo_env_sharded_b"] = bool(
        restored_b.env_state.kin.pos.sharding.is_equivalent_to(
            runner2.env_state.kin.pos.sharding,
            restored_b.env_state.kin.pos.ndim))

with open(out_path, "w") as f:
    json.dump(results, f)
print("worker", proc_id, "done", flush=True)
