"""On-device PPO: the actor-learner loop as one jitted, shardable program.

The reference trains its RL tasks with stable-baselines3 PPO on CPU/torch
(examples/learn.py:73-95: `PPO('MlpPolicy', ...)`, n_envs=1, EvalCallback with
StopTrainingOnRewardThreshold). Here the entire loop — policy forward, env
physics, GAE, minibatched clipped-surrogate updates — is a single XLA program:
rollouts are `lax.scan`s over the batched env step, updates are `lax.scan`s
over epochs/minibatches, and the env batch axis shards over a device mesh
(data parallelism; XLA inserts the gradient all-reduce automatically when
params are replicated and the batch is sharded).

Network and hyperparameters mirror SB3 defaults so solved-reward thresholds
are comparable (learn.py:79-82): MlpPolicy = separate pi/vf towers of two
tanh-64 layers, Gaussian policy with state-independent log-std, lr 3e-4,
n_steps 2048, 10 epochs, minibatch 64, gamma 0.99, GAE lambda 0.95, clip 0.2,
vf coef 0.5, max grad norm 0.5.
"""

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset, make_batched_step


class ActorCritic(nn.Module):
    """SB3-MlpPolicy-equivalent actor-critic (separate towers, tanh, 64-64).

    Accepts obs of shape (E, ...) and flattens per environment."""

    action_dim: int
    hidden: Sequence[int] = (64, 64)
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        obs = obs.reshape(obs.shape[0], -1)
        x = obs
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                                 bias_init=nn.initializers.zeros)(x))
        mean = nn.Dense(self.action_dim, kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(self.log_std_init), (self.action_dim,)
        )
        v = obs
        for h in self.hidden:
            v = nn.tanh(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                                 bias_init=nn.initializers.zeros)(v))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(v)
        return mean, log_std, jnp.squeeze(value, -1)


class CnnActorCritic(nn.Module):
    """SB3-CnnPolicy-equivalent actor-critic for RGB observations.

    Input (E, N, H, W, 4) uint8 drone-POV frames; each drone's frame passes
    through a NatureCNN feature extractor (32x8s4 / 64x4s2 / 64x3s1 -> 512,
    the SB3 CnnPolicy default), features concatenate across drones, then the
    usual separate pi/vf MLP heads.

    The pi/vf head code deliberately repeats ActorCritic's: factoring the
    heads into a shared submodule would change the flax parameter paths and
    invalidate every committed checkpoint in checkpoints/ (the round-3
    review weighed the cleanup and kept serialization compatibility)."""

    action_dim: int
    hidden: Sequence[int] = (64, 64)
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        E, N = obs.shape[0], obs.shape[1]
        x = obs.astype(jnp.float32).reshape((E * N,) + obs.shape[2:]) / 255.0
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID")(x))
        x = x.reshape(E * N, -1)
        x = nn.relu(nn.Dense(512)(x))
        feat = x.reshape(E, -1)
        pi = feat
        for h in self.hidden:
            pi = nn.tanh(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                                  bias_init=nn.initializers.zeros)(pi))
        mean = nn.Dense(self.action_dim, kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(pi)
        log_std = self.param(
            "log_std", nn.initializers.constant(self.log_std_init), (self.action_dim,)
        )
        v = feat
        for h in self.hidden:
            v = nn.tanh(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                                 bias_init=nn.initializers.zeros)(v))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(v)
        return mean, log_std, jnp.squeeze(value, -1)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """PPO hyperparameters, SB3-defaulted where the setting is per-update
    math (lr 3e-4, gamma 0.99, gae_lambda 0.95, clip 0.2, 10 epochs,
    minibatch 64, tanh 64-64 nets, log_std_init 0). n_steps defaults to 256
    rather than SB3's 2048: SB3 tuned that for n_envs=1, while this learner
    runs wide env batches — the PRODUCT num_envs*n_steps (samples per
    update) is the comparable quantity."""

    num_envs: int = 8
    n_steps: int = 256  # per-env rollout length between updates
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    n_epochs: int = 10
    # None = SB3-equivalent auto-scaling: keep SB3's 32 minibatches per epoch
    # (2048-sample batch / 64-row minibatch) whatever the env-batch width.
    # At the SB3 shape (batch 2048) this resolves to exactly 64, so defaults
    # are unchanged; at wide batches it removes the round-2 latency chain —
    # 128 envs x 128 steps with 64-row minibatches was 2,560 serial tiny
    # grad steps per update, 87 ms of pure device latency (docs/PERF.md).
    # Updating with the same sample count in 32 larger minibatches per epoch
    # is the standard same-compute scaling (one gradient step per 512 rows
    # instead of 8 steps of 64); pass an explicit int to pin SB3's 64.
    minibatch_size: Optional[int] = None
    hidden: tuple = (64, 64)
    log_std_init: float = 0.0  # initial Gaussian log-std (SB3 default 0.0)
    # Exploration-noise annealing: cap the learned log_std from above along a
    # linear schedule log_std_init -> log_std_anneal_to over
    # log_std_anneal_updates updates (None disables). Shrinks the gap between
    # the stochastic training policy and the deterministic eval policy —
    # policies otherwise learn to lean on action noise for attitude dither
    # (docs/ROUND1.md, 4-dim RPM finding) and fall over when the noise is
    # removed at eval time.
    log_std_anneal_to: Optional[float] = None
    log_std_anneal_updates: int = 1
    # KL-adaptive learning rate (round-4 RGB ablation arm, VERDICT r3 item
    # 5): when set, the optimizer is built with injectable hyperparams and
    # after every update the LR adapts on the classic rule — approx_kl
    # (mean (ratio-1) - log ratio) above 2x target shrinks LR by 1.5x, below
    # target/2 grows it 1.5x, clamped to [lr/100, lr*100]. None = fixed LR.
    target_kl: Optional[float] = None
    # Mixed deterministic/stochastic rollouts (round-4 RGB-collapse
    # countermeasure): the first round(det_frac * num_envs) envs roll out
    # with the MEAN action (no exploration noise). Rationale: the measured
    # collapse mode trains a noise-dithering policy whose stochastic return
    # stays high while its mean is useless (docs/ROUND4.md item 5 — eval
    # freezes at the constant-action attractor while train return holds
    # ~426). With det envs in the batch, the mean policy's own state
    # distribution and returns enter the PPO objective: drifting mean
    # competence shows up as negative advantages instead of being invisible.
    # The importance ratio stays well-defined — the mean action has finite
    # Gaussian density under the behavior policy. 0.0 disables (default).
    det_frac: float = 0.0
    # Mean-policy anchoring (round-5 from-scratch-RGB fix, VERDICT r4 #3):
    # when > 0, `make_ppo_train_step(..., anchor=True)` builds a
    # `train(runner, anchor_params)` step whose loss adds
    # anchor_coef * E[(mu_theta(s) - mu_anchor(s))^2] over the minibatch
    # states — a BC pull of the policy MEAN toward a reference snapshot
    # (typically the best deterministic-eval params so far, updated by the
    # host loop). Counters the measured RGB collapse where PPO's stochastic
    # objective abandons deterministic competence (docs/ROUND4.md item 5):
    # the anchor makes drifting away from the best-known mean policy an
    # explicit cost while leaving exploration and the value head free.
    anchor_coef: float = 0.0

    @property
    def batch_size(self) -> int:
        return self.num_envs * self.n_steps

    @property
    def resolved_minibatch_size(self) -> int:
        if self.minibatch_size is not None:
            return self.minibatch_size
        return max(1, self.batch_size // 32)  # SB3: 32 minibatches/epoch

    @property
    def num_minibatches(self) -> int:
        # Static shapes cannot process SB3's trailing partial minibatch, so
        # non-divisors are an error rather than silent sample dropping
        # (an explicit 100-row request against a 2048 batch would otherwise
        # quietly become 102 rows with 8 samples never visited per epoch).
        if self.batch_size % self.resolved_minibatch_size != 0:
            raise ValueError(
                f"minibatch_size {self.resolved_minibatch_size} must divide "
                f"batch_size {self.batch_size} (= num_envs * n_steps); SB3's "
                "partial trailing minibatch has no static-shape equivalent")
        return self.batch_size // self.resolved_minibatch_size


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array


@struct.dataclass
class PPORunnerState:
    params: Any
    opt_state: Any
    env_state: Any
    obs: jax.Array
    rng: jax.Array
    update_count: jax.Array


def _gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2.0 * log_std + jnp.log(2.0 * jnp.pi)),
        axis=-1,
    )


def ppo_init(env_cfg: AviaryConfig, ppo_cfg: PPOConfig, rng: jax.Array,
             params_env=None, ctrl_params=None, target_pos=None,
             domain_rand=None):
    """Initial `PPORunnerState` plus the (network, optimizer) pair.

    ``domain_rand`` is an optional `core.params.randomize_params` spec (e.g.
    ``{"m": 0.1, "kf": 0.05}``): each training env then steps its own
    perturbed plant (aux["train_params_env"], picked up by
    `make_ppo_train_step`) while evaluation and the controller constants stay
    nominal — the standard sim2real protocol.
    """
    params_env = envbase.build_params(env_cfg) if params_env is None else params_env
    ctrl_params = envbase.build_ctrl_params(env_cfg) if ctrl_params is None else ctrl_params
    if target_pos is None:
        target_pos = envbase.hover_target_pos(env_cfg, params_env)
    from gym_pybullet_drones_tpu.envs.spec import ObservationType

    act_dim = env_cfg.num_drones * env_cfg.action_dim
    rng, init_key = jax.random.split(rng)
    if env_cfg.obs_type == ObservationType.RGB:
        network = CnnActorCritic(action_dim=act_dim, hidden=ppo_cfg.hidden,
                                 log_std_init=ppo_cfg.log_std_init)
        params = network.init(
            init_key,
            jnp.zeros((1, env_cfg.num_drones, 48, 64, 4 * env_cfg.frame_stack),
                      jnp.uint8))
    else:
        network = ActorCritic(action_dim=act_dim, hidden=ppo_cfg.hidden,
                              log_std_init=ppo_cfg.log_std_init)
        params = network.init(
            init_key, jnp.zeros((1, env_cfg.num_drones * env_cfg.obs_dim)))
    adam = (optax.inject_hyperparams(optax.adam)(
                learning_rate=ppo_cfg.learning_rate, eps=1e-5)
            if ppo_cfg.target_kl is not None
            else optax.adam(ppo_cfg.learning_rate, eps=1e-5))
    tx = optax.chain(
        optax.clip_by_global_norm(ppo_cfg.max_grad_norm),
        adam,
    )
    opt_state = tx.init(params)
    env_state = batch_reset(env_cfg, params_env, ppo_cfg.num_envs)
    obs = jax.vmap(lambda s: envbase.compute_obs(env_cfg, s))(env_state)
    # For RGB configs compute_obs returns the held-frame slot ITSELF
    # (env_state.rgb_frames) — copy so the donated train step doesn't see the
    # same buffer twice (runner.obs and runner.env_state alias otherwise).
    obs = jnp.array(obs)
    runner = PPORunnerState(
        params=params, opt_state=opt_state, env_state=env_state,
        obs=obs, rng=rng, update_count=jnp.zeros((), jnp.int32),
    )
    aux = dict(network=network, tx=tx, params_env=params_env,
               ctrl_params=ctrl_params, target_pos=target_pos)
    if domain_rand:
        from gym_pybullet_drones_tpu.core.params import randomize_params

        rng, dr_key = jax.random.split(runner.rng)
        aux["train_params_env"] = randomize_params(
            dr_key, params_env, ppo_cfg.num_envs, domain_rand)
        runner = runner.replace(rng=rng)
    return runner, aux


def make_ppo_train_step(env_cfg: AviaryConfig, ppo_cfg: PPOConfig, aux,
                        anchor: bool = False):
    """Build `train_step(runner) -> (runner, metrics)`: one rollout + update
    cycle, fully jittable (wrap in `jax.jit` or pjit with sharded env axis).

    ``anchor=True`` (round-5, PPOConfig.anchor_coef): the returned step has
    signature ``train(runner, anchor_params) -> (runner, metrics)`` and the
    loss adds the mean-policy BC pull toward ``anchor_params`` (stop-grad)
    — pass the best deterministic-eval snapshot from the host loop."""
    network, tx = aux["network"], aux["tx"]
    step_env = make_batched_step(
        env_cfg, aux.get("train_params_env", aux["params_env"]),
        aux["ctrl_params"], aux["target_pos"], auto_reset=True,
    )
    n_drones, act_per = env_cfg.num_drones, env_cfg.action_dim

    n_det = int(round(ppo_cfg.det_frac * ppo_cfg.num_envs))

    def policy_sample(params, obs, key):
        mean, log_std, value = network.apply(params, obs)
        noise = jax.random.normal(key, mean.shape)
        if n_det > 0:  # mixed-determinism rollout (PPOConfig.det_frac)
            det = (jnp.arange(mean.shape[0]) < n_det)[:, None]
            noise = jnp.where(det, 0.0, noise)
        action = mean + jnp.exp(log_std) * noise
        logp = _gaussian_log_prob(mean, log_std, action)
        return action, logp, value

    def compute_gae(traj: Transition, last_value):
        # Standard GAE recursion: transition t bootstraps from V(s_{t+1})
        # masked by ITS OWN done_t (after a done, s_{t+1} is the auto-reset
        # obs of a new episode and must not leak value across the boundary).
        def body(carry, inp):
            gae, next_value = carry
            value, reward, done = inp
            nonterminal = 1.0 - done.astype(value.dtype)
            delta = reward + ppo_cfg.gamma * next_value * nonterminal - value
            gae = delta + ppo_cfg.gamma * ppo_cfg.gae_lambda * nonterminal * gae
            return (gae, value), gae

        (_, _), advantages = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            (traj.value, traj.reward, traj.done),
            reverse=True,
        )
        return advantages, advantages + traj.value

    def loss_fn(params, batch, advantages, returns, anchor_params=None):
        mean, log_std, value = network.apply(params, batch.obs)
        logp = _gaussian_log_prob(mean, log_std, batch.action)
        ratio = jnp.exp(logp - batch.log_prob)
        norm_adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = -norm_adv * ratio
        pg2 = -norm_adv * jnp.clip(ratio, 1.0 - ppo_cfg.clip_range, 1.0 + ppo_cfg.clip_range)
        pg_loss = jnp.maximum(pg1, pg2).mean()
        v_loss = 0.5 * jnp.mean((value - returns) ** 2)
        entropy = jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
        total = pg_loss + ppo_cfg.vf_coef * v_loss - ppo_cfg.ent_coef * entropy
        if anchor_params is not None:
            # Mean-policy BC anchor (PPOConfig.anchor_coef): pull mu_theta
            # toward the reference snapshot's mean on the SAME minibatch
            # states; the snapshot is stop-grad by construction.
            a_mean, _, _ = network.apply(
                jax.lax.stop_gradient(anchor_params), batch.obs)
            total = total + ppo_cfg.anchor_coef * jnp.mean(
                (mean - a_mean) ** 2)
        # stable approx_kl estimator (Schulman): E[(r - 1) - log r]
        approx_kl = jnp.mean((ratio - 1.0) - jnp.log(ratio + 1e-12))
        return total, (pg_loss, v_loss, entropy, approx_kl)

    def train_step(runner: PPORunnerState, anchor_params=None):
        rng, roll_rng, perm_rng = jax.random.split(runner.rng, 3)
        keys = jax.random.split(roll_rng, ppo_cfg.n_steps)

        def rollout_body(carry, key):
            env_state, obs = carry
            action, logp, value = policy_sample(runner.params, obs, key)
            env_action = jnp.clip(action, -1.0, 1.0).reshape(
                action.shape[0], n_drones, act_per
            )
            env_state, out = step_env(env_state, env_action)
            done = out.terminated | out.truncated
            trunc_only = out.truncated & ~out.terminated
            tr = Transition(obs=obs, action=action, log_prob=logp, value=value,
                            reward=out.reward, done=done)
            return (env_state, out.obs), (tr, out.final_obs, trunc_only)

        (env_state, obs), (traj, final_obs, trunc_only) = jax.lax.scan(
            rollout_body, (runner.env_state, runner.obs), keys
        )
        raw_rewards = traj.reward
        # SB3 TimeLimit semantics: on truncation (not termination), bootstrap
        # the cut-off return with V of the TRUE next obs (final_obs — the
        # pre-auto-reset observation). One batched (T*E) forward here instead
        # of a second network.apply on every scan step: identical values,
        # but the T per-step forwards (a full NatureCNN each for RGB obs)
        # become one MXU-friendly batch.
        fo = final_obs.reshape((-1,) + final_obs.shape[2:])
        _, _, fv = network.apply(runner.params, fo)
        final_value = fv.reshape(final_obs.shape[:2])
        traj = traj._replace(
            reward=traj.reward
            + ppo_cfg.gamma * final_value * trunc_only.astype(final_value.dtype))
        # Only the value head is needed for the GAE tail: a direct apply
        # avoids sampling dead Gaussian noise with the carried `rng` (which
        # is re-split at the top of the next train_step — key reuse).
        _, _, last_value = network.apply(runner.params, obs)
        advantages, returns = compute_gae(traj, last_value)

        # Flatten (T, E, ...) -> (T*E, ...)
        def fl(x):
            return x.reshape((-1,) + x.shape[2:])

        flat = Transition(*[fl(x) for x in traj]), fl(advantages), fl(returns)
        batch, adv, ret = flat
        bsz = ppo_cfg.batch_size
        nmb = ppo_cfg.num_minibatches
        mbs = bsz // nmb

        def epoch_body(carry, key):
            params, opt_state = carry
            perm = jax.random.permutation(key, bsz)
            # Per-minibatch index gathers, NOT a whole-batch shuffle: measured
            # (round 3, 8192 envs) the update is bound by the minibatch
            # fwd+bwd itself (1.38 of the 1.43 ms step — skinny 64-wide f32
            # matmuls pack the MXU at a few percent), and an epoch-level
            # shuffle ADDS ~23 ms/epoch of gather traffic (478 -> 705 ms per
            # train step) for identical minibatch contents.

            def mb_body(carry, idx):
                params, opt_state = carry
                take = lambda x: jnp.take(x, jax.lax.dynamic_slice_in_dim(perm, idx * mbs, mbs), axis=0)
                mb = Transition(*[take(x) for x in batch])
                (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb, take(adv), take(ret), anchor_params
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, parts[3])

            (params, opt_state), (losses, kls) = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(nmb)
            )
            return (params, opt_state), (losses, kls)

        epoch_keys = jax.random.split(perm_rng, ppo_cfg.n_epochs)
        (params, opt_state), (losses, kls) = jax.lax.scan(
            epoch_body, (runner.params, runner.opt_state), epoch_keys
        )
        approx_kl = kls[-1].mean()  # last epoch: the post-update divergence
        if ppo_cfg.target_kl is not None:
            # Classic adaptive-KL LR rule on the injected adam hyperparams.
            inj = opt_state[1]
            lr = inj.hyperparams["learning_rate"]
            lr = jnp.where(approx_kl > 2.0 * ppo_cfg.target_kl, lr / 1.5,
                           jnp.where(approx_kl < 0.5 * ppo_cfg.target_kl,
                                     lr * 1.5, lr))
            lr = jnp.clip(lr, ppo_cfg.learning_rate / 100.0,
                          ppo_cfg.learning_rate * 100.0)
            inj = inj._replace(
                hyperparams={**inj.hyperparams, "learning_rate": lr})
            opt_state = (opt_state[0], inj)
        if ppo_cfg.log_std_anneal_to is not None:
            frac = jnp.minimum(
                1.0, (runner.update_count + 1.0)
                / max(1, ppo_cfg.log_std_anneal_updates))
            cap = ppo_cfg.log_std_init + (
                ppo_cfg.log_std_anneal_to - ppo_cfg.log_std_init) * frac
            ls = jnp.minimum(params["params"]["log_std"], cap)
            params = {**params,
                      "params": {**params["params"], "log_std": ls}}
        metrics = dict(
            loss=losses.mean(),
            mean_reward=raw_rewards.mean(),  # env reward, without bootstrap
            mean_value=traj.value.mean(),
            episodes_done=traj.done.sum(),
            approx_kl=approx_kl,
        )
        if n_det > 0:  # the mean policy's own training return, per step
            metrics["mean_reward_det"] = raw_rewards[:, :n_det].mean()
        new_runner = PPORunnerState(
            params=params, opt_state=opt_state, env_state=env_state,
            obs=obs, rng=rng, update_count=runner.update_count + 1,
        )
        return new_runner, metrics

    return train_step


def make_ppo_train_loop(env_cfg: AviaryConfig, ppo_cfg: PPOConfig, aux,
                        updates_per_call: int):
    """Chain `updates_per_call` full PPO update cycles into ONE jitted
    dispatch (lax.scan over the train step). Each device dispatch costs ~30 ms
    of host latency (docs/PERF.md), so chaining updates matters once a single
    update is sub-100 ms. Returns `(runner, stacked_metrics)` where metric
    leaves gain a leading (updates_per_call,) axis."""
    train_step = make_ppo_train_step(env_cfg, ppo_cfg, aux)

    @partial(jax.jit, donate_argnums=(0,))
    def train_loop(runner):
        def body(r, _):
            r, m = train_step(r)
            return r, m
        return jax.lax.scan(body, runner, None, length=updates_per_call)

    return train_loop


def _eval_run_fn(env_cfg: AviaryConfig, aux, num_steps: int, num_envs: int,
                 deterministic: bool):
    """Build (and cache in `aux`) the jitted eval rollout — a fresh jit per
    call would retrace on every evaluation."""
    cache = aux.setdefault("_eval_cache", {})
    key = (num_steps, num_envs, deterministic)
    if key in cache:
        return cache[key]
    network = aux["network"]
    step_env = make_batched_step(
        env_cfg, aux["params_env"], aux["ctrl_params"], aux["target_pos"],
        auto_reset=True,
    )

    def body(params, carry, key):
        env_state, obs = carry
        mean, log_std, _ = network.apply(params, obs)
        action = mean if deterministic else mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        env_action = jnp.clip(action, -1.0, 1.0).reshape(
            obs.shape[0], env_cfg.num_drones, env_cfg.action_dim
        )
        env_state, out = step_env(env_state, env_action)
        done = out.terminated | out.truncated
        return (env_state, out.obs), (out.reward, done)

    @jax.jit
    def run(params, env_state, obs, rng):
        keys = jax.random.split(rng, num_steps)
        ((env_state, obs), (rewards, dones)) = jax.lax.scan(
            partial(body, params), (env_state, obs), keys)
        return env_state, obs, rewards, dones

    cache[key] = run
    return run


# Eval scans longer than this run as carried-state chunks of one compiled
# program. Measured on the v5e (round 5): a single-scan impulse-contact
# eval FAULTS the TPU worker between 1040 and 2080 steps (the deeply
# nested solver program — 8 substeps x fori(10) Gauss-Seidel x inner
# lax.scans — under a long outer scan; plain-clamp evals of any length are
# fine). Chunking with the (env_state, obs) carry is bit-identical math.
EVAL_SCAN_CHUNK = 520


def evaluate_policy(env_cfg: AviaryConfig, aux, params, num_steps: int,
                    num_envs: int = 1, deterministic: bool = True,
                    rng: Optional[jax.Array] = None):
    """Deterministic jitted eval rollout; returns (mean episode return, n
    completed episodes) — the analogue of SB3's `evaluate_policy`
    (learn.py:149-152)."""
    env_state = batch_reset(env_cfg, aux["params_env"], num_envs)
    obs = jax.vmap(lambda s: envbase.compute_obs(env_cfg, s))(env_state)
    rng = jax.random.key(0) if rng is None else rng
    n_chunks = max(1, -(-num_steps // EVAL_SCAN_CHUNK))
    chunk = -(-num_steps // n_chunks)  # equal chunks, ceil: may overshoot
    run = _eval_run_fn(env_cfg, aux, chunk, num_envs, deterministic)
    rew_parts, done_parts = [], []
    for ck in jax.random.split(rng, n_chunks):
        env_state, obs, rewards, dones = run(params, env_state, obs, ck)
        rew_parts.append(rewards)
        done_parts.append(dones)
    # trim the ceil overshoot so exactly num_steps steps enter the stats
    mean_ret, count = _episode_stats(
        jnp.concatenate(rew_parts)[:num_steps],
        jnp.concatenate(done_parts)[:num_steps])
    return float(mean_ret), int(count)


@jax.jit
def _episode_stats(rewards, dones):
    """Mean return over completed episodes (running-mean fallback when none
    completed), entirely on device — the former host-side double loop crawled
    at hundreds of envs (round-1 verdict weak #5). rewards/dones: (T, E)."""
    from gym_pybullet_drones_tpu.runtime.rollout import episode_stats

    running, total, count = episode_stats(rewards, dones)
    n = count.sum()
    mean_ret = jnp.where(n > 0, total.sum() / jnp.maximum(n, 1),
                         running.mean())
    return mean_ret, n


def deterministic_rollout(env_cfg: AviaryConfig, aux, params, num_steps: int):
    """Deterministic single-env rollout returning the stacked 20-dim state
    trajectory and per-step rewards (the logged replay of learn.py:155-192 /
    play.py:20-76). Shared by the learn and play examples."""
    network = aux["network"]
    params_env, ctrl_params = aux["params_env"], aux["ctrl_params"]
    target_pos = aux["target_pos"]
    n, a = env_cfg.num_drones, env_cfg.action_dim

    @jax.jit
    def run(state):
        def body(carry, _):
            s, o = carry
            mean, _, _ = network.apply(params, o[None])
            act = jnp.clip(mean, -1.0, 1.0).reshape(n, a)
            s, o2, r, t, tr = envbase.step(env_cfg, params_env, ctrl_params,
                                           target_pos, s, act)
            return (s, o2), (envbase.drone_state_vector(env_cfg, s), r)
        o0 = envbase.compute_obs(env_cfg, state)
        (_, _), (states, rewards) = jax.lax.scan(body, (state, o0), None,
                                                 length=num_steps)
        return states, rewards

    return run(envbase.reset(env_cfg, params_env))
