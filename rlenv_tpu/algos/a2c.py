"""A2C — synchronous advantage actor-critic, fully on device.

TPU-native counterpart of the reference's SB3 trainer
(`/root/reference/A2C_training.py:189-293`). Where the reference ping-pongs
every rollout step between a torch policy on GPU and N serial Python envs on
CPU (SURVEY.md §3.2), here rollout collection AND the gradient update run as
one jitted program: ``lax.scan`` over ``n_steps`` of (policy forward →
vectorized env step), then GAE and an RMSProp update — zero host↔device
traffic inside a training chunk.

Hyperparameters mirror `A2C_training.py:229-247`: lr 7e-4, n_steps 5,
gamma .99, gae_lambda 1.0, ent_coef .01, vf_coef .25, max_grad_norm .5,
RMSProp(alpha .99, eps 1e-5), advantage normalization, net_arch [256,256].

Timeout handling follows SB3: on truncation (not termination) the reward
used for GAE is bootstrapped with ``gamma * V(terminal_obs)``
(`/root/reference/trainingCode.py:140-162` inherits SB3
``OnPolicyAlgorithm.collect_rollouts``). Two deliberate refinements over a
literal port:

* Episode statistics see the RAW env reward. SB3's ``Monitor`` wraps the
  env BELOW the algorithm (`trainingCode.py:109`), so its CSVs record what
  the env paid, not the bootstrapped training target — matching that keeps
  our Monitor CSVs / ``TrainResult.mean_return`` comparable to the
  reference's artifacts.
* The ``V(terminal_obs)`` forwards are NOT run inside the collect scan.
  Params are frozen during a rollout, so the per-step terminal-value MLP
  passes (a serial latency chain in the scan) are deferred: ``final_obs``
  rides in the trajectory and ONE batched ``[n_steps*B]`` value forward at
  update time produces the same numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rlenv_tpu.config import A2CConfig
from rlenv_tpu.algos.common import EpisodeStats, categorical_stats, gae
from rlenv_tpu.models.mlp import ActorCritic


@struct.dataclass
class A2CState:
    params: Any
    opt_state: Any
    env_state: Any            # VecPlantOS / CurriculumVecPlantOS batch state
    obs: jnp.ndarray          # [B, O]
    key: jnp.ndarray
    stats: EpisodeStats


class A2CTrainer:
    """On-device A2C over a vectorized (optionally curriculum) env."""

    def __init__(self, venv, config: A2CConfig = A2CConfig()):
        self.venv = venv
        self.config = config
        self.model = ActorCritic(num_actions=venv.num_actions,
                                 hidden_sizes=config.hidden_sizes)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.rmsprop(config.learning_rate, decay=0.99,
                          eps=config.rms_prop_eps),
        )

    # -- initialization -----------------------------------------------------

    def init(self, key: jax.Array) -> A2CState:
        k_env, k_model, k_train = jax.random.split(key, 3)
        env_state, obs, _ = self.venv.reset(k_env)
        params = self.model.init(k_model, obs)
        return A2CState(
            params=params,
            opt_state=self.optimizer.init(params),
            env_state=env_state,
            obs=obs,
            key=k_train,
            stats=EpisodeStats.init(obs.shape[0]),
        )

    # -- acting -------------------------------------------------------------

    def policy(self, params, obs, key=None, deterministic: bool = False):
        logits, value = self.model.apply(params, obs)
        if deterministic:
            action = jnp.argmax(logits, axis=-1)
        else:
            action = jax.random.categorical(key, logits)
        return action, logits, value

    # -- training -----------------------------------------------------------

    def _rollout_step(self, carry, _):
        state = carry
        key, k_act = jax.random.split(state.key)
        action, logits, value = self.policy(state.params, state.obs, k_act)
        env_state, next_obs, reward, term, trunc, info = self.venv.step(
            state.env_state, action)
        done = term | trunc

        # SB3 timeout bootstrapping is DEFERRED: record final_obs + the
        # timeout mask; _update folds gamma * V(final_obs) into the GAE
        # rewards with one batched forward (params are frozen across the
        # rollout, so the numbers match the inline version).
        timeout = trunc & ~term

        logp, _ = categorical_stats(logits, action)
        # Stats get the RAW env reward (SB3 Monitor semantics — the
        # monitor wraps the env below the algorithm, trainingCode.py:109).
        stats = state.stats.update(reward, done,
                                   info["exploration_percentage"])
        transition = dict(obs=state.obs, action=action, reward=reward,
                          timeout=timeout, final_obs=info["final_obs"],
                          done=done, value=value, logp=logp)
        new_state = dataclasses.replace(
            state, env_state=env_state, obs=next_obs, key=key, stats=stats)
        return new_state, transition

    def _bootstrap_rewards(self, params, batch: Dict[str, jnp.ndarray]
                           ) -> jnp.ndarray:
        """GAE-input rewards: raw env rewards plus the deferred SB3 timeout
        bootstrap — one batched value forward over every step's terminal
        observation (instead of n_steps serial forwards inside the collect
        scan), masked to truncated-not-terminated steps."""
        cfg = self.config
        T, B = batch["reward"].shape
        _, final_values = self.model.apply(
            params, batch["final_obs"].reshape(T * B, -1))
        return batch["reward"] + (cfg.gamma * final_values.reshape(T, B)
                                  * batch["timeout"])

    def _update(self, state: A2CState, batch: Dict[str, jnp.ndarray]
                ) -> Tuple[A2CState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        _, last_value = self.model.apply(state.params, state.obs)
        rewards = self._bootstrap_rewards(state.params, batch)
        advantages, returns = gae(rewards, batch["value"],
                                  batch["done"], last_value,
                                  cfg.gamma, cfg.gae_lambda)
        adv = advantages.reshape(-1)
        if cfg.normalize_advantage:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        obs = batch["obs"].reshape(-1, batch["obs"].shape[-1])
        actions = batch["action"].reshape(-1)
        rets = returns.reshape(-1)

        def loss_fn(params):
            logits, values = self.model.apply(params, obs)
            logp, entropy = categorical_stats(logits, actions)
            policy_loss = -(adv * logp).mean()
            value_loss = jnp.mean((rets - values) ** 2)
            ent = entropy.mean()
            total = (policy_loss + cfg.vf_coef * value_loss
                     - cfg.ent_coef * ent)
            return total, dict(policy_loss=policy_loss,
                               value_loss=value_loss, entropy=ent)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(loss=loss, **aux)
        return dataclasses.replace(state, params=params,
                                   opt_state=opt_state), metrics

    def train_iteration(self, state: A2CState
                        ) -> Tuple[A2CState, Dict[str, jnp.ndarray]]:
        """One rollout (n_steps × B) + one gradient update."""
        state, traj = jax.lax.scan(self._rollout_step, state, None,
                                   length=self.config.n_steps)
        return self._update(state, traj)

    def train_chunk(self, state: A2CState, num_iterations: int
                    ) -> Tuple[A2CState, Dict[str, jnp.ndarray]]:
        """``num_iterations`` updates under one lax.scan — jit this."""
        def body(s, _):
            return self.train_iteration(s)
        state, metrics = jax.lax.scan(body, state, None,
                                      length=num_iterations)
        return state, jax.tree.map(lambda x: x.mean(), metrics)
