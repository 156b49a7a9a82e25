"""Shared building blocks for the on-device trainers."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EpisodeStats:
    """Device-side episode statistics accumulator.

    Replaces SB3's per-env ``Monitor`` CSV bookkeeping
    (`/root/reference/trainingCode.py:109`) on the hot path: per-env return
    and length accumulators, completed-episode aggregates, and a fixed-size
    ring log of finished episodes (return / length / final exploration %)
    that the host drains between jitted chunks to write Monitor-format CSVs
    (see :mod:`rlenv_tpu.train.metrics`).
    """

    ep_return: jnp.ndarray       # f32[B] running return of the live episode
    ep_length: jnp.ndarray       # i32[B]
    completed_return_sum: jnp.ndarray  # f32[] sum of finished-episode returns
    completed_length_sum: jnp.ndarray  # f32[]
    completed_count: jnp.ndarray       # i32[]
    last_exploration_sum: jnp.ndarray  # f32[] sum of final exploration %
    timesteps: jnp.ndarray             # i32[] total env steps taken
    # Monotonic count of episodes that ended fully explored (>=100%) —
    # the reference EvaluationCallback's ``maze_completion_count``
    # definition (`trainingCode.py:300-318`). Tracked on device so the
    # host log can't undercount when more episodes finish between drains
    # than the ring holds.
    full_exploration_count: jnp.ndarray  # i32[]
    # per-episode ring log (drained by the host)
    log_return: jnp.ndarray      # f32[K]
    log_length: jnp.ndarray      # i32[K]
    log_exploration: jnp.ndarray  # f32[K]
    log_env: jnp.ndarray         # i32[K] which env finished the episode
    log_pos: jnp.ndarray         # i32[] monotonically increasing write count

    LOG_CAPACITY = 4096

    @classmethod
    def init(cls, num_envs: int,
             log_capacity: int = LOG_CAPACITY) -> "EpisodeStats":
        return cls(
            ep_return=jnp.zeros(num_envs, jnp.float32),
            ep_length=jnp.zeros(num_envs, jnp.int32),
            completed_return_sum=jnp.float32(0),
            completed_length_sum=jnp.float32(0),
            completed_count=jnp.int32(0),
            last_exploration_sum=jnp.float32(0),
            timesteps=jnp.int32(0),
            full_exploration_count=jnp.int32(0),
            log_return=jnp.zeros(log_capacity, jnp.float32),
            log_length=jnp.zeros(log_capacity, jnp.int32),
            log_exploration=jnp.zeros(log_capacity, jnp.float32),
            log_env=jnp.zeros(log_capacity, jnp.int32),
            log_pos=jnp.int32(0),
        )

    def update(self, rewards: jnp.ndarray, done: jnp.ndarray,
               exploration_pct: jnp.ndarray) -> "EpisodeStats":
        ep_return = self.ep_return + rewards
        ep_length = self.ep_length + 1
        d = done.astype(jnp.float32)
        K = self.log_return.shape[0]

        # Scatter finished episodes into the ring; non-done envs target an
        # out-of-bounds slot and are dropped by XLA's scatter 'drop' mode.
        order = jnp.cumsum(done.astype(jnp.int32)) - 1
        idx = jnp.where(done, (self.log_pos + order) % K, K)
        log_return = self.log_return.at[idx].set(ep_return, mode="drop")
        log_length = self.log_length.at[idx].set(ep_length, mode="drop")
        log_exploration = self.log_exploration.at[idx].set(
            exploration_pct, mode="drop")
        env_ids = jnp.arange(done.shape[0], dtype=jnp.int32)
        log_env = self.log_env.at[idx].set(env_ids, mode="drop")

        return EpisodeStats(
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_length=jnp.where(done, 0, ep_length),
            completed_return_sum=self.completed_return_sum
            + jnp.sum(ep_return * d),
            completed_length_sum=self.completed_length_sum
            + jnp.sum(ep_length.astype(jnp.float32) * d),
            completed_count=self.completed_count
            + jnp.sum(done).astype(jnp.int32),
            last_exploration_sum=self.last_exploration_sum
            + jnp.sum(exploration_pct * d),
            timesteps=self.timesteps + rewards.shape[0],
            full_exploration_count=self.full_exploration_count
            + jnp.sum(done & (exploration_pct >= 100.0)).astype(jnp.int32),
            log_return=log_return,
            log_length=log_length,
            log_exploration=log_exploration,
            log_env=log_env,
            log_pos=self.log_pos + jnp.sum(done).astype(jnp.int32),
        )


def gae(rewards: jnp.ndarray, values: jnp.ndarray, dones: jnp.ndarray,
        last_value: jnp.ndarray, gamma: float, gae_lambda: float
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized advantage estimation over a [T, B] rollout.

    ``dones[t]`` marks that the episode ended AT step t (no bootstrapping
    across it). Returns (advantages, returns) of shape [T, B].
    ``gae_lambda=1.0`` reduces to bootstrapped Monte-Carlo, matching the
    reference A2C config (`/root/reference/A2C_training.py:235`).
    """
    def scan_fn(carry, inp):
        next_adv, next_value = carry
        reward, value, done = inp
        nonterminal = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * next_value * nonterminal - value
        adv = delta + gamma * gae_lambda * nonterminal * next_adv
        return (adv, value), adv

    (_, _), advantages = jax.lax.scan(
        scan_fn, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    return advantages, advantages + values


def categorical_stats(logits: jnp.ndarray, actions: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(log_prob(actions), entropy) of a categorical distribution."""
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, actions[..., None], axis=-1)[..., 0]
    entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
    return logp, entropy
