"""Recurrent (LSTM) actor-critic.

Flax equivalent of sb3_contrib's ``MlpLstmPolicy`` as configured by the
reference (`/root/reference/trainingCode.py:156-161`): one-layer LSTM of
hidden size 2562 on the raw features, a separate critic LSTM
(``enable_critic_lstm=True``), then a [128, 128] MLP per tower.

TPU-first design: the time dimension is handled OUTSIDE the module by
``jax.lax.scan`` over :meth:`step` (see
:func:`rlenv_tpu.algos.ppo_recurrent`), so XLA compiles one fused
per-timestep cell; hidden state is explicit ``((h, c), (h, c))`` carry —
the functional analogue of SB3's ``lstm_states`` threading
(`/root/reference/example_usage.py:70-84`).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import constant, orthogonal

from rlenv_tpu.models.mlp import MLPTower


class RecurrentActorCritic(nn.Module):
    """LSTM actor-critic; returns (logits, value, new_carry).

    ``carry = (actor_(c,h), critic_(c,h))``; when ``enable_critic_lstm`` is
    False, the critic reuses the actor LSTM's output (sb3_contrib's
    ``shared_lstm=False, enable_critic_lstm=False`` falls back to detached
    actor features; we use the same features — no gradient-stop needed in a
    joint loss).
    """

    num_actions: int
    lstm_hidden_size: int = 2562
    hidden_sizes: Tuple[int, ...] = (128, 128)
    enable_critic_lstm: bool = True
    # Compute dtype (params stay float32). bfloat16 is the TPU
    # mixed-precision recipe: the MXU ingests bf16 natively and the big
    # per-scan-step LSTM weight loads (2 x ~110 MB at hidden 2562 in f32)
    # halve in HBM traffic. Logits/values are cast back to float32 before
    # they reach any loss or sampling math.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, carry, episode_start):
        """One timestep. obs [B, O]; episode_start [B] resets the memory,
        mirroring sb3_contrib's episode_start masking."""
        mask = (1.0 - episode_start.astype(self.dtype))[:, None]
        actor_carry = jax.tree.map(lambda x: x.astype(self.dtype) * mask,
                                   carry[0])
        critic_carry = jax.tree.map(lambda x: x.astype(self.dtype) * mask,
                                    carry[1])
        obs = obs.astype(self.dtype)

        actor_cell = nn.OptimizedLSTMCell(self.lstm_hidden_size,
                                          dtype=self.dtype,
                                          name="actor_lstm")
        actor_carry, actor_out = actor_cell(actor_carry, obs)

        if self.enable_critic_lstm:
            critic_cell = nn.OptimizedLSTMCell(self.lstm_hidden_size,
                                               dtype=self.dtype,
                                               name="critic_lstm")
            critic_carry, critic_out = critic_cell(critic_carry, obs)
        else:
            critic_out = actor_out

        pi = MLPTower(self.hidden_sizes, "tanh", dtype=self.dtype,
                      name="pi_tower")(actor_out)
        vf = MLPTower(self.hidden_sizes, "tanh", dtype=self.dtype,
                      name="vf_tower")(critic_out)
        logits = nn.Dense(self.num_actions, kernel_init=orthogonal(0.01),
                          bias_init=constant(0.0), dtype=self.dtype,
                          name="pi_head")(pi)
        value = nn.Dense(1, kernel_init=orthogonal(1.0),
                         bias_init=constant(0.0), dtype=self.dtype,
                         name="vf_head")(vf)
        return (logits.astype(jnp.float32),
                value.squeeze(-1).astype(jnp.float32),
                (actor_carry, critic_carry))

    def initial_carry(self, batch_size: int):
        shape = (batch_size, self.lstm_hidden_size)
        zeros = jnp.zeros(shape, self.dtype)
        return ((zeros, zeros), (zeros, zeros))
