"""Feed-forward policy/value networks.

Flax equivalents of the torch policies the reference instantiates through
SB3:

* :class:`ActorCritic` — "MlpPolicy" for A2C/PPO with separate
  policy/value towers built from one ``net_arch`` list
  (`/root/reference/A2C_training.py:244-247`: net_arch=[256, 256]),
  tanh activations and SB3's orthogonal initialization scheme.
* :class:`QNetwork` — DQN "MlpPolicy" Q-net
  (`/root/reference/trainingCode.py:244-247`: net_arch=[512, 512, 256]),
  ReLU activations.

These are small MLPs: on TPU each forward/backward is a chain of MXU
matmuls over the batch dimension, so the only performance rule that
matters is keeping the batch large — which the vectorized env guarantees.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import constant, orthogonal


class MLPTower(nn.Module):
    """Plain MLP trunk with configurable activation + orthogonal init.

    ``dtype`` selects the COMPUTE dtype (params stay float32): bfloat16
    feeds the MXU its native input precision and halves the HBM traffic
    of the per-scan-step weight loads — the standard TPU mixed-precision
    recipe (losses are still reduced in float32 by the callers).
    """

    features: Sequence[int]
    activation: str = "tanh"
    kernel_gain: float = 2.0 ** 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = jnp.tanh if self.activation == "tanh" else nn.relu
        for i, width in enumerate(self.features):
            x = nn.Dense(width, kernel_init=orthogonal(self.kernel_gain),
                         bias_init=constant(0.0), dtype=self.dtype,
                         name=f"dense_{i}")(x)
            x = act(x)
        return x


class ActorCritic(nn.Module):
    """Separate-tower actor-critic (SB3 ``MlpExtractor`` semantics).

    Returns ``(logits [B, A], value [B])``.
    """

    num_actions: int
    hidden_sizes: Tuple[int, ...] = (256, 256)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, obs):
        pi = MLPTower(self.hidden_sizes, self.activation, name="pi_tower")(obs)
        vf = MLPTower(self.hidden_sizes, self.activation, name="vf_tower")(obs)
        logits = nn.Dense(self.num_actions, kernel_init=orthogonal(0.01),
                          bias_init=constant(0.0), name="pi_head")(pi)
        value = nn.Dense(1, kernel_init=orthogonal(1.0),
                         bias_init=constant(0.0), name="vf_head")(vf)
        return logits, value.squeeze(-1)


class QNetwork(nn.Module):
    """DQN Q-network: MLP trunk + linear head over actions."""

    num_actions: int
    hidden_sizes: Tuple[int, ...] = (512, 512, 256)

    @nn.compact
    def __call__(self, obs):
        x = MLPTower(self.hidden_sizes, activation="relu",
                     name="trunk")(obs)
        return nn.Dense(self.num_actions, kernel_init=orthogonal(1.0),
                        bias_init=constant(0.0), name="q_head")(x)
