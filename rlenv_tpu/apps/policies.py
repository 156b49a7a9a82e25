"""Saved-policy loading for inference.

The counterpart of the reference's model-loading paths
(`/root/reference/example_usage.py:21-52`, `gradioUI.py:56-60`): resolve
the model type (explicitly or by filename auto-detection), rebuild the
matching network, restore Orbax params, and expose a uniform ``act`` with
LSTM-state threading for the recurrent policy
(`example_usage.py:70-84`)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu.config import (A2CConfig, DQNConfig, EnvConfig,
                              RecurrentPPOConfig)
from rlenv_tpu.models.mlp import ActorCritic, QNetwork
from rlenv_tpu.models.recurrent import RecurrentActorCritic
from rlenv_tpu.train.checkpoint import load_metadata, load_params


def detect_model_type(model_path: str) -> Optional[str]:
    """Filename auto-detection (`example_usage.py:21-31`)."""
    name = os.path.basename(model_path).lower()
    for t in ("dqn", "ppo", "a2c", "mcts"):
        if t in name:
            return t
    return None


class PolicyRunner:
    """Uniform deterministic/stochastic acting over any loaded policy."""

    def __init__(self, model, params, model_type: str):
        self.model = model
        self.params = params
        self.model_type = model_type
        self.is_recurrent = model_type == "ppo"
        self._carry = None
        self._apply = jax.jit(model.apply)

    def reset_state(self, batch_size: int = 1) -> None:
        if self.is_recurrent:
            self._carry = self.model.initial_carry(batch_size)

    def act(self, obs: np.ndarray, episode_start: bool = False,
            deterministic: bool = True, key=None) -> np.ndarray:
        obs = jnp.asarray(obs, jnp.float32)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        B = obs.shape[0]
        if self.is_recurrent:
            if self._carry is None:
                self.reset_state(B)
            starts = jnp.full((B,), episode_start, bool)
            logits, _, self._carry = self._apply(self.params, obs,
                                                 self._carry, starts)
        elif self.model_type == "dqn":
            logits = self._apply(self.params, obs)
        else:  # a2c
            logits, _ = self._apply(self.params, obs)
        if deterministic or key is None:
            action = jnp.argmax(logits, axis=-1)
        else:
            action = jax.random.categorical(key, logits)
        a = np.asarray(action)
        return a[0] if squeeze else a


def load_policy(model_path: str, model_type: str = "auto",
                env_config: Optional[EnvConfig] = None) -> PolicyRunner:
    env_config = env_config or EnvConfig.training()
    if model_path.endswith(".zip"):
        # Stable-Baselines3 archive — e.g. the reference's own shipped
        # checkpoints (`example_usage.py:37-48` loads these with SB3; we
        # convert the torch weights into the matching flax policy).
        from rlenv_tpu.apps.sb3_import import load_sb3_policy
        return load_sb3_policy(model_path, model_type, env_config)
    meta = load_metadata(model_path) or {}
    if model_type == "auto":
        model_type = meta.get("model_type") or detect_model_type(model_path)
        if model_type is None:
            raise ValueError(
                "Could not auto-detect model type from filename; pass "
                "model_type='dqn'|'ppo'|'a2c'.")
    model_type = model_type.lower()
    algo_meta = meta.get("algo_config", {})

    n_actions = meta.get("num_actions", env_config.num_actions)
    obs_dim = meta.get("obs_dim", env_config.obs_dim)
    dummy_obs = jnp.zeros((1, obs_dim), jnp.float32)
    k = jax.random.PRNGKey(0)
    if model_type == "dqn":
        hidden = tuple(algo_meta.get("hidden_sizes",
                                     DQNConfig().hidden_sizes))
        model = QNetwork(num_actions=n_actions, hidden_sizes=hidden)
        template = model.init(k, dummy_obs)
    elif model_type == "a2c":
        hidden = tuple(algo_meta.get("hidden_sizes",
                                     A2CConfig().hidden_sizes))
        model = ActorCritic(num_actions=n_actions, hidden_sizes=hidden)
        template = model.init(k, dummy_obs)
    elif model_type == "ppo":
        cfg = RecurrentPPOConfig()
        model = RecurrentActorCritic(
            num_actions=n_actions,
            lstm_hidden_size=algo_meta.get("lstm_hidden_size",
                                           cfg.lstm_hidden_size),
            hidden_sizes=tuple(algo_meta.get("hidden_sizes",
                                             cfg.hidden_sizes)),
            enable_critic_lstm=algo_meta.get("enable_critic_lstm",
                                             cfg.enable_critic_lstm))
        template = model.init(k, dummy_obs, model.initial_carry(1),
                              jnp.ones(1, bool))
    else:
        raise ValueError(f"Unknown model type: {model_type}; valid options "
                         "are 'dqn', 'ppo', 'a2c', or 'auto'")
    params = load_params(model_path, template)
    return PolicyRunner(model, params, model_type)
