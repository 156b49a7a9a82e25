"""Recurrent PPO (LSTM policy), fully on device.

TPU-native counterpart of the reference's sb3_contrib RecurrentPPO trainer
(`/root/reference/trainingCode.py:116-198`). The LSTM is unrolled with
``jax.lax.scan`` both when collecting rollouts and when re-evaluating
sequences during the update — the TPU-idiomatic replacement for torch's
per-step LSTM calls with externally threaded ``lstm_states``
(`/root/reference/example_usage.py:70-84`).

Hyperparameters mirror `trainingCode.py:140-162`: lr 3e-4, n_steps 1024,
batch_size 128, 10 epochs, gamma .99, gae_lambda .95, clip .2, ent .02,
vf .5, max_grad_norm .5, lstm_hidden 2562, net_arch [128,128], Adam.

Minibatch semantics: SB3 builds minibatches from padded sub-sequences of
the rollout with their stored ``lstm_states``. Here the rollout is split
into fixed-length BPTT chunks (``config.bptt_chunk``; 0 = whole-rollout
sequences) whose initial LSTM carries are recorded during collection, and
a minibatch is a random subset of those (env, chunk) sequences — same
truncated-BPTT semantic as SB3, but with static shapes (no padding) and a
minibatch layout [L, M, ...] whose M-row matmuls fill the MXU tiles.
``batch_size`` is interpreted in SAMPLES (as in SB3): sequences per
minibatch = batch_size // chunk_len, rounded down to a divisor of the
sequence-pool size. Like SB3, the recorded carries are one-policy-stale
from the second epoch on; gradients do not flow across chunk boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rlenv_tpu.config import RecurrentPPOConfig
from rlenv_tpu.algos.common import EpisodeStats, categorical_stats, gae
from rlenv_tpu.models.recurrent import RecurrentActorCritic


@struct.dataclass
class RecurrentPPOState:
    params: Any
    opt_state: Any
    env_state: Any
    obs: jnp.ndarray             # [B, O]
    carry: Any                   # ((h,c),(h,c)) LSTM state
    episode_start: jnp.ndarray   # bool[B] — True right after a reset
    key: jnp.ndarray
    stats: EpisodeStats


class RecurrentPPOTrainer:
    """On-device Recurrent PPO over a vectorized env."""

    def __init__(self, venv, config: RecurrentPPOConfig = RecurrentPPOConfig(),
                 total_timesteps: int = 0):
        self.venv = venv
        self.config = config
        L = config.bptt_chunk or config.n_steps
        if config.n_steps % L:
            raise ValueError(
                f"bptt_chunk={config.bptt_chunk} must divide "
                f"n_steps={config.n_steps}")
        self.model = RecurrentActorCritic(
            num_actions=venv.num_actions,
            lstm_hidden_size=config.lstm_hidden_size,
            hidden_sizes=config.hidden_sizes,
            enable_critic_lstm=config.enable_critic_lstm,
            dtype=(jnp.bfloat16 if config.compute_dtype == "bfloat16"
                   else jnp.float32))
        if config.lr_final_scale < 1.0 and total_timesteps:
            updates_per_iter = config.n_epochs * max(
                (config.n_steps * venv.num_envs) // config.batch_size, 1)
            total_updates = max(
                total_timesteps // (config.n_steps * venv.num_envs), 1
            ) * updates_per_iter
            lr = optax.linear_schedule(
                config.learning_rate,
                config.learning_rate * config.lr_final_scale,
                total_updates)
        else:
            lr = config.learning_rate
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(lr),
        )

    def init(self, key: jax.Array) -> RecurrentPPOState:
        k_env, k_model, k_train = jax.random.split(key, 3)
        env_state, obs, _ = self.venv.reset(k_env)
        B = obs.shape[0]
        carry = self.model.initial_carry(B)
        params = self.model.init(k_model, obs, carry,
                                 jnp.ones(B, bool))
        return RecurrentPPOState(
            params=params,
            opt_state=self.optimizer.init(params),
            env_state=env_state,
            obs=obs,
            carry=carry,
            episode_start=jnp.ones(B, bool),
            key=k_train,
            stats=EpisodeStats.init(B),
        )

    # -- acting -------------------------------------------------------------

    def policy(self, params, obs, carry, episode_start, key=None,
               deterministic: bool = False):
        logits, value, carry = self.model.apply(params, obs, carry,
                                                episode_start)
        if deterministic or key is None:
            action = jnp.argmax(logits, axis=-1)
        else:
            action = jax.random.categorical(key, logits)
        return action, logits, value, carry

    # -- rollout ------------------------------------------------------------

    def _rollout_step(self, state: RecurrentPPOState, _):
        key, k_act = jax.random.split(state.key)
        action, logits, value, carry = self.policy(
            state.params, state.obs, state.carry, state.episode_start, k_act)
        env_state, next_obs, reward, term, trunc, info = self.venv.step(
            state.env_state, action)
        done = term | trunc
        logp, _ = categorical_stats(logits, action)
        stats = state.stats.update(reward, done,
                                   info["exploration_percentage"])
        transition = dict(obs=state.obs, action=action, reward=reward,
                          done=done, value=value, logp=logp,
                          episode_start=state.episode_start)
        new_state = dataclasses.replace(
            state, env_state=env_state, obs=next_obs, carry=carry,
            episode_start=done, key=key, stats=stats)
        return new_state, transition

    # -- update -------------------------------------------------------------

    def _sequence_forward(self, params, obs_seq, episode_start_seq,
                          init_carry):
        """Re-run the policy over [T, M, ...] sequences under scan.

        With ``config.remat`` the per-step body is rematerialized
        (`jax.checkpoint`): BPTT over n_steps=1024 with a 2562-wide LSTM
        would otherwise save every gate activation for the backward pass
        (~GBs of HBM); remat trades a second forward pass for keeping only
        the carries. For short BPTT chunks the activations fit easily and
        the second forward (plus its ~110 MB/step weight re-read) is pure
        overhead — set ``remat=False`` there.
        """
        def step(carry, inp):
            obs, ep_start = inp
            logits, value, carry = self.model.apply(params, obs, carry,
                                                    ep_start)
            return carry, (logits, value)

        if self.config.remat:
            step = jax.checkpoint(step)
        _, (logits, values) = jax.lax.scan(
            step, init_carry, (obs_seq, episode_start_seq))
        return logits, values

    def compute_targets(self, state: RecurrentPPOState,
                        traj: Dict[str, jnp.ndarray]
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """GAE advantages/returns from the ROLLOUT-time values (must be
        computed once, before any epoch mutates the params)."""
        cfg = self.config
        _, last_value, _ = self.model.apply(
            state.params, state.obs, state.carry, state.episode_start)
        return gae(traj["reward"], traj["value"], traj["done"], last_value,
                   cfg.gamma, cfg.gae_lambda)

    def update_epochs(self, state: RecurrentPPOState,
                      traj: Dict[str, jnp.ndarray], init_carries,
                      advantages: jnp.ndarray, returns: jnp.ndarray,
                      n_epochs: int) -> Tuple[RecurrentPPOState, Dict]:
        """Run ``n_epochs`` PPO epochs over the rollout.

        ``init_carries`` are the carries :meth:`rollout` recorded at each
        BPTT-chunk start (leaves ``[n_chunks, B, H]``). The rollout is a
        pool of ``N = n_chunks * n_envs`` independent length-L sequences;
        each minibatch re-runs a random M-subset of them under scan with
        the recorded initial carries.

        Exposed separately from :meth:`train_iteration` so the host can
        drive rollout / target / epoch phases as SEPARATE device programs
        (``train(..., program_split=...)``) where one program per
        iteration is too large for the TPU runtime (only needed for
        whole-rollout BPTT; chunked programs are small).
        """
        cfg = self.config
        T, B = traj["action"].shape[:2]
        L = cfg.bptt_chunk or cfg.n_steps
        n_chunks = T // L
        N = n_chunks * B
        # sequences per minibatch: batch_size SAMPLES / L-step sequences,
        # at least 1, rounded down to a divisor of N for static shapes.
        seqs_per_mb = min(max(1, cfg.batch_size // L), N)
        while N % seqs_per_mb != 0:
            seqs_per_mb -= 1
        n_minibatches = N // seqs_per_mb

        def to_pool(x):
            """[T, B, ...] -> [L, N, ...] with sequence n = chunk*B + env."""
            x = x.reshape((n_chunks, L) + x.shape[1:])
            x = jnp.moveaxis(x, 0, 1)
            return x.reshape((L, N) + x.shape[3:])

        def loss_fn(params, mb):
            logits, values = self._sequence_forward(
                params, mb["obs"], mb["episode_start"], mb["carry"])
            logp, entropy = categorical_stats(logits, mb["action"])
            adv = mb["adv"]
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            ratio = jnp.exp(logp - mb["logp"])
            unclipped = adv * ratio
            clipped = adv * jnp.clip(ratio, 1 - cfg.clip_range,
                                     1 + cfg.clip_range)
            policy_loss = -jnp.minimum(unclipped, clipped).mean()
            value_loss = jnp.mean((mb["ret"] - values) ** 2)
            ent = entropy.mean()
            total = (policy_loss + cfg.vf_coef * value_loss
                     - cfg.ent_coef * ent)
            return total, dict(policy_loss=policy_loss,
                               value_loss=value_loss, entropy=ent)

        data = jax.tree.map(to_pool, dict(
            obs=traj["obs"], episode_start=traj["episode_start"],
            action=traj["action"], logp=traj["logp"],
            adv=advantages, ret=returns))
        carry_pool = jax.tree.map(
            lambda c: c.reshape((N,) + c.shape[2:]), init_carries)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, N)

            def minibatch(carry, mb_idx):
                params, opt_state = carry
                seqs = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * seqs_per_mb, seqs_per_mb)
                mb = jax.tree.map(lambda x: x[:, seqs], data)  # [L, M, ...]
                mb["carry"] = jax.tree.map(lambda x: x[seqs], carry_pool)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), dict(loss=loss, **aux)

            (params, opt_state), metrics = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(n_minibatches))
            return (params, opt_state, key), metrics

        (params, opt_state, key), metrics = jax.lax.scan(
            epoch, (state.params, state.opt_state, state.key), None,
            length=n_epochs)
        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        return dataclasses.replace(state, params=params,
                                   opt_state=opt_state, key=key), metrics

    def _update(self, state: RecurrentPPOState, traj: Dict[str, jnp.ndarray],
                init_carries) -> Tuple[RecurrentPPOState, Dict]:
        advantages, returns = self.compute_targets(state, traj)
        return self.update_epochs(state, traj, init_carries, advantages,
                                  returns, self.config.n_epochs)

    def rollout(self, state: RecurrentPPOState):
        """Collect one n_steps rollout.

        Returns ``(state, traj, init_carries)``: traj leaves are
        ``[n_steps, B, ...]`` (time-major, contiguous across chunk
        boundaries — GAE runs over the full horizon), and init_carries are
        the LSTM carries snapshotted at each BPTT-chunk start, stacked as
        leaves ``[n_chunks, B, H]`` (n_chunks = 1 without chunking).
        """
        cfg = self.config
        L = cfg.bptt_chunk or cfg.n_steps
        n_chunks = cfg.n_steps // L

        def chunk_body(s, _):
            c0 = s.carry
            s, traj = jax.lax.scan(self._rollout_step, s, None, length=L)
            return s, (traj, c0)

        state, (traj, carries) = jax.lax.scan(chunk_body, state, None,
                                              length=n_chunks)
        traj = jax.tree.map(
            lambda x: x.reshape((cfg.n_steps,) + x.shape[2:]), traj)
        return state, traj, carries

    def train_iteration(self, state: RecurrentPPOState
                        ) -> Tuple[RecurrentPPOState, Dict]:
        state, traj, init_carry = self.rollout(state)
        return self._update(state, traj, init_carry)

    def train_chunk(self, state: RecurrentPPOState, num_iterations: int
                    ) -> Tuple[RecurrentPPOState, Dict]:
        def body(s, _):
            return self.train_iteration(s)
        state, metrics = jax.lax.scan(body, state, None,
                                      length=num_iterations)
        return state, jax.tree.map(lambda x: x.mean(), metrics)
