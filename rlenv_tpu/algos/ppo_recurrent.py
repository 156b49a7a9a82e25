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

Timeout bootstrapping follows sb3_contrib's ``collect_rollouts`` (the SB3
``OnPolicyAlgorithm`` semantic the reference trainer inherits,
`/root/reference/trainingCode.py:140-162`): when an episode TRUNCATES
(time limit, not full exploration), ``gamma * V(terminal_obs)`` is added
to that step's reward before GAE, with V evaluated under the post-step
LSTM state and ``episode_start=False`` — exactly sb3_contrib's
``predict_values(terminal_obs, terminal_lstm_state, episode_starts=False)``.
TPU-first twist: instead of running an extra LSTM forward every collect
step (a serial latency chain), the rollout RECORDS (terminal_obs, LSTM
carry, step index) into a handful of per-env slots — truncation can fire
at most ``ceil(n_steps / max_episode_steps) + 1`` times per env per
rollout — and ONE batched value forward at target time reproduces the
numbers bit-for-bit (params are frozen across a rollout).
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
        if config.lr_final_scale < 1.0 and not total_timesteps:
            raise ValueError(
                "lr_final_scale < 1 needs total_timesteps > 0 to derive "
                "the anneal schedule (pass total_timesteps to the trainer, "
                "as train() does) — otherwise the lr would silently stay "
                "constant.")
        # Timeout-bootstrap slots per env per rollout: truncation only
        # fires on the env time limit, so it can occur at most this many
        # times within one n_steps window (plus one for an episode already
        # in flight at the window start).
        max_ep = getattr(getattr(venv, "env", None), "config", None)
        max_ep = getattr(max_ep, "max_steps", 1000)
        self._n_boot_slots = config.n_steps // max(max_ep, 1) + 1
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

    def _rollout_step(self, carry_boot, t):
        state, boot = carry_boot
        key, k_act = jax.random.split(state.key)
        action, logits, value, carry = self.policy(
            state.params, state.obs, state.carry, state.episode_start, k_act)
        env_state, next_obs, reward, term, trunc, info = self.venv.step(
            state.env_state, action)
        done = term | trunc

        # SB3 timeout bootstrapping, deferred (module docstring): record
        # (terminal_obs, post-step LSTM carry, step index) per truncation;
        # compute_targets runs one batched value forward over the slots.
        timeout = trunc & ~term
        S = boot["t"].shape[0]
        env_ids = jnp.arange(done.shape[0], dtype=jnp.int32)
        # Non-timeout envs (and slot overflow, impossible by construction)
        # write to row S -> dropped by XLA scatter 'drop' mode.
        slot = jnp.where(timeout & (boot["count"] < S), boot["count"], S)
        boot = dict(
            obs=boot["obs"].at[slot, env_ids].set(info["final_obs"],
                                                  mode="drop"),
            t=boot["t"].at[slot, env_ids].set(t, mode="drop"),
            count=boot["count"] + timeout,
            carry=jax.tree.map(
                lambda bc, c: bc.at[slot, env_ids].set(c, mode="drop"),
                boot["carry"], carry),
        )

        logp, _ = categorical_stats(logits, action)
        stats = state.stats.update(reward, done,
                                   info["exploration_percentage"])
        transition = dict(obs=state.obs, action=action, reward=reward,
                          done=done, value=value, logp=logp,
                          episode_start=state.episode_start)
        new_state = dataclasses.replace(
            state, env_state=env_state, obs=next_obs, carry=carry,
            episode_start=done, key=key, stats=stats)
        return (new_state, boot), transition

    # -- update -------------------------------------------------------------

    def _cast_params(self, params):
        """bf16 copy of the f32 params, made ONCE so the BPTT scan reads
        half the weight bytes per step (``config.cast_params_once``)."""
        if (self.config.compute_dtype != "bfloat16"
                or not self.config.cast_params_once):
            return params
        return jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)

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

        ``config.cast_params_once`` casts the weights to bf16 HERE, before
        the scan, halving the dominant per-step HBM read (see the config
        docstring for the measured effect and the accumulation trade-off).
        """
        params = self._cast_params(params)

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

    def _bootstrap_rewards(self, params, rewards: jnp.ndarray,
                           boot: Dict[str, Any]) -> jnp.ndarray:
        """Fold ``gamma * V(terminal_obs)`` into the rewards at every
        recorded truncation (SB3 timeout bootstrap, module docstring).

        One batched forward over the [S*B] recorded slots under their
        recorded LSTM carries with ``episode_start=False`` — numerically
        the value sb3_contrib's ``predict_values`` would have produced at
        collect time, since params are frozen across a rollout."""
        S, B = boot["t"].shape
        obs = boot["obs"].reshape(S * B, -1)
        carry = jax.tree.map(
            lambda c: c.reshape((S * B,) + c.shape[2:]), boot["carry"])
        _, values, _ = self.model.apply(params, obs, carry,
                                        jnp.zeros(S * B, bool))
        values = values.reshape(S, B)
        valid = (jnp.arange(S, dtype=jnp.int32)[:, None]
                 < boot["count"][None, :])
        T = rewards.shape[0]
        t_idx = jnp.where(valid, boot["t"], T)   # invalid -> OOB -> drop
        env_ids = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[None, :], (S, B))
        return rewards.at[t_idx, env_ids].add(
            self.config.gamma * values, mode="drop")

    def compute_targets(self, state: RecurrentPPOState,
                        traj: Dict[str, jnp.ndarray], boot: Dict[str, Any]
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """GAE advantages/returns from the ROLLOUT-time values (must be
        computed once, before any epoch mutates the params), with the SB3
        timeout bootstrap applied to the rewards."""
        cfg = self.config
        _, last_value, _ = self.model.apply(
            state.params, state.obs, state.carry, state.episode_start)
        rewards = self._bootstrap_rewards(state.params, traj["reward"], boot)
        return gae(rewards, traj["value"], traj["done"], last_value,
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
                init_carries, boot) -> Tuple[RecurrentPPOState, Dict]:
        advantages, returns = self.compute_targets(state, traj, boot)
        return self.update_epochs(state, traj, init_carries, advantages,
                                  returns, self.config.n_epochs)

    def rollout(self, state: RecurrentPPOState):
        """Collect one n_steps rollout.

        Returns ``(state, traj, init_carries, boot)``: traj leaves are
        ``[n_steps, B, ...]`` (time-major, contiguous across chunk
        boundaries — GAE runs over the full horizon), init_carries are
        the LSTM carries snapshotted at each BPTT-chunk start, stacked as
        leaves ``[n_chunks, B, H]`` (n_chunks = 1 without chunking), and
        ``boot`` holds the recorded timeout-bootstrap slots for
        :meth:`compute_targets`.
        """
        cfg = self.config
        L = cfg.bptt_chunk or cfg.n_steps
        n_chunks = cfg.n_steps // L
        B = state.obs.shape[0]
        S = self._n_boot_slots
        boot = dict(
            obs=jnp.zeros((S, B, state.obs.shape[-1]), state.obs.dtype),
            t=jnp.zeros((S, B), jnp.int32),
            count=jnp.zeros((B,), jnp.int32),
            carry=jax.tree.map(
                lambda c: jnp.zeros((S,) + c.shape, c.dtype), state.carry),
        )

        def chunk_body(sb, ts):
            s, boot = sb
            c0 = s.carry
            (s, boot), traj = jax.lax.scan(self._rollout_step, (s, boot), ts)
            return (s, boot), (traj, c0)

        ts = jnp.arange(cfg.n_steps, dtype=jnp.int32).reshape(n_chunks, L)
        (state, boot), (traj, carries) = jax.lax.scan(
            chunk_body, (state, boot), ts)
        traj = jax.tree.map(
            lambda x: x.reshape((cfg.n_steps,) + x.shape[2:]), traj)
        return state, traj, carries, boot

    def train_iteration(self, state: RecurrentPPOState
                        ) -> Tuple[RecurrentPPOState, Dict]:
        state, traj, init_carry, boot = self.rollout(state)
        return self._update(state, traj, init_carry, boot)

    def train_chunk(self, state: RecurrentPPOState, num_iterations: int
                    ) -> Tuple[RecurrentPPOState, Dict]:
        def body(s, _):
            return self.train_iteration(s)
        state, metrics = jax.lax.scan(body, state, None,
                                      length=num_iterations)
        return state, jax.tree.map(lambda x: x.mean(), metrics)
