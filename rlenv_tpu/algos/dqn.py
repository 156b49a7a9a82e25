"""DQN with an on-device ring replay buffer.

TPU-native counterpart of the reference's SB3 DQN trainer
(`/root/reference/trainingCode.py:203-284`). The replay buffer is a set of
preallocated slot-major HBM arrays written with aligned block
dynamic-slice updates (one write per train_freq of collect steps, held
OUT of the scan carries) and sampled with a batched gather — no host
round-trips; collection and learning run inside one jitted ``lax.scan``.

Hyperparameters mirror `trainingCode.py:226-247`: lr 3e-4, buffer 2M,
learning_starts 5000, batch 64, tau .005 (soft target update), gamma .99,
train_freq 4, target_update_interval 5000, eps 1.0 -> 0.05 over 70% of
training, max_grad_norm 10, net_arch [512, 512, 256], Huber loss (SB3's
smooth-L1), Adam.

Truncation handling: the stored transition keeps the TRUE successor
observation (``info['final_obs']``) and bootstraps whenever the episode
did not terminate — the on-device equivalent of SB3's
``handle_timeout_termination``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rlenv_tpu.config import DQNConfig
from rlenv_tpu.algos.common import EpisodeStats
from rlenv_tpu.models.mlp import QNetwork


@struct.dataclass
class ReplayBuffer:
    """Fixed-capacity ring buffer living in HBM, slot-major.

    Transitions are stored as ``slots`` of one vectorized-env step each
    (``[S, B, ...]`` with ``S = capacity // B``), written with aligned
    dynamic-slice updates XLA aliases IN-PLACE. Two layout lessons are
    baked in (both profiled on hardware): the earlier flat ``[cap, ...]``
    layout used ``.at[idx].set`` scatters, which XLA materializes as a
    full-buffer copy per insert (~1.7 GB of HBM traffic per vectorized
    env step at the reference's 2M-transition / 107-dim config); and even
    a pass-through ride in a scan CARRY costs ~1.5 ms/step of copy
    traffic — so the trainer writes one K-slot block per train_freq of
    collect steps (:meth:`add_block`) and keeps the buffer out of the
    per-step loops entirely.
    """

    obs: jnp.ndarray        # f32[S, B, O]
    next_obs: jnp.ndarray   # f32[S, B, O]
    actions: jnp.ndarray    # i32[S, B]
    rewards: jnp.ndarray    # f32[S, B]
    terminated: jnp.ndarray  # bool[S, B]
    done: jnp.ndarray       # bool[S, B] term|trunc — episode boundary
    slot: jnp.ndarray       # i32[] next write slot
    filled: jnp.ndarray     # i32[] slots currently filled

    @classmethod
    def create(cls, capacity: int, obs_dim: int, batch_width: int,
               slot_block: int = 1) -> "ReplayBuffer":
        """``capacity`` rounds DOWN to a multiple of ``batch_width`` (the
        vectorized env width) and of ``batch_width * slot_block``
        (``slot_block`` = slots written per :meth:`add_block` call, the
        trainer's ``train_freq``); SB3's 2,000,000 stays exact at 64 envs
        and becomes 1,998,848 at 512 x train_freq 4."""
        S = capacity // batch_width
        if slot_block > 1:
            S = (S // slot_block) * slot_block
        if S < 1:
            raise ValueError(
                f"buffer capacity {capacity} < batch width {batch_width}"
                f" x slot block {slot_block}")
        B = batch_width
        return cls(
            obs=jnp.zeros((S, B, obs_dim), jnp.float32),
            next_obs=jnp.zeros((S, B, obs_dim), jnp.float32),
            actions=jnp.zeros((S, B), jnp.int32),
            rewards=jnp.zeros((S, B), jnp.float32),
            terminated=jnp.zeros((S, B), bool),
            done=jnp.zeros((S, B), bool),
            slot=jnp.int32(0),
            filled=jnp.int32(0),
        )

    @property
    def capacity(self) -> int:
        return self.obs.shape[0] * self.obs.shape[1]

    @property
    def batch_width(self) -> int:
        return self.obs.shape[1]

    @property
    def size(self) -> jnp.ndarray:
        """Transitions currently stored."""
        return self.filled * self.obs.shape[1]

    def add_batch(self, obs, next_obs, actions, rewards, terminated,
                  done=None) -> "ReplayBuffer":
        """Append one batch row per env.

        ``done`` (terminated OR truncated) marks episode boundaries for
        n-step composition; ``terminated`` alone controls bootstrap
        zeroing. ``done=None`` defaults to ``terminated`` — ONLY valid
        when the buffer is sampled with ``sample``/``n_step == 1``:
        omitting truncations makes :meth:`sample_nstep` silently compose
        returns across auto-reset episode boundaries. Callers with
        truncating envs (i.e. all PlantOS trainers) must pass ``done``
        explicitly, as :class:`DQNTrainer` does."""
        assert obs.shape[0] == self.batch_width, \
            f"batch width {obs.shape[0]} != buffer width {self.batch_width}"
        S = self.obs.shape[0]
        if done is None:
            done = terminated
        upd = lambda buf, row: jax.lax.dynamic_update_index_in_dim(
            buf, row.astype(buf.dtype), self.slot, 0)
        return ReplayBuffer(
            obs=upd(self.obs, obs),
            next_obs=upd(self.next_obs, next_obs),
            actions=upd(self.actions, actions),
            rewards=upd(self.rewards, rewards),
            terminated=upd(self.terminated, terminated),
            done=upd(self.done, done),
            slot=(self.slot + 1) % S,
            filled=jnp.minimum(self.filled + 1, S),
        )

    def add_block(self, obs, next_obs, actions, rewards, terminated,
                  done=None) -> "ReplayBuffer":
        """Write K consecutive slots in ONE dynamic-slice update.

        Inputs are time-major ``[K, B, ...]`` (the stacked ys of a collect
        scan). Requires ``S % K == 0`` (guaranteed by ``create``'s
        ``slot_block``) so a block never wraps mid-write: the slot pointer
        advances K-aligned from 0. One K-row update is the same HBM
        traffic as K single-row updates but 1/K the bookkeeping ops —
        and, more importantly, keeps the buffer OUT of the collect scan's
        carry entirely.

        Must not be interleaved with :meth:`add_batch` (which advances the
        slot by 1, breaking K-alignment): ``dynamic_update_slice_in_dim``
        CLAMPS out-of-range starts, so a misaligned ``slot + K > S`` write
        would silently overwrite the tail rows instead of wrapping.

        ``done=None`` defaults to ``terminated`` — only valid for
        ``n_step == 1`` sampling; see :meth:`add_batch`."""
        K = obs.shape[0]
        S = self.obs.shape[0]
        if S % K:                     # K, S are static at trace time
            raise ValueError(
                f"add_block of {K} rows into a {S}-slot ring requires "
                f"S % K == 0 (create(slot_block=...) guarantees this); "
                f"a partial tail block would clamp, not wrap")
        if done is None:
            done = terminated
        upd = lambda buf, rows: jax.lax.dynamic_update_slice_in_dim(
            buf, rows.astype(buf.dtype), self.slot, axis=0)
        return ReplayBuffer(
            obs=upd(self.obs, obs),
            next_obs=upd(self.next_obs, next_obs),
            actions=upd(self.actions, actions),
            rewards=upd(self.rewards, rewards),
            terminated=upd(self.terminated, terminated),
            done=upd(self.done, done),
            slot=(self.slot + K) % S,
            filled=jnp.minimum(self.filled + K, S),
        )

    def sample(self, key: jax.Array, batch_size: int) -> Dict[str, jnp.ndarray]:
        B = self.batch_width
        idx = jax.random.randint(key, (batch_size,), 0,
                                 jnp.maximum(self.size, 1))
        s, l = idx // B, idx % B
        return dict(obs=self.obs[s, l], next_obs=self.next_obs[s, l],
                    actions=self.actions[s, l], rewards=self.rewards[s, l],
                    terminated=self.terminated[s, l])

    def sample_nstep(self, key: jax.Array, batch_size: int, n: int,
                     gamma: float) -> Dict[str, jnp.ndarray]:
        """Sample with n-step returns composed AT SAMPLE TIME.

        The slot-major layout makes successors free: slot ``s+k`` of lane
        ``l`` holds the SAME env's transition ``k`` vec-steps later, so
        n-step needs only a strided gather — no separate n-step buffer.
        Composition stops at the first episode boundary (``done`` — term
        OR trunc: the auto-reset successor belongs to a new episode) and
        at the ring's write head (the next slot there is either unwritten
        or the ring's OLDEST data, not this transition's successor).
        Returns the composed reward ``reward_n`` =
        sum_k gamma^k r_{t+k}, the bootstrap observation ``boot_obs`` at
        the last composed step, ``discount`` = gamma^{steps used}, and
        ``boot_mask`` (0 when the window ended in termination — truncation
        keeps the bootstrap, SB3's handle_timeout_termination)."""
        S, B = self.obs.shape[0], self.batch_width
        idx = jax.random.randint(key, (batch_size,), 0,
                                 jnp.maximum(self.size, 1))
        s, l = idx // B, idx % B
        newest = (self.slot - 1) % S
        # vec-steps from s to the newest written slot, in ring order
        ahead = (newest - s) % S
        ks = jnp.arange(n)                                  # [n]
        slots = (s[:, None] + ks[None, :]) % S              # [bs, n]
        r = self.rewards[slots, l[:, None]]                 # [bs, n]
        d = self.done[slots, l[:, None]]                    # [bs, n]
        # include step k iff no boundary before it and the ring still has
        # this episode's successor there
        no_prior_done = jnp.cumprod(
            jnp.concatenate([jnp.ones((batch_size, 1), jnp.int32),
                             (~d[:, :-1]).astype(jnp.int32)], axis=1),
            axis=1).astype(bool)                            # [bs, n]
        include = no_prior_done & (ks[None, :] <= ahead[:, None])
        gammas = gamma ** ks.astype(jnp.float32)            # [n]
        reward_n = jnp.sum(r * include * gammas[None, :], axis=1)
        last = jnp.sum(include.astype(jnp.int32), axis=1) - 1  # [bs] >= 0
        last_slot = (s + last) % S
        boot_obs = self.next_obs[last_slot, l]
        boot_mask = ~self.terminated[last_slot, l]
        discount = gamma ** (last + 1).astype(jnp.float32)
        return dict(obs=self.obs[s, l], actions=self.actions[s, l],
                    reward_n=reward_n, boot_obs=boot_obs,
                    boot_mask=boot_mask, discount=discount)


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    buffer: ReplayBuffer
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    stats: EpisodeStats
    n_calls: jnp.ndarray     # i32[] vec-env steps taken (SB3 _n_calls)


class DQNTrainer:
    """On-device DQN over a vectorized (optionally curriculum) env."""

    def __init__(self, venv, config: DQNConfig = DQNConfig(),
                 total_timesteps: int = 10_000_000):
        self.venv = venv
        self.config = config
        self.total_timesteps = total_timesteps
        self.model = QNetwork(num_actions=venv.num_actions,
                              hidden_sizes=config.hidden_sizes)
        if config.lr_decay_start_fraction < 1.0:
            # Linear decay from lr to lr*lr_final_scale over the last
            # (1 - start_fraction) of training, in optimizer-update units
            # (gradient_steps per train_freq*n_envs env steps).
            total_updates = max(
                int(total_timesteps
                    / (config.train_freq * venv.num_envs)
                    * config.gradient_steps), 1)
            start = int(total_updates * config.lr_decay_start_fraction)
            lr = optax.join_schedules(
                [optax.constant_schedule(config.learning_rate),
                 optax.linear_schedule(
                     config.learning_rate,
                     config.learning_rate * config.lr_final_scale,
                     max(total_updates - start, 1))],
                [start])
        else:
            lr = config.learning_rate
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(lr),
        )
        # SB3 updates the target every max(interval // n_envs, 1) vec steps.
        self._target_every = max(
            config.target_update_interval // venv.num_envs, 1)

    def init(self, key: jax.Array) -> DQNState:
        k_env, k_model, k_train = jax.random.split(key, 3)
        env_state, obs, _ = self.venv.reset(k_env)
        params = self.model.init(k_model, obs)
        return DQNState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            buffer=ReplayBuffer.create(self.config.buffer_size,
                                       self.venv.obs_dim,
                                       self.venv.num_envs,
                                       slot_block=self.config.train_freq),
            env_state=env_state,
            obs=obs,
            key=k_train,
            stats=EpisodeStats.init(obs.shape[0]),
            n_calls=jnp.int32(0),
        )

    # -- epsilon schedule (`trainingCode.py:238-240`) -----------------------

    def epsilon(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        frac = timesteps.astype(jnp.float32) / (
            cfg.exploration_fraction * self.total_timesteps)
        frac = jnp.clip(frac, 0.0, 1.0)
        return (cfg.exploration_initial_eps
                + frac * (cfg.exploration_final_eps
                          - cfg.exploration_initial_eps))

    def policy(self, params, obs, key=None, epsilon=0.0,
               deterministic: bool = False):
        q = self.model.apply(params, obs)
        greedy = jnp.argmax(q, axis=-1)
        if deterministic or key is None:
            return greedy
        k_eps, k_rand = jax.random.split(key)
        B = obs.shape[0]
        random_actions = jax.random.randint(k_rand, (B,), 0,
                                            self.venv.num_actions)
        explore = jax.random.uniform(k_eps, (B,)) < epsilon
        return jnp.where(explore, random_actions, greedy)

    # -- collection ---------------------------------------------------------

    def _collect_step(self, state: DQNState
                      ) -> Tuple[DQNState, Tuple[jnp.ndarray, ...]]:
        """One vec-env step; returns the transition instead of writing it
        (the caller block-writes a whole train_freq of them at once, so
        the multi-GB buffer never rides the collect scan's carry)."""
        key, k_act = jax.random.split(state.key)
        eps = self.epsilon(state.stats.timesteps)
        action = self.policy(state.params, state.obs, k_act, eps)
        env_state, next_obs, reward, term, trunc, info = self.venv.step(
            state.env_state, action)
        done = term | trunc
        transition = (state.obs, info["final_obs"], action, reward, term,
                      done)
        stats = state.stats.update(reward, done,
                                   info["exploration_percentage"])
        return dataclasses.replace(
            state, env_state=env_state, obs=next_obs,
            key=key, stats=stats, n_calls=state.n_calls + 1), transition

    # -- learning -----------------------------------------------------------

    def _gradient_step(self, state: DQNState,
                       buffer: ReplayBuffer | None = None,
                       mask: jnp.ndarray | None = None
                       ) -> Tuple[DQNState, Dict]:
        """One Huber-loss Q-update on a sampled batch.

        ``buffer`` overrides ``state.buffer`` so callers can pass it as a
        loop-invariant capture (train_iteration holds it out of the scan
        carry). ``mask`` (bool scalar) gates whether the update is
        APPLIED: when False the params/opt-state pass through unchanged.
        Computing the update unconditionally and masking the apply keeps
        the training chunk free of ``lax.cond`` over the multi-GB replay
        buffer — the branch-free form XLA can alias in place through the
        scan — and the wasted FLOPs are one batch-64 MLP pass (~0.8 ms)
        per iteration during the short ``learning_starts`` warmup only."""
        cfg = self.config
        if buffer is None:
            buffer = state.buffer
        key, k_sample = jax.random.split(state.key)
        if cfg.n_step > 1:
            batch = buffer.sample_nstep(k_sample, cfg.batch_size,
                                        cfg.n_step, cfg.gamma)
            boot_obs = batch["boot_obs"]
        else:
            batch = buffer.sample(k_sample, cfg.batch_size)
            boot_obs = batch["next_obs"]

        q_next = self.model.apply(state.target_params, boot_obs)
        if cfg.double_q:
            # Double-DQN (opt-in, DQNConfig.double_q): online net picks the
            # bootstrap action, target net evaluates it.
            a_next = jnp.argmax(
                self.model.apply(state.params, boot_obs), axis=-1)
            q_boot = jnp.take_along_axis(q_next, a_next[:, None],
                                         axis=-1)[:, 0]
        else:
            q_boot = jnp.max(q_next, axis=-1)
        if cfg.n_step > 1:
            target = batch["reward_n"] + batch["discount"] * jnp.where(
                batch["boot_mask"], q_boot, 0.0)
        else:
            target = batch["rewards"] + cfg.gamma * jnp.where(
                batch["terminated"], 0.0, q_boot)
        if cfg.td_target_clip > 0:
            # Clamp the target to within +-clip of the online estimate.
            # Unsaturated samples keep the ORIGINAL target bitwise (the
            # where, not q_cur + (target - q_cur), which would reround) —
            # so with the Huber knee at 1.0 any clip >= 1 is exactly the
            # vanilla update on every backend (see DQNConfig docstring).
            q_cur = jnp.take_along_axis(
                self.model.apply(state.params, batch["obs"]),
                batch["actions"][:, None], axis=-1)[:, 0]
            delta = target - q_cur
            c = cfg.td_target_clip
            target = jnp.where(jnp.abs(delta) <= c, target,
                               q_cur + jnp.clip(delta, -c, c))

        def loss_fn(params):
            q = self.model.apply(params, batch["obs"])
            q_sel = jnp.take_along_axis(
                q, batch["actions"][:, None], axis=-1)[:, 0]
            return optax.huber_loss(q_sel, target).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        if mask is not None:
            params = jax.tree.map(
                lambda new, old: jnp.where(mask, new, old),
                params, state.params)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(mask, new, old),
                opt_state, state.opt_state)
        return dataclasses.replace(state, params=params, key=key,
                                   opt_state=opt_state), dict(loss=loss)

    def _maybe_update_target(self, state: DQNState) -> DQNState:
        """Soft (polyak tau) target update every `_target_every` vec steps."""
        tau = self.config.tau
        do = (state.n_calls % self._target_every) == 0
        target = jax.tree.map(
            lambda t, p: jnp.where(do, tau * p + (1 - tau) * t, t),
            state.target_params, state.params)
        return dataclasses.replace(state, target_params=target)

    def train_iteration(self, state: DQNState) -> Tuple[DQNState, Dict]:
        """`train_freq` vec-env collect steps, then `gradient_steps`
        updates (masked out while warming up, `learning_starts`).

        The warmup gate is a masked apply rather than ``lax.cond``: a cond
        whose operands include the multi-GB replay buffer defeats XLA's
        in-place buffer aliasing through the chunk scan (each iteration
        re-materializes the buffer), while the masked form keeps the loop
        branch-free and alias-friendly."""
        cfg = self.config
        buffer = state.buffer

        # Collect with the buffer held OUT of the scan carry: each step
        # yields its transition, and one K-slot block write lands them
        # all afterwards. Carrying the multi-GB buffer through the scan —
        # even untouched — profiled at ~1.5 ms per step of copy traffic.
        def collect(s, _):
            s, transition = self._collect_step(s)
            return self._maybe_update_target(s), transition
        carry = dataclasses.replace(state, buffer=None)
        carry, transitions = jax.lax.scan(collect, carry, None,
                                          length=cfg.train_freq)
        buffer = buffer.add_block(*transitions)

        warm = carry.stats.timesteps >= cfg.learning_starts

        # Gradient steps read the buffer as a scan-invariant capture (XLA
        # hoists it out of the loop), not as carry.
        def gstep(s2, _):
            s2, m = self._gradient_step(s2, buffer=buffer, mask=warm)
            return s2, m["loss"]
        carry, losses = jax.lax.scan(gstep, carry, None,
                                     length=cfg.gradient_steps)
        state = dataclasses.replace(carry, buffer=buffer)
        loss = jnp.where(warm, losses.mean(), 0.0)
        return state, dict(loss=loss, epsilon=self.epsilon(
            state.stats.timesteps))

    def train_chunk(self, state: DQNState, num_iterations: int
                    ) -> Tuple[DQNState, Dict]:
        def body(s, _):
            return self.train_iteration(s)
        state, metrics = jax.lax.scan(body, state, None,
                                      length=num_iterations)
        return state, jax.tree.map(lambda x: x.mean(), metrics)
