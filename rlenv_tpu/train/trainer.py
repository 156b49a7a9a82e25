"""Host-level training driver.

The TPU-native counterpart of the reference's training entry points
(`/root/reference/trainingCode.py:116-284`, `A2C_training.py:189-293`):
builds env + trainer from configs, runs jitted multi-iteration chunks on
device, and between chunks drains episode statistics to Monitor CSVs /
training_log.txt / TensorBoard, checkpoints via Orbax, and finally saves,
evaluates (10 deterministic episodes, mirroring ``evaluate_policy``) and
plots the learning curve.

The host loop touches the device only once per CHUNK (default hundreds of
updates), not per step — the inverse of the reference's per-step
GPU↔Python ping-pong (SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu.config import (A2CConfig, CurriculumConfig, DQNConfig,
                              EnvConfig, RecurrentPPOConfig)
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.curriculum import CurriculumVecPlantOS
from rlenv_tpu.env.vector import VecPlantOS
from rlenv_tpu.train.checkpoint import CheckpointManager, save_params
from rlenv_tpu.train.metrics import (MonitorWriter, TensorBoardWriter,
                                     TrainingLogWriter)
from rlenv_tpu.train.plotting import plot_learning_curve


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return ("tpu" in dev.platform.lower()
            or "tpu" in dev.device_kind.lower())


def make_venv(env_config: EnvConfig, n_envs: int, use_curriculum: bool,
              curriculum: Optional[CurriculumConfig] = None,
              fused: Optional[bool] = None,
              reset_pool: int = 0):
    """Env factory mirroring ``make_env_wrapper`` composition
    (`trainingCode.py:103-111`): raw env -> (curriculum) -> vectorized.

    ``fused=True`` steps the batch with the single-program Pallas kernel
    (`rlenv_tpu.ops.fused_step`) instead of the multi-kernel XLA path;
    bit-identical outputs (curriculum included, via
    FusedCurriculumVecPlantOS). ``fused=None`` (the default) resolves to
    True on TPU, False elsewhere: Pallas/Mosaic lowers on TPU, and the
    interpret-mode fallback is orders of magnitude slower than the XLA
    path, so each platform gets its fast bit-exact implementation. The
    XLA path stays available everywhere via ``fused=False`` as the
    verification mode (`tests/test_fused_step.py` asserts equality).

    ``reset_pool=R`` (curriculum wrappers only) amortizes auto-reset map
    generation to one batched program per R steps — bit-identical
    trajectories, see ``rlenv_tpu.env.curriculum`` module docs."""
    if fused is None:
        fused = _on_tpu()
    env = PlantOS(env_config)
    if use_curriculum:
        if fused:
            from rlenv_tpu.env.fused_vector import FusedCurriculumVecPlantOS
            return FusedCurriculumVecPlantOS(
                env, n_envs, curriculum or CurriculumConfig(),
                reset_pool=reset_pool)
        return CurriculumVecPlantOS(env, n_envs,
                                    curriculum or CurriculumConfig(),
                                    reset_pool=reset_pool)
    if fused:
        from rlenv_tpu.env.fused_vector import FusedVecPlantOS
        return FusedVecPlantOS(env, n_envs)
    return VecPlantOS(env, n_envs)


def make_trainer(algo: str, venv, algo_config=None,
                 total_timesteps: int = 100_000):
    from rlenv_tpu.algos.a2c import A2CTrainer
    from rlenv_tpu.algos.dqn import DQNTrainer
    from rlenv_tpu.algos.ppo_recurrent import RecurrentPPOTrainer

    algo = algo.lower()
    if algo == "a2c":
        return A2CTrainer(venv, algo_config or A2CConfig())
    if algo == "dqn":
        return DQNTrainer(venv, algo_config or DQNConfig(),
                          total_timesteps=total_timesteps)
    if algo in ("ppo", "recurrent_ppo"):
        return RecurrentPPOTrainer(venv, algo_config or RecurrentPPOConfig(),
                                   total_timesteps=total_timesteps)
    raise ValueError(f"unknown algo {algo!r}")


def _steps_per_iteration(trainer, n_envs: int) -> int:
    cfg = trainer.config
    if hasattr(cfg, "train_freq"):       # DQN
        return cfg.train_freq * n_envs
    return cfg.n_steps * n_envs          # A2C / PPO


def _buffer_stripped(state):
    """Checkpoint view of a train state: a dict of its fields with the
    replay buffer OMITTED. SB3 parity: its ``.zip`` checkpoints exclude
    the replay buffer too (`trainingCode.py:249-253` saves via
    CheckpointCallback, whose archives hold policy/optimizer only), and
    serializing the 2M-transition buffer (~1.7 GB at the 107-dim config)
    stalls training 10-30 s per snapshot. Resume restarts with an empty
    buffer that refills from live experience.

    Caveat (shared with SB3 when resuming without a saved buffer): a resume
    past ``learning_starts`` immediately samples from only the freshly
    collected slots, so the first few gradient steps see highly correlated
    data until the ring refills; the effect washes out within
    ``learning_starts`` steps and matches reference-stack behavior."""
    d = {f.name: getattr(state, f.name)
         for f in dataclasses.fields(state)}
    d.pop("buffer", None)
    return d


def _merge_restored(restored: dict, live_state):
    """Rebuild a train state from a buffer-stripped checkpoint dict:
    checkpointed fields restored, buffer (if any) fresh and empty."""
    return dataclasses.replace(live_state, **restored)


@dataclasses.dataclass
class TrainResult:
    timesteps: int
    episodes: int
    mean_return: float
    mean_exploration: float
    wall_seconds: float
    steps_per_sec: float
    final_model_path: Optional[str]


def train(algo: str = "a2c",
          total_timesteps: int = 100_000,
          n_envs: int = 64,
          use_curriculum: bool = False,
          fused: Optional[bool] = None,
          reset_pool: int = 0,
          env_config: Optional[EnvConfig] = None,
          algo_config=None,
          curriculum_config: Optional[CurriculumConfig] = None,
          log_dir: str = "logs/train",
          models_dir: Optional[str] = None,
          seed: int = 0,
          init_params: Any = None,
          init_opt_state: Any = None,
          checkpoint_interval: Optional[int] = None,
          eval_freq: int = 10_000,
          eval_interval: Optional[int] = None,
          n_eval_episodes: int = 10,
          fused_eval: Optional[bool] = None,
          iterations_per_chunk: int = 64,
          program_split: int = 0,
          resume: bool = False,
          plot: bool = True,
          verbose: bool = True) -> Tuple[Any, TrainResult]:
    """Train a policy; returns (trainer_state, TrainResult)."""
    # Persistent compile cache: env vars are frozen before user code on
    # this box (sitecustomize pre-imports jax), so enable it here where
    # it reliably takes effect for every training entry point.
    from rlenv_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    env_config = env_config or EnvConfig.training()
    models_dir = models_dir or os.path.join(log_dir, "models")
    os.makedirs(models_dir, exist_ok=True)

    venv = make_venv(env_config, n_envs, use_curriculum, curriculum_config,
                     fused=fused, reset_pool=reset_pool)
    trainer = make_trainer(algo, venv, algo_config, total_timesteps)

    # Jitted init: ONE compiled program (persistently cached) instead of a
    # long chain of eager op-by-op dispatches — through the remote-TPU
    # tunnel the eager path took ~4 min per process start.
    state = jax.jit(trainer.init)(jax.random.PRNGKey(seed))
    if hasattr(state, "target_params"):
        # De-alias target_params from params (jitted init may emit one
        # buffer for both) so the chunk can donate its input state.
        state = dataclasses.replace(
            state, target_params=jax.tree.map(jnp.copy, state.params))
    if init_params is not None:
        # Warm start from an existing policy (e.g. an imported SB3 .zip via
        # rlenv_tpu.apps.sb3_import) — a continue-training path the
        # reference lacks entirely (SURVEY.md §5: loads are inference-only).
        # Copy the provided trees: the chunk donates its input state, which
        # would otherwise delete the caller's arrays out from under them.
        init_params = jax.tree.map(jnp.copy, init_params)
        state = dataclasses.replace(
            state, params=init_params,
            opt_state=(jax.tree.map(jnp.copy, init_opt_state)
                       if init_opt_state is not None
                       else trainer.optimizer.init(init_params)))
        if hasattr(state, "target_params"):
            state = dataclasses.replace(
                state,
                target_params=jax.tree.map(jnp.copy, init_params))
    ckpt = CheckpointManager(os.path.join(models_dir, "checkpoints"))
    if resume and ckpt.latest_step() is not None:
        try:
            restored = ckpt.restore(_buffer_stripped(state))
        except (ValueError, KeyError):
            # Checkpoint written by the pre-round-3 FULL-state format (the
            # whole train-state pytree, buffer included). Restore against a
            # full template, then drop the buffer: training resumes with an
            # empty buffer either way (SB3 parity, see _buffer_stripped).
            full = {f.name: getattr(state, f.name)
                    for f in dataclasses.fields(state)}
            restored = ckpt.restore(full)
            restored.pop("buffer", None)
        state = _merge_restored(restored, state)
        if verbose:
            print(f"Resumed from checkpoint step {ckpt.latest_step()}")

    # On a checkpoint resume, continue the existing episode CSV instead of
    # truncating it (the pre-resume history is part of the same run), and
    # mark the restored stats ring as already drained — otherwise the
    # first post-resume drain would re-emit up to ring-capacity episodes
    # that the pre-resume process already logged.
    monitor = MonitorWriter(log_dir, append=resume)
    if resume:
        monitor.mark_drained(int(state.stats.log_pos))
    train_log = TrainingLogWriter(log_dir, eval_freq=eval_freq)
    tb = TensorBoardWriter(os.path.join(log_dir, "tensorboard"))

    steps_per_iter = _steps_per_iteration(trainer, n_envs)
    if program_split and hasattr(trainer, "rollout"):
        # Drive rollout / GAE targets / update epochs as SEPARATE device
        # programs (1 = rollout+update split, 2 = additionally one program
        # per epoch). Needed where one fused XLA program per iteration is
        # too large for the TPU runtime (e.g. 256-step BPTT of the
        # 2562-wide LSTM x 10 epochs).
        rollout_fn = jax.jit(trainer.rollout)
        targets_fn = jax.jit(trainer.compute_targets)
        n_epochs = trainer.config.n_epochs
        epochs_per_call = 1 if program_split >= 2 else n_epochs
        update_fn = jax.jit(
            lambda s, tr, c0, adv, ret: trainer.update_epochs(
                s, tr, c0, adv, ret, epochs_per_call))

        def run_chunk(state):
            all_metrics = []
            for _ in range(iterations_per_chunk):
                state, traj, c0, boot = rollout_fn(state)
                adv, ret = targets_fn(state, traj, boot)
                for _ in range(n_epochs // epochs_per_call):
                    state, m = update_fn(state, traj, c0, adv, ret)
                    all_metrics.append(m)
            metrics = jax.tree.map(
                lambda *xs: sum(xs) / len(xs), *all_metrics)
            return state, metrics
    else:
        # Donating the carried train state lets XLA update the replay
        # buffer (DQN: ~1.7 GB at the reference config) in place across
        # chunk calls instead of copying it; init de-aliases
        # params/target_params above so donation is legal.
        chunk_fn = jax.jit(
            lambda s: trainer.train_chunk(s, iterations_per_chunk),
            donate_argnums=0)

        def run_chunk(state):
            return chunk_fn(state)
    # SB3-style checkpoint cadence: every ~total/10 steps by default
    # (`A2C_training.py:250-254`).
    checkpoint_interval = checkpoint_interval or max(
        total_timesteps // 10, steps_per_iter * iterations_per_chunk)
    next_ckpt = checkpoint_interval
    # Eval-driven best-model capture (SB3 EvalCallback(best_model_save_path)
    # pattern, `trainingCode.py:188-194`): periodic deterministic evaluation;
    # whenever mean eval return improves, snapshot params to models/best_model.
    next_eval = eval_interval or (total_timesteps + 1)
    best_eval_return = -float("inf")
    best_model_path = os.path.join(models_dir, "best_model")
    if eval_interval:
        # Policy-in-kernel eval (one Pallas launch per eval, ~27x the
        # per-step XLA scan) whenever the policy has a fused-actor form;
        # fall back to the XLA scan for recurrent policies / off-TPU.
        if fused_eval is None:
            fused_eval = _on_tpu() and _actor_eval_spec(trainer) is not None
        if fused_eval:
            eval_fn = make_fused_eval_fn(trainer, env_config,
                                         n_eval_episodes, use_curriculum,
                                         curriculum_config)
        else:
            # Same env composition, but only as wide as the episodes we
            # score — evaluating at the full training width computes
            # (e.g.) 512 episode returns to read 16.
            eval_venv = (make_venv(env_config, n_eval_episodes,
                                   use_curriculum, curriculum_config,
                                   fused=False)
                         if n_eval_episodes < n_envs else None)
            eval_fn = make_eval_fn(trainer, env_config.max_steps,
                                   venv=eval_venv)
    else:
        eval_fn = None

    def _maybe_eval(state, timesteps):
        nonlocal next_eval, best_eval_return
        if not eval_interval or timesteps < next_eval:
            return
        while next_eval <= timesteps:
            next_eval += eval_interval
        mean_ret, std_ret = evaluate(
            trainer, state, n_eval_episodes=n_eval_episodes,
            max_steps=env_config.max_steps, seed=seed + 1000,
            eval_fn=eval_fn)
        tb.scalars(timesteps, {"eval/mean_return": mean_ret,
                               "eval/std_return": std_ret})
        if mean_ret > best_eval_return:
            best_eval_return = mean_ret
            save_params(best_model_path, state.params, metadata={
                "model_type": ("ppo" if algo in ("ppo", "recurrent_ppo")
                               else algo),
                "eval_mean_return": mean_ret,
                "eval_std_return": std_ret,
                "timesteps": timesteps,
                "obs_dim": venv.obs_dim,
                "num_actions": venv.num_actions,
            })
            if verbose:
                print(f"[{algo}] new best model at step {timesteps:,}: "
                      f"eval return {mean_ret:.1f} ± {std_ret:.1f}",
                      flush=True)
        elif verbose:
            print(f"[{algo}] eval at step {timesteps:,}: "
                  f"{mean_ret:.1f} ± {std_ret:.1f} "
                  f"(best {best_eval_return:.1f})", flush=True)

    def _curriculum_success_array(state):
        # Curriculum threshold successes tracked on device
        # (`CurriculumState.successful_explorations`); None without one.
        # Logged as its own line — distinct from 'Mazes completed', which
        # always counts >=100%-explored episodes (the reference callback's
        # definition, `trainingCode.py:300-318`).
        env_state = state.env_state
        return getattr(env_state, "successful_explorations", None)

    t0 = time.time()
    start_steps = int(jax.device_get(state.stats.timesteps))
    timesteps = start_steps
    try:
        while timesteps < total_timesteps:
            state, metrics = run_chunk(state)
            # ONE batched device→host transfer per chunk. Through the
            # axon tunnel every array fetch is a separate round trip, so
            # the old field-by-field reads (timesteps, the 5 stats-ring
            # arrays, each metrics scalar, the curriculum counter —
            # 10-15 blocking fetches) cost ~0.5 s of host time per chunk,
            # more than many chunks' device time (profile_a2c_r4.log:
            # 69.3 s end-to-end over ~31 s of device time). device_get
            # of one tuple fetches every leaf in a single sync and is
            # bit-identical by construction.
            stats_h, metrics_h, cur_h = jax.device_get(
                (state.stats, metrics, _curriculum_success_array(state)))
            timesteps = int(stats_h.timesteps)
            summary = monitor.drain(stats_h)
            train_log.maybe_log(
                timesteps, stats_h,
                curriculum_successes=(int(cur_h.sum())
                                      if cur_h is not None else None))
            scalars = {f"train/{k}": float(v) for k, v in metrics_h.items()}
            scalars.update({f"rollout/{k}": v for k, v in summary.items()})
            tb.scalars(timesteps, scalars)
            _maybe_eval(state, timesteps)
            if timesteps >= next_ckpt:
                ckpt.save(timesteps, _buffer_stripped(state))
                next_ckpt += checkpoint_interval
            if verbose:
                sps = (timesteps - start_steps) / max(time.time() - t0, 1e-9)
                msg = (f"[{algo}] steps={timesteps:,}  "
                       f"sps={sps:,.0f}")
                if summary:
                    msg += (f"  ep_ret={summary['mean_return']:.1f}  "
                            f"expl={summary['mean_exploration']:.1f}%")
                print(msg, flush=True)
    except (KeyboardInterrupt, Exception):
        # Failure recovery the reference lacks (SURVEY.md §5): persist the
        # full train state before propagating, so --resume continues from
        # the interruption instead of step 0.
        try:
            ckpt.save(int(state.stats.timesteps), _buffer_stripped(state),
                      force=True)
            ckpt.wait()
            if verbose:
                print(f"[{algo}] interrupted — emergency checkpoint saved "
                      f"at step {int(state.stats.timesteps):,}", flush=True)
        except Exception:
            pass
        raise

    wall = time.time() - t0
    timesteps = int(state.stats.timesteps)
    ckpt.save(timesteps, _buffer_stripped(state), force=True)
    ckpt.wait()

    final_path = os.path.join(models_dir, f"{algo}_final")
    save_params(final_path, state.params, metadata={
        "model_type": "ppo" if algo in ("ppo", "recurrent_ppo") else algo,
        "algo_config": dataclasses.asdict(trainer.config),
        "env_config": dataclasses.asdict(env_config),
        "obs_dim": venv.obs_dim,
        "num_actions": venv.num_actions,
        "timesteps": timesteps,
    })

    episodes = int(state.stats.completed_count)
    result = TrainResult(
        timesteps=timesteps,
        episodes=episodes,
        mean_return=float(state.stats.completed_return_sum)
        / max(episodes, 1),
        mean_exploration=float(state.stats.last_exploration_sum)
        / max(episodes, 1),
        wall_seconds=wall,
        steps_per_sec=(timesteps - start_steps) / max(wall, 1e-9),
        final_model_path=final_path,
    )
    if plot:
        plot_learning_curve(log_dir, f"{algo.upper()} Learning Curve")
    tb.close()
    ckpt.close()
    if verbose:
        print(f"Training complete: {result}")
    return state, result


def _actor_eval_spec(trainer):
    """``(layer_extractor, activation)`` when the trainer's policy fits
    the in-kernel actor (plain MLP nets only), else ``None``."""
    from rlenv_tpu.models.mlp import ActorCritic, QNetwork
    m = getattr(trainer, "model", None)
    if isinstance(m, QNetwork):
        from rlenv_tpu.ops.actor_rollout import qnet_policy_layers
        return qnet_policy_layers, "relu"
    if isinstance(m, ActorCritic):
        from rlenv_tpu.ops.actor_rollout import actor_critic_policy_layers
        return actor_critic_policy_layers, m.activation
    return None


def make_fused_eval_fn(trainer, env_config, n_eval_episodes: int,
                       use_curriculum: bool, curriculum_config=None,
                       interpret: Optional[bool] = None):
    """Policy-in-kernel evaluation: the whole deterministic episode —
    greedy MLP forward + env transition, ``max_steps`` times — runs as
    ONE Pallas program (:mod:`rlenv_tpu.ops.actor_rollout`).

    Same contract as :func:`make_eval_fn` (``params, seed -> per-env
    first-episode returns``) and the same reset seeding, but the env
    width is lane-padded up to a multiple of 8, so the scored episode
    set differs from the XLA path's at the same ``n_eval_episodes``
    (``jax.random.split`` keys depend on the batch width). ~27x faster
    at production sizes: 1000 greedy QNetwork steps in one ~26 ms launch
    vs ~0.7 s for the per-step XLA scan (scripts/tpu_actor_check.py).
    """
    from rlenv_tpu.ops.actor_rollout import (build_actor_rollout,
                                             pack_mlp_policy)
    spec = _actor_eval_spec(trainer)
    assert spec is not None, "policy has no fused-actor form"
    layer_fn, activation = spec
    W = max(8, -(-n_eval_episodes // 8) * 8)
    venv = make_venv(env_config, W, use_curriculum, curriculum_config,
                     fused=True)
    if interpret is None:
        interpret = not _on_tpu()
    # layer count is static per net class: trunk/tower depth + head
    n_layers = len(trainer.model.hidden_sizes) + 1
    with jax.ensure_compile_time_eval():
        actor = build_actor_rollout(env_config, W, env_config.max_steps,
                                    n_layers=n_layers, activation=activation,
                                    block_envs=W, interpret=interpret)

    def eval_fn(params, seed):
        st, obs, _ = venv.reset(jax.random.fold_in(
            jax.random.PRNGKey(0), seed))
        flat = st.env if hasattr(st, "env") else st
        ws, bs = pack_mlp_policy(env_config, layer_fn(params))
        _, _, returns, _, _ = actor(flat, obs, ws, bs)
        return returns

    return jax.jit(eval_fn)


def make_eval_fn(trainer, max_steps: int = 1000,
                 deterministic: bool = True, venv=None):
    """Build ONE jitted evaluation program: params + seed -> per-env
    first-episode returns.

    Kept separate from :func:`evaluate` so periodic in-training evals
    reuse a single compiled program — re-tracing the 1000-step scan per
    eval call costs far more than the eval itself on this host.

    ``venv`` overrides the trainer's env: in-training evals pass a venv
    only ``n_eval_episodes`` wide, because evaluating on the full
    training width computes (e.g.) 512 episode returns to read 16 — at
    the 10M-step DQN scale those full-width evals were ~half the total
    wall-clock."""
    venv = venv or trainer.venv
    B = venv.num_envs
    is_recurrent = hasattr(trainer, "model") and hasattr(
        trainer.model, "initial_carry")

    def eval_fn(params, seed):
        env_state, obs, _ = venv.reset(jax.random.fold_in(
            jax.random.PRNGKey(0), seed))
        carry = trainer.model.initial_carry(B) if is_recurrent else None

        def body(loop_state, _):
            env_state, obs, carry, ep_start, returns, lengths, alive, key \
                = loop_state
            key, k_act = jax.random.split(key)
            if carry is not None:
                action, _, _, carry = trainer.policy(
                    params, obs, carry, ep_start,
                    None if deterministic else k_act,
                    deterministic=deterministic)
            else:
                out = trainer.policy(params, obs,
                                     None if deterministic else k_act,
                                     deterministic=deterministic)
                action = out[0] if isinstance(out, tuple) else out
            env_state, obs, reward, term, trunc, info = venv.step(
                env_state, action)
            done = term | trunc
            returns = returns + reward * alive
            lengths = lengths + alive.astype(jnp.int32)
            alive = alive & ~done
            return (env_state, obs, carry, done, returns, lengths, alive,
                    key), None

        init = (env_state, obs, carry, jnp.ones(B, bool),
                jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
                jnp.ones(B, bool),
                jax.random.fold_in(jax.random.PRNGKey(1), seed))
        (_, _, _, _, returns, _, _, _), _ = jax.lax.scan(
            body, init, None, length=max_steps)
        return returns

    return jax.jit(eval_fn)


def evaluate(trainer, state, n_eval_episodes: int = 10,
             max_steps: int = 1000, seed: int = 123,
             deterministic: bool = True,
             eval_fn=None) -> Tuple[float, float]:
    """Deterministic evaluation over fresh episodes; mirrors SB3's
    ``evaluate_policy`` call sites (`trainingCode.py:188-194`).

    Runs the venv's envs in lockstep and scores each env's FIRST episode
    (auto-resets after it are masked out), averaging the first
    ``n_eval_episodes``. Pass a prebuilt ``eval_fn`` (:func:`make_eval_fn`)
    to reuse its compiled program across calls.
    """
    if eval_fn is None:
        eval_fn = make_eval_fn(trainer, max_steps, deterministic)
    returns = eval_fn(state.params, jnp.int32(seed))
    rets = np.asarray(returns)[:n_eval_episodes]
    return float(rets.mean()), float(rets.std())
