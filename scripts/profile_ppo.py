"""Profile one RecurrentPPO train iteration on the TPU.

Times rollout-collect + update for the reference-exact scale (128 envs,
n_steps=1024, 2562-wide LSTM) under the round-4 chunked-BPTT path, with
honest device->host sync (scalar fetch, never block_until_ready through
the axon tunnel). Env knobs:

  PPO_CHUNK     bptt_chunk (default 128; 0 = whole-rollout BPTT)
  PPO_BATCH     batch_size in samples (default 16384)
  PPO_DTYPE     compute dtype (default bfloat16)
  PPO_N_STEPS   rollout length (default 1024)
  PPO_N_ENVS    env count (default 128)
  PPO_FUSED     1 = fused Pallas env in the collect path (default 1)
  PPO_ITERS     timed iterations (default 3)
  PPO_SPLIT     0 = one program per iteration (default), 1/2 = round-3 splits
"""

import os
import time

import jax

from rlenv_tpu.config import (CurriculumConfig, EnvConfig,
                              RecurrentPPOConfig, RewardConfig)
from rlenv_tpu.train.trainer import make_trainer, make_venv

if __name__ == "__main__":
    chunk = int(os.environ.get("PPO_CHUNK", 128))
    batch = int(os.environ.get("PPO_BATCH", 16384))
    dtype = os.environ.get("PPO_DTYPE", "bfloat16")
    n_steps = int(os.environ.get("PPO_N_STEPS", 1024))
    n_envs = int(os.environ.get("PPO_N_ENVS", 128))
    fused = os.environ.get("PPO_FUSED", "1") == "1"
    iters = int(os.environ.get("PPO_ITERS", 3))
    split = int(os.environ.get("PPO_SPLIT", 0))
    remat = os.environ.get("PPO_REMAT", "1") == "1"

    env_config = EnvConfig.training(rewards=RewardConfig.recurrent_ppo())
    venv = make_venv(env_config, n_envs, use_curriculum=True,
                     curriculum=CurriculumConfig.ppo_dqn(), fused=fused)
    cfg = RecurrentPPOConfig(n_steps=n_steps, batch_size=batch,
                             bptt_chunk=chunk, compute_dtype=dtype,
                             remat=remat)
    trainer = make_trainer("ppo", venv, cfg)
    print(f"config: chunk={chunk} batch={batch} dtype={dtype} "
          f"n_steps={n_steps} n_envs={n_envs} fused={fused} split={split} "
          f"remat={remat}", flush=True)

    t0 = time.time()
    state = jax.jit(trainer.init)(jax.random.PRNGKey(0))
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    if split:
        rollout_fn = jax.jit(trainer.rollout)
        targets_fn = jax.jit(trainer.compute_targets)
        epochs_per_call = 1 if split >= 2 else cfg.n_epochs
        update_fn = jax.jit(
            lambda s, tr, c0, adv, ret: trainer.update_epochs(
                s, tr, c0, adv, ret, epochs_per_call))

        def iteration(state):
            t0 = time.time()
            state, traj, c0, boot = rollout_fn(state)
            jax.tree.leaves(traj)[0].ravel()[0].item()  # honest sync
            t1 = time.time()
            adv, ret = targets_fn(state, traj, boot)
            for _ in range(cfg.n_epochs // epochs_per_call):
                state, m = update_fn(state, traj, c0, adv, ret)
            float(m["loss"])
            print(f"  phase: rollout {t1-t0:.2f}s  update "
                  f"{time.time()-t1:.2f}s", flush=True)
            return state, m
    else:
        iteration = jax.jit(trainer.train_iteration, donate_argnums=0)

    t0 = time.time()
    state, m = iteration(state)
    loss = float(m["loss"])  # honest sync
    print(f"iter0 (compile+run): {time.time()-t0:.1f}s loss={loss:.4f}",
          flush=True)

    for i in range(iters):
        t0 = time.time()
        state, m = iteration(state)
        loss = float(m["loss"])
        dt = time.time() - t0
        sps = n_steps * n_envs / dt
        print(f"iter{i+1}: {dt:.2f}s  {sps:,.0f} steps/s  loss={loss:.4f}",
              flush=True)
    print(f"timesteps={int(state.stats.timesteps):,}")
