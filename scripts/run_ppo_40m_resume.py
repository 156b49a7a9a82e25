"""Extend the round-5 30M asymptote run to 40M via checkpoint resume.

The original run (`sweep_ppo.py n1024_b16384_a2ccur_30m`) stalled at
27.8M when the tunnel's TPU worker hung; its Orbax checkpoints survive.
Resuming to 40M gives a clean last-doubling (20M -> 40M) for the
saturation criterion (tail-delta < 2 pts)."""

import os

from rlenv_tpu.config import (CurriculumConfig, EnvConfig,
                              RecurrentPPOConfig, RewardConfig)
from rlenv_tpu.train.trainer import train

if __name__ == "__main__":
    state, result = train(
        algo="ppo",
        total_timesteps=int(os.environ.get("PPO_STEPS", 40_000_000)),
        n_envs=128,
        use_curriculum=True,
        fused=True,
        env_config=EnvConfig.training(rewards=RewardConfig.recurrent_ppo()),
        algo_config=RecurrentPPOConfig(n_steps=1024, batch_size=16384,
                                       bptt_chunk=128,
                                       compute_dtype="bfloat16",
                                       remat=False),
        curriculum_config=CurriculumConfig.a2c(),
        log_dir="runs/ppo_sweep/n1024_b16384_a2ccur_30m",
        seed=0,
        iterations_per_chunk=1,
        checkpoint_interval=2_000_000,
        eval_interval=4_000_000,
        n_eval_episodes=16,
        resume=True,
        plot=False,
    )
    print("DONE", result)
