"""RecurrentPPO 3M steps / 128 envs — round-4 chunked-BPTT fast path.

Reference claim: "~84% avg exploration, 3M steps, curriculum, 128 n_env,
~120 min" (`/root/reference/plantos_env.py:85`, trainer
`trainingCode.py:116-162`). Round 3 ran this at 1.1-1.4k steps/s
(program_split=2, per-epoch dispatch, unfused collect). Round 4 runs ONE
XLA program per train iteration: fused-Pallas collect, chunked BPTT
(bptt_chunk-length sequences with recorded LSTM carries — sb3_contrib's
own sub-sequence semantic), optional bfloat16 compute.

Knobs (env vars): PPO_CHUNK, PPO_BATCH (samples/minibatch), PPO_DTYPE,
PPO_N_STEPS, PPO_N_ENVS, PPO_REMAT, PPO_ENT (ent_coef), PPO_LOG_DIR,
PPO_STEPS (total), PPO_SEED, PPO_REWARDS (recurrent_ppo|dqn|a2c),
PPO_CURRICULUM (ppo_dqn|a2c|reference_actual).
"""

import os

from rlenv_tpu.config import (CurriculumConfig, EnvConfig,
                              RecurrentPPOConfig, RewardConfig)
from rlenv_tpu.train.trainer import train

if __name__ == "__main__":
    n_steps = int(os.environ.get("PPO_N_STEPS", 1024))
    n_envs = int(os.environ.get("PPO_N_ENVS", 128))
    chunk = int(os.environ.get("PPO_CHUNK", 128))
    batch = int(os.environ.get("PPO_BATCH", 16384))
    dtype = os.environ.get("PPO_DTYPE", "bfloat16")
    remat = os.environ.get("PPO_REMAT", "0") == "1"
    ent = float(os.environ.get("PPO_ENT", 0.02))
    total = int(os.environ.get("PPO_STEPS", 3_000_000))
    seed = int(os.environ.get("PPO_SEED", 0))
    log_dir = os.environ.get("PPO_LOG_DIR", "runs/ppo_tpu_3m_r4")
    rewards = getattr(RewardConfig, os.environ.get(
        "PPO_REWARDS", "recurrent_ppo"))()
    curriculum = getattr(CurriculumConfig, os.environ.get(
        "PPO_CURRICULUM", "ppo_dqn"))()
    env_config = EnvConfig.training(rewards=rewards)
    state, result = train(
        algo="ppo",
        total_timesteps=total,
        n_envs=n_envs,
        use_curriculum=True,
        fused=True,
        env_config=env_config,
        algo_config=RecurrentPPOConfig(
            n_steps=n_steps, batch_size=batch, bptt_chunk=chunk,
            compute_dtype=dtype, remat=remat, ent_coef=ent),
        curriculum_config=curriculum,
        log_dir=log_dir,
        seed=seed,
        iterations_per_chunk=1,
        checkpoint_interval=int(os.environ.get("PPO_CKPT_INT", 500_000)),
        eval_interval=int(os.environ.get("PPO_EVAL_INT", 500_000)),
        n_eval_episodes=16,
        resume=False,
    )
    print("DONE", result)
