"""RecurrentPPO at the reference's 128 envs — 3M steps, curriculum.

The reference comment claims "~84% avg exploration, 3M steps, curriculum,
128 n_env" (`/root/reference/plantos_env.py:85`; trainer
`trainingCode.py:116-162`). Round 2 ran 64 envs after worker crashes at
larger programs; this lands the configured-parity 128-env run.

Program-size mitigations (see scripts/run_ppo_3m.py for the rationale):
one device program per rollout / GAE / epoch (program_split=2),
iterations_per_chunk=1, rematerialized BPTT. PPO_N_STEPS env var selects
the BPTT horizon: 256 is the worker-stable recipe; 1024 is the
reference-exact value to attempt first.
"""

import os

from rlenv_tpu.config import (CurriculumConfig, EnvConfig,
                              RecurrentPPOConfig, RewardConfig)
from rlenv_tpu.train.trainer import train

if __name__ == "__main__":
    n_steps = int(os.environ.get("PPO_N_STEPS", 256))
    n_envs = int(os.environ.get("PPO_N_ENVS", 128))
    # Minibatch size in SAMPLES (whole sequences of n_steps). The serial
    # depth of one update is n_epochs * (n_envs*n_steps/batch) * n_steps
    # BPTT steps; at n_steps=1024 the 4096 default gives 4-sequence
    # minibatches (M=4 matmuls, 327,680 serial steps per iteration —
    # measured 370 s on hardware). 32768 -> 32-seq minibatches, 4
    # minibatches/epoch, ~8x less serial depth.
    batch = int(os.environ.get("PPO_BATCH", 4096 * (n_steps // 256)))
    log_dir = os.environ.get("PPO_LOG_DIR", "runs/ppo_tpu_3m_128")
    env_config = EnvConfig.training(rewards=RewardConfig.recurrent_ppo())
    state, result = train(
        algo="ppo",
        total_timesteps=3_000_000,
        n_envs=n_envs,
        use_curriculum=True,
        env_config=env_config,
        algo_config=RecurrentPPOConfig(n_steps=n_steps, batch_size=batch),
        curriculum_config=CurriculumConfig.ppo_dqn(),
        log_dir=log_dir,
        seed=0,
        iterations_per_chunk=1,
        program_split=2,
        checkpoint_interval=100_000,
        eval_interval=500_000,
        n_eval_episodes=16,
        resume=True,
    )
    print("DONE", result)
