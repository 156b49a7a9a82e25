"""Double-DQN variant of the 512-env 10M-step run.

Same configuration as scripts/run_dqn_10m_512.py (SB3-mirrored
hyperparameters, curriculum, DQN reward set) with the opt-in
``DQNConfig.double_q`` improvement: the online net selects the bootstrap
action and the target net evaluates it, countering the max-operator
overestimation that destabilizes vanilla DQN's greedy exposure on this
dense-penalty reward set (RESULTS.md). Run via
scripts/run_dqn_10m_512_double.sh.
"""

from rlenv_tpu.config import (CurriculumConfig, DQNConfig, EnvConfig,
                              RewardConfig)
from rlenv_tpu.train.trainer import train

if __name__ == "__main__":
    env_config = EnvConfig.training(rewards=RewardConfig.dqn())
    state, result = train(
        algo="dqn",
        total_timesteps=10_000_000,
        n_envs=512,
        use_curriculum=True,
        env_config=env_config,
        algo_config=DQNConfig(double_q=True),
        curriculum_config=CurriculumConfig.ppo_dqn(),
        log_dir="runs/dqn_tpu_10m_512env_double",
        seed=0,
        iterations_per_chunk=64,
        checkpoint_interval=1_000_000,
        resume=True,
    )
    print("DONE", result)
