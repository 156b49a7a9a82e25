"""RecurrentPPO 3M, behavior-parity curriculum (`reference_actual`).

Companion to scripts/run_ppo_3m.py (documented-intent maze reuse). The
reference's CurriculumWrapper draws maps from the unseeded global `random`
module, so its agents ACTUALLY saw a fresh map every episode while the
curriculum bookkeeping still applied (SURVEY.md §3.5). This run reproduces
those dynamics — the apples-to-apples comparison for the reference's
"~84% avg exploration after 3M steps" comment (`plantos_env.py:85`).
"""

from rlenv_tpu.config import (CurriculumConfig, EnvConfig,
                              RecurrentPPOConfig, RewardConfig)
from rlenv_tpu.train.trainer import train

if __name__ == "__main__":
    env_config = EnvConfig.training(rewards=RewardConfig.recurrent_ppo())
    state, result = train(
        algo="ppo",
        total_timesteps=3_000_000,
        n_envs=64,
        use_curriculum=True,
        env_config=env_config,
        algo_config=RecurrentPPOConfig(n_steps=256, batch_size=4096),
        curriculum_config=CurriculumConfig.reference_actual(),
        log_dir="runs/ppo_tpu_3m_refactual",
        seed=0,
        iterations_per_chunk=1,
        program_split=2,
        checkpoint_interval=100_000,
        resume=True,
    )
    print("DONE", result)
