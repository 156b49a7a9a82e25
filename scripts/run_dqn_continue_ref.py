"""Continue training the reference's SHIPPED DQN checkpoint in this framework.

The reference's only hard performance artifacts are two 64-env DQN Monitor
runs averaging 789.5 / 788.7 episode reward — and their first-bucket
returns (~+1430 over the first 800 episodes) show they are CONTINUATIONS
of earlier training, not from-scratch runs (RESULTS.md). This script
reproduces that workflow like-for-like, across frameworks: import the
shipped `dqn_improved_final.zip` (torch -> flax,
rlenv_tpu/apps/sb3_import.py), warm-start DQNTrainer from it
(`train(init_params=...)`), and run the same 64-env curriculum config for
10M steps. The resulting Monitor CSV mean episode reward is directly
comparable to the reference's 789.5.

Epsilon starts at its annealed floor (0.05) rather than 1.0 — matching the
observed dynamics of the reference's checked-in continuation runs, whose
episode rewards are high from the very first bucket.

Run via scripts/run_dqn_continue_ref.sh.
"""

from rlenv_tpu.apps.sb3_import import load_sb3_policy
from rlenv_tpu.config import (CurriculumConfig, DQNConfig, EnvConfig,
                              RewardConfig)
from rlenv_tpu.train.trainer import train

REF_ZIP = "/root/reference/train_improved1/models/dqn_improved_final.zip"

if __name__ == "__main__":
    from rlenv_tpu.apps.sb3_import import load_sb3_dqn_optimizer_state
    from rlenv_tpu.train.trainer import make_trainer, make_venv

    env_config = EnvConfig.training(rewards=RewardConfig.dqn())
    runner = load_sb3_policy(REF_ZIP, "dqn", env_config)

    # hidden_sizes and learning rate from the checkpoint ITSELF: the
    # shipped model is the SB3 MlpPolicy default (256, 256) trained at lr
    # 5e-4, NOT the net_arch=[512,512,256] / lr 3e-4 the training-script
    # source claims (`trainingCode.py:227,244`) — the artifacts were
    # evidently produced by an earlier script revision. Continuing with
    # the archive's own Adam moments is essential: a fresh optimizer's
    # first full-lr steps collapse the converged policy (RESULTS.md).
    import io as _io
    import zipfile

    import torch
    with zipfile.ZipFile(REF_ZIP) as zf:
        archive_lr = float(torch.load(
            _io.BytesIO(zf.read("policy.optimizer.pth")),
            map_location="cpu", weights_only=True)["param_groups"][0]["lr"])
    cfg = DQNConfig(exploration_initial_eps=0.05,
                    hidden_sizes=runner.model.hidden_sizes,
                    learning_rate=archive_lr)
    donor = make_trainer(
        "dqn", make_venv(env_config, 64, use_curriculum=False), cfg,
        total_timesteps=10_000_000)
    opt_state, _ = load_sb3_dqn_optimizer_state(
        REF_ZIP, runner.params, donor.optimizer)

    state, result = train(
        algo="dqn",
        total_timesteps=10_000_000,
        n_envs=64,
        use_curriculum=True,
        env_config=env_config,
        algo_config=cfg,
        curriculum_config=CurriculumConfig.ppo_dqn(),
        log_dir="runs/dqn_tpu_continue_ref",
        seed=0,
        # Safe under retries: a restored Orbax checkpoint (resume=True)
        # overrides the warm-start params.
        init_params=runner.params,
        init_opt_state=opt_state,
        checkpoint_interval=500_000,
        resume=True,
    )
    print("DONE", result)
