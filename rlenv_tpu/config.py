"""Configuration tree for rlenv_tpu.

One dataclass-based config system replacing the reference's three ad-hoc
mechanisms (hard-coded constructor kwargs at `trainingCode.py:120-126`,
argparse CLIs at `A2C_training.py:426-440`, and interactive input() menus at
`trainingCode.py:461-522`).

All configs are frozen (hashable) so they can be closed over by jitted
functions or passed as static arguments without retracing hazards.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """Reward machine constants.

    Mirrors the constant block of the reference env
    (`/root/reference/gradio-app/plantos_env_new.py:67-95`): the active
    (DQN-tuned) set plus the two alternative sets the reference keeps as
    comments, exposed here as named presets.
    """

    goal: float = 20.0                  # watering a thirsty plant
    mistake: float = -10.0              # watering a hydrated plant
    invalid: float = -5.0               # collision / out-of-bounds move
    water_empty: float = -5.0           # watering empty ground
    step: float = -0.1                  # per-step penalty
    exploration: float = 10.0           # first visit to a cell
    revisit: float = -1.0               # re-entering a visited cell
    complete_exploration: float = 50.0  # one-time full-exploration bonus

    @classmethod
    def dqn(cls) -> "RewardConfig":
        """Active reward set (`plantos_env_new.py:77-85`)."""
        return cls()

    @classmethod
    def a2c(cls) -> "RewardConfig":
        """Commented A2C-tuned set (`plantos_env_new.py:67-75`)."""
        return cls(goal=200.0, mistake=-20.0, invalid=-11.0, water_empty=-20.0,
                   step=-0.1, exploration=10.0, revisit=-3.0,
                   complete_exploration=100.0)

    @classmethod
    def recurrent_ppo(cls) -> "RewardConfig":
        """Commented RecurrentPPO-tuned set (`plantos_env_new.py:87-95`)."""
        return cls(goal=50.0, mistake=-5.0, invalid=-2.0, water_empty=-5.0,
                   step=-0.05, exploration=5.0, revisit=-0.5,
                   complete_exploration=200.0)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """PlantOS environment parameters.

    Defaults match the reference constructor
    (`plantos_env_new.py:25-28`); :meth:`training` gives the config used by
    every reference trainer (`trainingCode.py:120-126`).
    """

    grid_size: int = 21
    num_plants: int = 8
    num_obstacles: int = 50
    lidar_range: int = 2
    lidar_channels: int = 10
    thirsty_plant_prob: float = 0.7
    max_steps: int = 1000
    map_generation_algo: str = "original"  # 'original' | 'maze'
    rewards: RewardConfig = dataclasses.field(default_factory=RewardConfig)

    # Local visit-map observation window (`plantos_env_new.py:50-51`).
    visit_map_size: int = 5

    def __post_init__(self):
        if self.grid_size < 5:
            raise ValueError("grid_size must be >= 5")
        if self.map_generation_algo not in ("original", "maze"):
            raise ValueError(f"unknown map algo {self.map_generation_algo!r}")
        # Worst-case free-cell check mirroring the reference's ValueError
        # (`plantos_env_new.py:392-396`): clusters of up to 3x3 cells.
        max_obstacle_cells = (self.num_obstacles // 3) * 9
        free_worst_case = self.grid_size * self.grid_size - max_obstacle_cells
        if free_worst_case < self.num_plants + 1:
            raise ValueError(
                f"Potentially not enough free positions "
                f"({free_worst_case} worst-case) to place {self.num_plants} "
                f"plants and 1 rover on a {self.grid_size}x{self.grid_size} grid."
            )

    @property
    def obs_dim(self) -> int:
        """Observation size: C*(1+4) LIDAR + 2 position + 5x5 visit map
        (`plantos_env_new.py:45-59`)."""
        return (self.lidar_channels * 5 + 2
                + self.visit_map_size * self.visit_map_size)

    @property
    def num_actions(self) -> int:
        """Discrete(5): 0=N, 1=E, 2=S, 3=W, 4=Water (`plantos_env_new.py:42-43`)."""
        return 5

    @classmethod
    def training(cls, **overrides) -> "EnvConfig":
        """The config used by all reference trainers
        (`trainingCode.py:120-126`, `A2C_training.py:206-212`): 107-dim obs."""
        kw = dict(grid_size=25, num_plants=10, num_obstacles=12,
                  lidar_range=6, lidar_channels=16)
        kw.update(overrides)
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class CurriculumConfig:
    """Progressive curriculum over maze difficulty.

    Two reference variants:
      * PPO/DQN (`trainingCode.py:24-42`): start 30, +5, <=50 episodes/maze,
        does NOT end episodes early.
      * A2C (`A2C_training.py:37-54`): start 40, +10, 3 episodes/maze,
        forces termination when the threshold is met mid-episode.
    """

    initial_threshold: float = 30.0
    max_threshold: float = 100.0
    threshold_increment: float = 5.0
    max_episodes_per_maze: int = 50
    terminate_on_threshold: bool = False

    # The reference's CurriculumWrapper INTENDS same-seed maze reuse, but
    # its map generator draws from the unseeded global `random` module, so
    # in reality every reset produces a fresh map while the curriculum
    # bookkeeping (thresholds, persistent visit counts) still applies
    # (SURVEY.md §3.5). False = the documented intent (true maze reuse,
    # deterministic); True = the reference's ACTUAL training dynamics
    # (fresh map each reset — easier returns, matches checked-in runs).
    fresh_map_each_reset: bool = False

    @classmethod
    def ppo_dqn(cls) -> "CurriculumConfig":
        return cls()

    @classmethod
    def a2c(cls) -> "CurriculumConfig":
        return cls(initial_threshold=40.0, threshold_increment=10.0,
                   max_episodes_per_maze=3, terminate_on_threshold=True)

    @classmethod
    def reference_actual(cls, **overrides) -> "CurriculumConfig":
        """Behavior-parity preset: what the reference actually did."""
        kw = dict(fresh_map_each_reset=True)
        kw.update(overrides)
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class A2CConfig:
    """A2C hyperparameters mirroring `A2C_training.py:229-247`."""

    learning_rate: float = 7e-4
    n_steps: int = 5
    gamma: float = 0.99
    gae_lambda: float = 1.0
    ent_coef: float = 0.01
    vf_coef: float = 0.25
    max_grad_norm: float = 0.5
    rms_prop_eps: float = 1e-5
    normalize_advantage: bool = True
    hidden_sizes: Tuple[int, ...] = (256, 256)


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """DQN hyperparameters mirroring `trainingCode.py:226-247`."""

    learning_rate: float = 3e-4
    buffer_size: int = 2_000_000
    learning_starts: int = 5_000
    batch_size: int = 64
    tau: float = 0.005
    gamma: float = 0.99
    train_freq: int = 4
    gradient_steps: int = 1
    target_update_interval: int = 5_000
    exploration_fraction: float = 0.7
    exploration_initial_eps: float = 1.0
    exploration_final_eps: float = 0.05
    max_grad_norm: float = 10.0
    hidden_sizes: Tuple[int, ...] = (512, 512, 256)
    # Opt-in improvements beyond SB3's vanilla DQN (defaults preserve the
    # reference's exact algorithm):
    # double_q — Double-DQN target: the online net selects the bootstrap
    # action, the target net evaluates it (reduces the max-operator
    # overestimation bias that destabilizes greedy exposure on this
    # dense-penalty reward set, RESULTS.md).
    double_q: bool = False
    # lr_decay_start_fraction < 1 linearly decays the learning rate from
    # that fraction of total timesteps down to lr * lr_final_scale at the
    # end — a late-training stabilizer (the reference's lr is constant).
    lr_decay_start_fraction: float = 1.0
    lr_final_scale: float = 0.1
    # n_step > 1 composes n-step returns AT SAMPLE TIME from the
    # slot-major ring (consecutive slots are consecutive time steps of
    # the same env lane), stopping at episode boundaries and at the
    # write head; termination zeroes the bootstrap, truncation keeps it.
    n_step: int = 1
    # td_target_clip > 0 clamps the TD target to within +-clip of the
    # online net's CURRENT estimate (target = Q(s,a) + clip(delta)).
    # MEASURED FINDING (round 5): with the Huber loss (knee 1.0, SB3's
    # default) any clip >= 1 is a mathematical no-op — Huber's gradient
    # already saturates to sign(delta) beyond the knee, so clipping the
    # target farther out changes the loss VALUE but never a gradient
    # (bitwise-identical 20M runs, RESULTS.md round-5 DQN notes;
    # pinned by tests). Only clip < 1 bites, acting as a per-sample
    # gradient downscale below the knee. 0 = off (SB3-exact).
    td_target_clip: float = 0.0


@dataclasses.dataclass(frozen=True)
class RecurrentPPOConfig:
    """Recurrent PPO hyperparameters mirroring `trainingCode.py:140-162`."""

    learning_rate: float = 3e-4
    n_steps: int = 1024
    batch_size: int = 128
    n_epochs: int = 10
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.02
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    lstm_hidden_size: int = 2562
    n_lstm_layers: int = 1
    enable_critic_lstm: bool = True
    hidden_sizes: Tuple[int, ...] = (128, 128)
    # Truncated-BPTT chunk length. 0 = backprop through the whole n_steps
    # rollout (one sequence per env — the round-2/3 behavior). L > 0 splits
    # each env's rollout into n_steps/L sequences whose initial LSTM
    # carries are recorded during collection; minibatches then draw from
    # the n_envs * n_steps/L sequence pool. This is sb3_contrib's actual
    # semantic (its batch_size=128 minibatches cut sequences into <=128
    # step sub-sequences with stored lstm_states,
    # `trainingCode.py:144-162`), and on TPU it turns the update's serial
    # depth of n_steps*n_envs/minibatch scan steps with M=1..4-row matmuls
    # into n_steps*n_envs/M steps with wide-M matmuls that actually fill
    # the MXU's 128-row tiles.
    bptt_chunk: int = 0
    # Compute dtype for the policy network ("float32" | "bfloat16").
    # Params/optimizer stay float32; see RecurrentActorCritic.dtype.
    compute_dtype: str = "float32"
    # lr_final_scale < 1 linearly anneals the learning rate from
    # learning_rate down to learning_rate * lr_final_scale across the
    # whole run (SB3's linear_schedule pattern; the reference uses a
    # constant) — a counter-lever for the late-run policy decay.
    lr_final_scale: float = 1.0
    # Rematerialize the BPTT step during the update's backward pass.
    # Required for whole-rollout BPTT (n_steps=1024 of the 2562-wide LSTM
    # would save ~GBs of gate activations); optional for short chunks,
    # where saving activations (~8 MB per step at M=128 sequences) is
    # cheaper than a second forward pass.
    remat: bool = True
    # With compute_dtype="bfloat16", cast the f32 params to bf16 ONCE per
    # minibatch, outside the BPTT scan. Flax otherwise re-casts the
    # captured f32 params inside every scan step, and XLA does not hoist
    # the ~220 MB conversion out of the loop — so each of the thousands of
    # serial BPTT steps re-reads the full f32 weights from HBM (measured:
    # 11.9 s -> 5.6 s per update at the flagship config, RESULTS.md round
    # 5). Trade-off: the scan's weight-gradient accumulation then also
    # runs in bf16 (f32 otherwise); flagship A/B quality evidence in
    # RESULTS.md. False restores f32 in-scan weights + f32 accumulation.
    cast_params_once: bool = True


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """MCTS planner parameters mirroring `mcts_custom_trainer.py:75-89,246-275`."""

    n_simulations: int = 50
    c_param: float = 1.414
    max_depth: int = 100
    rollout_heuristic_prob: float = 0.7   # `mcts_custom_trainer.py:180`
    completion_bonus: float = 500.0       # `mcts_custom_trainer.py:162-164`
    max_nodes: int = 256                  # fixed-size device tree capacity
    # With a trained rollout prior loaded (MCTSPlanner(rollout_policy=...)),
    # probability per rollout step of taking the prior's greedy action;
    # the remaining mass falls back to the reference's 70/30 draw.
    rollout_policy_prob: float = 0.8
    # AlphaZero-style leaf evaluation (opt-in, beyond the reference's
    # planner): with MCTSPlanner(leaf_value=...) set, the backed-up value
    # becomes (1-mix)*rollout_return + mix*V(leaf_obs) from a trained
    # critic. The round-4 frontier showed the tree policy — not rollout
    # quality — binds; a leaf value attacks that directly. mix=1.0 skips
    # rollouts entirely (pure value bootstrap; the +500 completion bonus
    # then applies only when the leaf itself is fully explored). 0 = off
    # (reference semantics, `mcts_custom_trainer.py:127-134`).
    leaf_value_mix: float = 0.0
    # AlphaZero-style PUCT selection (opt-in, fused search only): with
    # puct_c > 0 and MCTSPlanner(rollout_policy=...) set, child selection
    # scores Q_mean + puct_c * P(a) * sqrt(N_parent) / (1 + N_child)
    # instead of UCB1, where P = softmax(policy_scores / puct_prior_temp)
    # of the node's own observation (captured free at expansion — the
    # step kernel emits it). Round 4-5 measured the TREE policy as the
    # binding quality constraint; PUCT puts the trained prior there.
    # 0 = off (UCB1, reference semantics).
    puct_c: float = 0.0
    # Temperature for the prior softmax. DQN Q-VALUES (return-scale,
    # hundreds apart) need T >> 1 or the prior saturates to one-hot.
    puct_prior_temp: float = 50.0
