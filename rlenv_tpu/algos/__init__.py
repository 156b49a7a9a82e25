from rlenv_tpu.algos.a2c import A2CTrainer
from rlenv_tpu.algos.dqn import DQNTrainer
from rlenv_tpu.algos.ppo_recurrent import RecurrentPPOTrainer
from rlenv_tpu.algos.mcts import MCTSPlanner

__all__ = ["A2CTrainer", "DQNTrainer", "RecurrentPPOTrainer", "MCTSPlanner"]
