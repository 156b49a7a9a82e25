from rlenv_tpu.models.mlp import ActorCritic, QNetwork
from rlenv_tpu.models.recurrent import RecurrentActorCritic

__all__ = ["ActorCritic", "QNetwork", "RecurrentActorCritic"]
