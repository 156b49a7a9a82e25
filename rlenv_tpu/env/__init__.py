from rlenv_tpu.env.state import EnvState
from rlenv_tpu.env.core import PlantOS

__all__ = ["EnvState", "PlantOS"]
