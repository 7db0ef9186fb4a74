from . import mlp
from .zoo import ppo_models, sac_models, td3_models

__all__ = ["mlp", "ppo_models", "sac_models", "td3_models"]
