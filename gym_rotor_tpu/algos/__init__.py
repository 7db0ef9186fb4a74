from . import common, ppo, regularizers, replay, sac, td3
from .replay import Batch, ReplayState

__all__ = ["Batch", "ReplayState", "common", "ppo", "regularizers",
           "replay", "sac", "td3"]
