from . import groups, nn, reps, zoo

__all__ = ["groups", "nn", "reps", "zoo"]
