from . import diagnostics, groups, nn, reps, zoo

__all__ = ["groups", "nn", "reps", "zoo"]
