from . import diagnostics, groups, nn, rep_algebra, reps, zoo

__all__ = ["diagnostics", "groups", "nn", "rep_algebra", "reps", "zoo"]
