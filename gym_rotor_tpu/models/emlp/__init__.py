from . import (diagnostics, general_nn, groups, nn, rep_algebra, reps, zoo)

__all__ = ["diagnostics", "general_nn", "groups", "nn", "rep_algebra",
           "reps", "zoo"]
