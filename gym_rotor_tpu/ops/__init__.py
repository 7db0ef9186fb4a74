from . import so3

__all__ = ["so3"]
