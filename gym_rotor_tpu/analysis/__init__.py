from . import draw_plot

__all__ = ["draw_plot"]
