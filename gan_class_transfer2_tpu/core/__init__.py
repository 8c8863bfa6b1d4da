from . import diffusion, schedule

__all__ = ["diffusion", "schedule"]
