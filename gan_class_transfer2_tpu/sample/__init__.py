from . import sampler

__all__ = ["sampler"]
