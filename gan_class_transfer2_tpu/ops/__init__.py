from . import conv, image, init, kernels

__all__ = ["conv", "image", "init", "kernels"]
