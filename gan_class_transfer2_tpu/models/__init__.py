from . import conditional, discriminator, unet

__all__ = ["conditional", "discriminator", "unet"]
