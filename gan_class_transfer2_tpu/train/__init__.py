from . import conditional_gan, gan, gan_loop, loop, trainer

__all__ = ["conditional_gan", "gan", "gan_loop", "loop", "trainer"]
