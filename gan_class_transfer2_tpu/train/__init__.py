from . import conditional_gan, conditional_gan_loop, gan, gan_loop, loop, trainer

__all__ = ["conditional_gan", "conditional_gan_loop", "gan", "gan_loop", "loop", "trainer"]
