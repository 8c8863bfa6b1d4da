from . import gan, gan_loop, loop, trainer

__all__ = ["gan", "gan_loop", "loop", "trainer"]
