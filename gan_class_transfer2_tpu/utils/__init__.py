from . import benchmark, checkpoint, profiler, tensorboard, tf_import

__all__ = ["benchmark", "checkpoint", "profiler", "tensorboard", "tf_import"]
