from . import benchmark, checkpoint, metrics, profiler, tensorboard, tf_import

__all__ = ["benchmark", "checkpoint", "metrics", "profiler", "tensorboard", "tf_import"]
