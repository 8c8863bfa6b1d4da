"""gan_class_transfer2_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
capabilities of relgukxilef/GAN-Class-Transfer2.

The reference is a single-file TF2/Keras DDPM-style diffusion trainer with
noise-space class/style-transfer editing (see SURVEY.md). This package is a
from-scratch framework with the same behavioral surface, designed TPU-first:
functional pytree models, one jit-compiled training step, `lax.scan` samplers,
sharding via `jax.sharding.Mesh`, and Pallas kernels on the hot elementwise
paths.
"""

from .config import Config, tiny_test_config

__version__ = "0.1.0"
__all__ = ["Config", "tiny_test_config", "__version__"]
