from . import mesh, multihost, pipeline, spatial, spatial_train, spatial_unet

__all__ = ["mesh", "multihost", "spatial", "spatial_train", "spatial_unet"]
