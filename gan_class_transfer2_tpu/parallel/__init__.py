from . import (
    mesh,
    multihost,
    pipeline,
    planner,
    spatial,
    spatial_train,
    spatial_unet,
)

__all__ = [
    "mesh",
    "multihost",
    "pipeline",
    "planner",
    "spatial",
    "spatial_train",
    "spatial_unet",
]
