from .cameras import (
    get_camera_params,
    get_sphere_intersections,
    lift,
    load_K_Rt_from_P,
)

__all__ = [
    "get_camera_params",
    "get_sphere_intersections",
    "lift",
    "load_K_Rt_from_P",
]
