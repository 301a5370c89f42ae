from .camera import Camera, stack_cameras, scale_camera
from .transforms import (
    backproject_cam,
    cam_to_world,
    world_to_cam_point,
    project,
    depth_from_plane,
    dist_to_origin,
    view_ray,
    homography_terms,
    plane_to_world,
    plane_from_world,
    random_unit_normals,
)

__all__ = [
    "Camera",
    "stack_cameras",
    "scale_camera",
    "backproject_cam",
    "cam_to_world",
    "world_to_cam_point",
    "project",
    "depth_from_plane",
    "dist_to_origin",
    "view_ray",
    "homography_terms",
    "plane_to_world",
    "plane_from_world",
    "random_unit_normals",
]
