from .edges import roberts, canny, connected_components, edge_segment, hough_complete
from .mono import align_mono_depth, normals_from_depth, mono_prior_planes

__all__ = [
    "roberts", "canny", "connected_components", "edge_segment",
    "hough_complete", "align_mono_depth", "normals_from_depth",
    "mono_prior_planes",
]
