from .runner import SceneRunner, rescale_nearest

__all__ = ["SceneRunner", "rescale_nearest"]
