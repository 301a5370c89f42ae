"""Camera model.

The reference stores row-major K/R/t plus a derived center c = -R^T t
(`Camera`, main.h:58-67; `ReadCamera`, APD.cpp:651-692).  Here a camera is a
pytree of jnp arrays so cameras batch/stack along a leading view axis and ride
through jit/shard_map untouched.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class Camera(struct.PyTreeNode):
    """Pinhole camera: x_cam = R @ X_world + t;  pixel = K @ x_cam (dehom.).

    Fields may carry an arbitrary leading batch shape (e.g. [V] for a stacked
    view set).
    """

    K: jnp.ndarray          # [..., 3, 3]
    R: jnp.ndarray          # [..., 3, 3]
    t: jnp.ndarray          # [..., 3]
    depth_min: jnp.ndarray  # [...]
    depth_max: jnp.ndarray  # [...]

    @property
    def c(self) -> jnp.ndarray:
        """Camera center in world coordinates: c = -R^T t."""
        return -jnp.einsum("...ji,...j->...i", self.R, self.t)

    @property
    def fx(self) -> jnp.ndarray:
        return self.K[..., 0, 0]

    @property
    def fy(self) -> jnp.ndarray:
        return self.K[..., 1, 1]

    @property
    def cx(self) -> jnp.ndarray:
        return self.K[..., 0, 2]

    @property
    def cy(self) -> jnp.ndarray:
        return self.K[..., 1, 2]

    @classmethod
    def create(cls, K, R, t, depth_min=0.0, depth_max=1.0) -> "Camera":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(K=f(K), R=f(R), t=f(t),
                   depth_min=f(depth_min), depth_max=f(depth_max))


def stack_cameras(cams: Sequence[Camera]) -> Camera:
    """Stack single cameras into a view-batched Camera ([V, ...] leading)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *cams)


def scale_camera(cam: Camera, scale_x: float, scale_y: float) -> Camera:
    """Rescale intrinsics for a resized image (reference APD.cpp:1139-1143).

    Only fx,cx (by scale_x) and fy,cy (by scale_y) change.
    """
    K = np.array(cam.K)
    K = K.copy()
    K[..., 0, 0] *= scale_x
    K[..., 0, 2] *= scale_x
    K[..., 1, 1] *= scale_y
    K[..., 1, 2] *= scale_y
    return cam.replace(K=jnp.asarray(K, jnp.float32))
