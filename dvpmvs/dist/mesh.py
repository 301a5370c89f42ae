"""Device-mesh construction.

The reference has no parallelism layer at all (one process, one GPU,
``cudaSetDevice``, main.cpp:434).  The TPU framework's natural axes
(SURVEY §2.4): views across chips (embarrassingly parallel within a pass,
cross-view depth exchange between passes) and image tiles within a chip
(handled by XLA/Pallas).  The mesh here carries the ``views`` axis; a second
``tile`` axis can be added for spatial sharding of very large images.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "views") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
