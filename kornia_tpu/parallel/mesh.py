"""Mesh construction helpers.

The SLAM backend uses a 1-D mesh over all chips with axis "obs" —
observations (and the points they reference) are sharded; poses and the
reduced camera system are replicated (they are small: 6P ≲ a few thousand).
Collectives ride ICI via `jax.lax.psum` inside `shard_map`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


OBS_AXIS = "obs"


def make_mesh(devices: Optional[Sequence] = None, axis: str = OBS_AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str = OBS_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))
