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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host JAX runtime (SURVEY.md §5.8: the
    jax.distributed coordination service the reference never had).

    On TPU pods the arguments auto-detect from the environment; pass
    them explicitly for CPU/GPU clusters. Idempotent: safe to call when
    already initialized (e.g. under a launcher that did it).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(axis: str = OBS_AXIS) -> Mesh:
    """1-D mesh over ALL processes' devices (call after
    initialize_distributed on every host). Device order follows
    jax.devices(), which interleaves hosts consistently across the pod."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a leading-axis-sharded global batch this process owns
    (for host-side data feeding with jax.make_array_from_process_local_data
    or device_put per shard)."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    start = jax.process_index() * per
    return slice(start, start + per)
