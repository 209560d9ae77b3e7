"""Data-parallel feature front-end over a device mesh.

SURVEY.md §2.14: the reference's rayon row-sharding maps to batch
sharding over the mesh. A batch of frames is placed with its leading
axis sharded (NamedSharding); the vmapped ORB program then runs one
frame per device slot with XLA inserting no collectives at all — the
embarrassingly-parallel half of the SLAM pipeline (detection) scales
linearly while the reduction half (ba_dist/pgo_dist) uses psum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kornia_tpu.features import orb
from kornia_tpu.parallel.mesh import OBS_AXIS


def detect_and_describe_batch(
    gray_batch: jax.Array,
    cfg: orb.OrbConfig = orb.OrbConfig(),
    mesh: Optional[Mesh] = None,
) -> orb.OrbFeatures:
    """ORB over a (B, H, W) u8 batch, sharded across the mesh.

    B must be divisible by the mesh size. Returns OrbFeatures with a
    leading batch axis (each field sharded the same way).
    """
    if mesh is not None:
        sharding = NamedSharding(mesh, P(OBS_AXIS))
        gray_batch = jax.device_put(gray_batch, sharding)

    fn = jax.jit(jax.vmap(lambda g: orb.orb_detect_and_describe(g, cfg)))
    return fn(gray_batch)


def match_batch(
    desc_a: jax.Array, desc_b: jax.Array,
    mask_a: jax.Array, mask_b: jax.Array,
    mesh: Optional[Mesh] = None,
    max_distance: int = 64, ratio: float = 0.8,
):
    """Batched descriptor matching over sharded frame pairs."""
    from kornia_tpu.features import matching

    if mesh is not None:
        sharding = NamedSharding(mesh, P(OBS_AXIS))
        desc_a = jax.device_put(desc_a, sharding)
        desc_b = jax.device_put(desc_b, sharding)

    fn = jax.jit(jax.vmap(
        lambda da, db, ma, mb: matching.match_descriptors(
            da, db, a_mask=ma, b_mask=mb,
            max_distance=max_distance, ratio=ratio)))
    return fn(desc_a, desc_b, mask_a, mask_b)
