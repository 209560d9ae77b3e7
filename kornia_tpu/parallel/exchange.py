"""Ragged cross-shard observation exchange (all-to-all).

North-star component (BASELINE.json / SURVEY.md §5.7-5.8): in a
keyframe-sharded SLAM pipeline, observations are *produced* on the shard
that owns the observing keyframe but *consumed* (for Schur reduction) on
the shard that owns the 3D point. This module routes them:

  host plan (static topology)  →  one `all_to_all` collective per field
  inside `shard_map`           →  arrival order is deterministic
  (sorted by destination), padding rows carry weight 0.

The exchange is "ragged" in payload (unequal counts per shard pair) but
executed as a dense padded all_to_all — the TPU-native formulation of a
ragged exchange: buckets are padded to the max pairwise count so every
shape is static, and weight-0 rows make the padding self-masking in the
downstream BA accumulation.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kornia_tpu.parallel.mesh import OBS_AXIS


class ExchangePlan(NamedTuple):
    """Static routing plan built on host from the (static) topology.

    send buffers are laid out (D, D, B, ...) = (src, dst, bucket):
    row [s, d] holds the observations source shard s sends to dest d,
    padded to bucket size B with weight-0 rows.
    """

    obs_cam: jax.Array   # (D, D, B) int32
    obs_pt: jax.Array    # (D, D, B) int32 — point id LOCAL to the dest
    obs_uv: jax.Array    # (D, D, B, 2) f32
    obs_w: jax.Array     # (D, D, B) f32; 0 = padding
    bucket: int


def build_exchange_plan(
    obs_src_shard: np.ndarray, obs_cam: np.ndarray, obs_pt: np.ndarray,
    obs_uv: np.ndarray, n_devices: int, points_per_shard: int,
    obs_w: np.ndarray = None,
) -> ExchangePlan:
    """Group observations by (producer shard, owner shard of the point).

    obs_src_shard: (M,) shard that currently holds each observation
    (e.g. the keyframe owner). Point ownership is contiguous:
    dest = obs_pt // points_per_shard; local id = obs_pt % points_per_shard.
    """
    obs_src_shard = np.asarray(obs_src_shard, np.int64)
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int64)
    obs_uv = np.asarray(obs_uv, np.float32)
    m = obs_cam.shape[0]
    if obs_w is None:
        obs_w = np.ones(m, np.float32)
    dest = obs_pt // points_per_shard
    local_pt = (obs_pt % points_per_shard).astype(np.int32)

    counts = np.zeros((n_devices, n_devices), np.int64)
    for s, d in zip(obs_src_shard, dest):
        counts[s, d] += 1
    bucket = max(int(counts.max()), 1)

    cam_b = np.zeros((n_devices, n_devices, bucket), np.int32)
    pt_b = np.zeros((n_devices, n_devices, bucket), np.int32)
    uv_b = np.zeros((n_devices, n_devices, bucket, 2), np.float32)
    w_b = np.zeros((n_devices, n_devices, bucket), np.float32)
    fill = np.zeros((n_devices, n_devices), np.int64)
    for i in range(m):
        s, d = int(obs_src_shard[i]), int(dest[i])
        j = fill[s, d]
        cam_b[s, d, j] = obs_cam[i]
        pt_b[s, d, j] = local_pt[i]
        uv_b[s, d, j] = obs_uv[i]
        w_b[s, d, j] = obs_w[i]
        fill[s, d] += 1

    return ExchangePlan(
        obs_cam=jnp.asarray(cam_b), obs_pt=jnp.asarray(pt_b),
        obs_uv=jnp.asarray(uv_b), obs_w=jnp.asarray(w_b), bucket=bucket)


def exchange_in_spmd(cam, pt, uv, w, axis: str = OBS_AXIS):
    """The ragged all_to_all, for use INSIDE an enclosing ``shard_map``
    (e.g. fused into the distributed-BA program, ba_dist).

    Inputs are this shard's send rows as ``shard_map`` blocks
    (1, D, B, ...); returns the received rows (1, D·B, ...) —
    observations whose points this shard owns, concatenated over source
    shards in deterministic source order. Padding rows keep weight 0.
    """

    def a2a(x):
        y = jax.lax.all_to_all(
            x, axis, split_axis=1, concat_axis=0, tiled=False)
        # y: (D, 1, B, ...) — sources stacked on axis 0
        return y.reshape((-1,) + y.shape[3:])[None]

    return a2a(cam), a2a(pt), a2a(uv), a2a(w)


def exchange_observations(
    plan: ExchangePlan, mesh: Mesh
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run the all-to-all: every shard receives the observations whose
    points it owns.

    Returns (obs_cam, obs_pt_local, obs_uv, obs_w), each with leading
    shape (D, D·B) — receive buffers per shard, concatenated over source
    shards (deterministic source order).
    """

    def spmd(cam, pt, uv, w):
        return exchange_in_spmd(cam, pt, uv, w)

    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(P(OBS_AXIS), P(OBS_AXIS), P(OBS_AXIS), P(OBS_AXIS)),
        out_specs=(P(OBS_AXIS), P(OBS_AXIS), P(OBS_AXIS), P(OBS_AXIS)),
    )
    return jax.jit(fn)(plan.obs_cam, plan.obs_pt, plan.obs_uv, plan.obs_w)
