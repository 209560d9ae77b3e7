"""Ragged cross-shard observation exchange.

North-star component (BASELINE.json / SURVEY.md §5.7-5.8): in a
keyframe-sharded SLAM pipeline, observations are *produced* on the shard
that owns the observing keyframe but *consumed* (for Schur reduction) on
the shard that owns the 3D point. This module routes them:

  host plan (static topology)  →  ONE collective round-trip inside
  `shard_map`                  →  arrival order is deterministic,
  padding rows carry weight 0.

All observation fields (cam id, local point id, uv, weight, optional
RGB-D depth + depth weight) are packed into a single f32 payload so the
exchange is ONE collective regardless of field count (integer ids < 2^24
are exact in f32).

Two wire layouts, chosen per-plan by payload size (the exchange is
"ragged" — unequal counts per shard pair — but must execute with static
shapes):

* ``a2a``: buckets padded to the max pairwise count B, one
  ``all_to_all`` of (D, B, C) per shard. Payload per shard = D·B·C.
  Optimal for near-uniform co-visibility.
* ``rounds``: D−1 ``ppermute`` rounds at shard offsets r = 1..D−1, each
  padded only to that offset's own max count B_r (offset 0 — self
  traffic — is a local slice, no collective). Payload per shard =
  Σ_r B_r · C. A single hot co-visibility pair (SURVEY.md §7 hard-part
  #1) inflates ONE round instead of all D² buckets: worst-case payload
  is O(hot + Σ small) instead of O(D · hot).

``mode="auto"`` picks whichever moves fewer bytes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kornia_tpu.parallel.mesh import OBS_AXIS

# payload column layout (f32): cam id, local point id, u, v, weight
# [, depth, depth weight]
_COLS_BASE = 5
_COLS_DEPTH = 7


class ExchangePlan(NamedTuple):
    """Static routing plan built on host from the (static) topology.

    ``payload`` is the packed send buffer:

    * a2a:    one array (D, D, B, C) — row [s, d] holds what source
      shard s sends to dest d, padded to bucket B with weight-0 rows;
    * rounds: a tuple of arrays, one per active offset in ``rounds``;
      array for offset r has shape (D, B_r, C) — row s holds what
      source s sends to dest (s + r) % D.

    Receive order per dest shard is deterministic: a2a concatenates
    source shards 0..D−1; rounds concatenates offsets in ``rounds``
    order (source (d − r) % D at offset r).
    """

    payload: Union[jax.Array, Tuple[jax.Array, ...]]
    mode: str                  # "a2a" | "rounds"
    rounds: Tuple[int, ...]    # active offsets (rounds mode; () for a2a)
    bucket: int                # max pairwise count (diagnostic)
    n_cols: int                # C: 5, or 7 with depth
    recv_len: int              # rows received per shard (L)

    @property
    def payload_bytes(self) -> int:
        """Total bytes moved through the interconnect (all shards)."""
        if self.mode == "a2a":
            return int(self.payload.size) * 4
        return int(sum(p.size for p in self.payload)) * 4


def _pack(cam, pt, uv, w, depth=None, depth_w=None):
    cols = [cam.astype(np.float32)[..., None],
            pt.astype(np.float32)[..., None],
            uv.astype(np.float32),
            w.astype(np.float32)[..., None]]
    if depth is not None:
        cols += [depth.astype(np.float32)[..., None],
                 depth_w.astype(np.float32)[..., None]]
    return np.concatenate(cols, axis=-1)


def unpack_payload(x):
    """(..., C) payload → (cam i32, pt i32, uv, w[, depth, depth_w])."""
    cam = x[..., 0].astype(jnp.int32)
    pt = x[..., 1].astype(jnp.int32)
    uv = x[..., 2:4]
    w = x[..., 4]
    if x.shape[-1] >= _COLS_DEPTH:
        return cam, pt, uv, w, x[..., 5], x[..., 6]
    return cam, pt, uv, w, None, None


def build_exchange_plan(
    obs_src_shard: np.ndarray, obs_cam: np.ndarray, obs_pt: np.ndarray,
    obs_uv: np.ndarray, n_devices: int, points_per_shard: int,
    obs_w: Optional[np.ndarray] = None,
    obs_depth: Optional[np.ndarray] = None,
    obs_depth_w: Optional[np.ndarray] = None,
    mode: str = "auto",
) -> ExchangePlan:
    """Group observations by (producer shard, owner shard of the point).

    obs_src_shard: (M,) shard that currently holds each observation
    (e.g. the keyframe owner). Point ownership is contiguous:
    dest = obs_pt // points_per_shard; local id = obs_pt % points_per_shard.

    Padding rows carry weight 0 and local point id points_per_shard − 1
    (keeping per-dest receive buffers sortable-by-point without a
    special case; zero weight makes them self-masking downstream).
    """
    obs_src_shard = np.asarray(obs_src_shard, np.int64)
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int64)
    obs_uv = np.asarray(obs_uv, np.float32)
    m = obs_cam.shape[0]
    if obs_w is None:
        obs_w = np.ones(m, np.float32)
    has_depth = obs_depth is not None
    if has_depth:
        obs_depth = np.asarray(obs_depth, np.float32)
        obs_depth_w = (np.ones(m, np.float32) if obs_depth_w is None
                       else np.asarray(obs_depth_w, np.float32))
    dest = obs_pt // points_per_shard
    local_pt = (obs_pt % points_per_shard).astype(np.int32)
    d = n_devices
    c = _COLS_DEPTH if has_depth else _COLS_BASE

    counts = np.zeros((d, d), np.int64)
    np.add.at(counts, (obs_src_shard, dest), 1)
    bucket = max(int(counts.max()), 1)

    # per-offset buckets: offset r carries pairs (s → (s+r) % d)
    src_ids = np.arange(d)
    b_r = np.array([counts[src_ids, (src_ids + r) % d].max()
                    for r in range(d)], np.int64)
    bytes_a2a = d * d * bucket * c
    bytes_rounds = d * int(b_r.sum()) * c
    if mode == "auto":
        # rounds pays D−1 collective latencies vs a2a's one; require a
        # real byte saving (skewed co-visibility) before taking them —
        # random near-uniform traffic lands within ~2× and stays a2a
        mode = "rounds" if bytes_rounds * 2 < bytes_a2a else "a2a"

    pad_pt = points_per_shard - 1

    def fill_pair_buffers(bucket_of_pair):
        """bucket_of_pair[s, d] → dict (s, d) → (len, rows) buffers."""
        bufs = {}
        for s in range(d):
            for t in range(d):
                b = bucket_of_pair[s, t]
                if b == 0:
                    continue
                row = np.zeros((b, c), np.float32)
                row[:, 1] = pad_pt
                bufs[(s, t)] = row
        fill = np.zeros((d, d), np.int64)
        packed = _pack(obs_cam, local_pt, obs_uv, obs_w,
                       obs_depth if has_depth else None,
                       obs_depth_w if has_depth else None)
        for i in range(m):
            s, t = int(obs_src_shard[i]), int(dest[i])
            bufs[(s, t)][fill[s, t]] = packed[i]
            fill[s, t] += 1
        return bufs

    if mode == "a2a":
        pair_bucket = np.full((d, d), bucket, np.int64)
        bufs = fill_pair_buffers(pair_bucket)
        payload = np.zeros((d, d, bucket, c), np.float32)
        payload[:, :, :, 1] = pad_pt
        for (s, t), rows in bufs.items():
            payload[s, t] = rows
        return ExchangePlan(
            payload=jnp.asarray(payload), mode="a2a", rounds=(),
            bucket=bucket, n_cols=c, recv_len=d * bucket)

    # rounds mode
    active = tuple(int(r) for r in range(d) if b_r[r] > 0)
    if not active:
        active = (0,)
        b_r[0] = 1
    pair_bucket = np.zeros((d, d), np.int64)
    for r in active:
        pair_bucket[src_ids, (src_ids + r) % d] = b_r[r]
    bufs = fill_pair_buffers(pair_bucket)
    payload = []
    for r in active:
        arr = np.zeros((d, int(b_r[r]), c), np.float32)
        arr[:, :, 1] = pad_pt
        for s in range(d):
            key = (s, (s + r) % d)
            if key in bufs:
                arr[s] = bufs[key]
        payload.append(jnp.asarray(arr))
    return ExchangePlan(
        payload=tuple(payload), mode="rounds", rounds=active,
        bucket=bucket, n_cols=c,
        recv_len=int(sum(b_r[r] for r in active)))


def host_receive_order(plan: ExchangePlan, dest: int, n_devices: int):
    """The (static, deterministic) receive buffer of shard ``dest`` as a
    host numpy array (L, C) — what ``exchange_payload_in_spmd`` will
    deliver. Lets callers pre-build sort permutations / segment engines
    on the post-exchange ordering (ba_dist does)."""
    if plan.mode == "a2a":
        buf = np.asarray(plan.payload)[:, dest]          # (D, B, C)
        return buf.reshape(-1, plan.n_cols)
    parts = []
    for arr, r in zip(plan.payload, plan.rounds):
        src = (dest - r) % n_devices
        parts.append(np.asarray(arr)[src])
    return np.concatenate(parts, axis=0)


def exchange_payload_in_spmd(payload, plan_mode: str,
                             rounds: Tuple[int, ...],
                             axis: str = OBS_AXIS) -> jax.Array:
    """Run the exchange INSIDE an enclosing ``shard_map``.

    ``payload``: this shard's send block — (1, D, B, C) for a2a, or a
    tuple of (1, B_r, C) blocks for rounds. Returns the received rows
    (1, L, C) in the deterministic order of :func:`host_receive_order`.
    """
    if plan_mode == "a2a":
        y = jax.lax.all_to_all(
            payload, axis, split_axis=1, concat_axis=0, tiled=False)
        # y: (D, 1, B, C) — sources stacked on axis 0
        return y.reshape(-1, y.shape[-1])[None]
    d = jax.lax.axis_size(axis)
    parts = []
    for arr, r in zip(payload, rounds):
        x = arr[0]  # (B_r, C)
        if r % d != 0:
            perm = [(j, (j + r) % d) for j in range(d)]
            x = jax.lax.ppermute(x, axis, perm=perm)
        parts.append(x)
    return jnp.concatenate(parts, axis=0)[None]


def exchange_observations(
    plan: ExchangePlan, mesh: Mesh
) -> Tuple[jax.Array, ...]:
    """Run the exchange standalone: every shard receives the
    observations whose points it owns.

    Returns (obs_cam, obs_pt_local, obs_uv, obs_w), each with leading
    shape (D, L) — receive buffers per shard in deterministic order
    (see :func:`host_receive_order`). With depth columns in the plan,
    two extra fields (obs_depth, obs_depth_w) are appended.
    """

    def spmd(*payload):
        p = payload[0] if plan.mode == "a2a" else payload
        return exchange_payload_in_spmd(p, plan.mode, plan.rounds)

    args = ((plan.payload,) if plan.mode == "a2a" else tuple(plan.payload))
    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=tuple(P(OBS_AXIS) for _ in args),
        out_specs=P(OBS_AXIS),
    )
    out = jax.jit(fn)(*args)
    fields = unpack_payload(out)
    return tuple(f for f in fields if f is not None)
