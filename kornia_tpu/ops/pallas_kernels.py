"""Hand-written Pallas TPU kernels for the fusion-limited hot paths.

The reference hand-fuses its hot pipelines into single CUDA kernels
(cuda/fusion.rs). On TPU, XLA's fusion already puts every dense op in
this library at the HBM-bandwidth envelope (PERF_NOTES.md), so these
kernels serve as env-switchable A/B variants (KORNIA_TPU_PREPROCESS /
KORNIA_TPU_FAST — the reference's §5.1 kernel-variant convention) and as
the explicit-control escape hatch:

* :func:`fused_preprocess_pallas` — resize+normalize+CHW as ONE Pallas
  program per channel: horizontal band-matmul accumulated tile-by-tile
  into a VMEM scratch (the full frame never exists in f32), then the
  vertical band-matmul with the normalization folded into the epilogue.
* :func:`fast_score_pallas` — FAST-9 ring test as a row-tiled VMEM
  stencil (halo via in-kernel dynamic slices of the resident frame).

Kernels run with ``interpret=True`` automatically on non-TPU backends so
the suite stays green on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kornia_tpu.ops.resize import _resize_matrix


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class StaticMask:
    """Identity-hashed numpy-array holder for static jit arguments.

    Static jit args must be hashable; hashing a megabyte mask per call
    would dominate dispatch, so callers create ONE wrapper per layout
    (e.g. via an lru_cache keyed on shapes) and the jit cache keys on
    object identity."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = np.asarray(arr, np.float32)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "mean", "std"))
def fused_preprocess_pallas(
    rgb_u8: jax.Array,
    out_h: int, out_w: int,
    mean: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    std: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jax.Array:
    """(H, W, 3) u8 → (3, out_h, out_w) f32 normalized, one Pallas call.

    Per grid step (= one channel):
      1. fori over 128-row source tiles: cast u8→f32 (1 MB live) and
         accumulate ``t[tile] = x_tile @ Wxᵀ`` into a (H, out_w) VMEM
         scratch — horizontal resize on the MXU.
      2. ``out = (Wy @ t) · s + b`` — vertical resize with the
         per-channel normalization folded into the epilogue.
    VMEM budget @1080p→640²: src u8 2.1 + Wx 4.9 + t 2.8 + Wy 2.8 +
    out 1.6 ≈ 14 MB.
    """
    h, w, _ = rgb_u8.shape
    row_t = 128
    h_pad = _round_up(h, row_t)

    wy = np.zeros((out_h, h_pad), np.float32)
    wy[:, :h] = _resize_matrix(h, out_h, "bilinear", False)
    wx_t = np.ascontiguousarray(
        _resize_matrix(w, out_w, "bilinear", False).T)  # (W, out_w)

    src = jnp.pad(rgb_u8, ((0, h_pad - h), (0, 0), (0, 0)))
    src = src.transpose(2, 0, 1)  # (3, H_pad, W)

    scale = jnp.asarray(
        [1.0 / (255.0 * s) for s in std], jnp.float32).reshape(3, 1, 1)
    bias = jnp.asarray(
        [-m / s for m, s in zip(mean, std)], jnp.float32).reshape(3, 1, 1)

    n_tiles = h_pad // row_t

    def kernel(src_ref, wy_ref, wx_ref, scale_ref, bias_ref, out_ref,
               t_scratch):
        def h_pass(i, _):
            # Mosaic has no direct u8→f32 cast; go through int32
            x = src_ref[0, pl.ds(i * row_t, row_t), :].astype(
                jnp.int32).astype(jnp.float32)
            t_scratch[pl.ds(i * row_t, row_t), :] = jnp.dot(
                x, wx_ref[...], preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_tiles, h_pass, 0)
        out = jnp.dot(wy_ref[...], t_scratch[...],
                      preferred_element_type=jnp.float32)
        out_ref[0] = out * scale_ref[0] + bias_ref[0]

    return pl.pallas_call(
        kernel,
        grid=(3,),
        in_specs=[
            pl.BlockSpec((1, h_pad, w), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h_pad), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_h, out_w), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, out_h, out_w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h_pad, out_w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * (h_pad * w * out_w + out_h * h_pad * out_w),
            bytes_accessed=h_pad * w * 3 + 3 * out_h * out_w * 4,
            transcendentals=0,
        ),
    )(src, jnp.asarray(wy), jnp.asarray(wx_t), scale, bias)


@functools.partial(jax.jit,
                   static_argnames=("threshold", "arc_length", "nms",
                                    "border_mask", "harris"))
def fast_score_pallas(gray: jax.Array, threshold: float = 10.0,
                      arc_length: int = 9, nms: bool = False,
                      border_mask: "StaticMask | None" = None,
                      harris: bool = False) -> jax.Array:
    """FAST corner response as a row-tiled Pallas stencil (A/B variant of
    features.fast.fast_score, same contract: score = max threshold
    keeping the corner, on pixels passing the contiguous-arc test).

    ``nms=True`` fuses the 3×3 non-maximum suppression into the same
    kernel: each row tile computes score for one extra halo row on each
    side and pools in VMEM — the separate NMS pass (an 8.3 MB score-map
    HBM round-trip, 0.073 ms at 1080p) disappears. Bit-identical to
    ``nms_maxpool(fast_score_pallas(...))`` (scores are ≥ 0 and zeroed
    on the 3-px border, so the out-of-image −inf vs 0 distinction of
    reduce_window's SAME padding never changes a survivor).

    ``border_mask`` (a :class:`StaticMask` over (H, W) 0/1 f32)
    replaces the global 3-px border kill with an arbitrary
    region-of-interest kill (cv2's ``detect(image, mask)`` analogue),
    applied to the score BEFORE the fused NMS exactly like the border
    kill it replaces.

    ``harris=True`` additionally emits the dense Harris response
    (k=0.04, block 5, σ=1.0 gaussian window, central-difference
    gradients — exactly features.responses.harris_response's ORB
    configuration) computed in the SAME pass from the VMEM-resident
    tile; returns ``(score_map, harris_map)``. Identical to the
    standalone harris_response at every pixel ≥3 from the border (the
    only pixels the ORB ranking reads — border pixels see zero-pad
    here vs edge/reflect there) up to FMA-association ULPs (measured
    ≤3e-6 relative); the separate XLA harris pass costs 0.13 ms
    across 8 pyramid levels at 480p, mostly materialized
    intermediates (PERF_NOTES round 5c).
    """
    from kornia_tpu.features.fast import _RING

    if harris:
        from kornia_tpu.ops.filters import gaussian_kernel1d

        hkern = np.asarray(gaussian_kernel1d(5, 1.0), np.float64)

    h, w = gray.shape
    ext = 1 if nms else 0
    halo = 3 + ext
    # sublane tiles are 8 rows: with the NMS halo the stencil computes
    # row_t + 2 rows, which pads to the next multiple of 8 — an 8-row
    # tile would DOUBLE the vector work (10 → 16 rows, measured 0.30 →
    # 0.44 ms at 1080p); 32-row tiles amortize the halo (34 → 40 rows,
    # 1.25×) and win overall by skipping the separate NMS pass
    row_t = 32 if nms else 8
    rt_ext = row_t + 2 * ext
    pad_w = _round_up(w + 2 * halo, 128)
    h_pad = _round_up(h, row_t)
    g = jnp.pad(gray.astype(jnp.float32),
                ((halo, halo + h_pad - h), (halo, pad_w - w - halo)))
    n_tiles = h_pad // row_t

    if border_mask is not None:
        # mask content at row offset `ext` so the per-tile slice start
        # i·row_t is sublane-aligned (Mosaic requires aligned starts)
        m = np.zeros((_round_up(h_pad + 2 * ext, 8), pad_w), np.float32)
        m[ext: ext + h, :w] = border_mask.arr
        m = jnp.asarray(m)

    def kernel(*refs):
        src_ref = refs[0]
        if harris:
            out_ref, hout_ref = refs[-2], refs[-1]
        else:
            out_ref = refs[-1]
        i = pl.program_id(0)

        if harris:
            # Harris from the same resident tile, replicating
            # responses.harris_response(grad="central") shift-add
            # accumulation ORDER exactly (bit-parity at pixels ≥3 from
            # the border; _conv_sep runs vertical taps ascending, then
            # horizontal, first term assigned then added)
            ftile = src_ref[pl.ds(i * row_t, rt_ext + 6), :]
            r_ = ftile[ext: ext + row_t + 6, :]     # img rows ±3
            gx_ = 0.5 * (r_[1:-1, 2:] - r_[1:-1, :-2])
            gy_ = 0.5 * (r_[2:, 1:-1] - r_[:-2, 1:-1])

            def conv5(p):
                acc = None
                for ii, kv in enumerate(hkern):
                    t_ = p[ii: ii + row_t] * jnp.float32(kv)
                    acc = t_ if acc is None else acc + t_
                out = None
                for jj, kv in enumerate(hkern):
                    t_ = acc[:, halo - 3 + jj: halo - 3 + jj + w] \
                        * jnp.float32(kv)
                    out = t_ if out is None else out + t_
                return out

            sxx = conv5(gx_ * gx_)
            syy = conv5(gy_ * gy_)
            sxy = conv5(gx_ * gy_)
            det_ = sxx * syy - sxy * sxy
            tr_ = sxx + syy
            hout_ref[...] = det_ - 0.04 * tr_ * tr_
        # image rows [i·row_t − ext − 3, i·row_t + row_t + ext + 3);
        # image row r lives at g row r + halo, so the slice starts at
        # g row i·row_t (8-aligned, as Mosaic vector loads require)
        # the ring/arc algebra runs in bf16 (packed, 2 values/lane):
        # u8 differences are integers in [-255, 255] — exact in bf16's
        # 8-bit mantissa, and min/max/negate preserve exactness, so the
        # f32 score cast back is BIT-identical (verified on-chip over
        # the full 1080p noise frame; 0.26 → 0.236 ms, PERF_NOTES 4d)
        tile = src_ref[pl.ds(i * row_t, rt_ext + 6), :].astype(
            jnp.bfloat16)
        center = tile[3: 3 + rt_ext, halo: halo + w]
        ring = jnp.stack([
            tile[3 + dy: 3 + dy + rt_ext, halo + dx: halo + dx + w]
            for dy, dx in _RING
        ])                                             # (16, rt_ext, w)
        diff = ring - center[None]

        # identical contract to features.fast.fast_score: cv2 V measure.
        # min/max over arc_length consecutive entries by log-step
        # doubling (idempotent ops ⇒ the final overlapping roll is
        # exact): 4 rolls instead of 8 at arc_length 9.
        def arc_reduce(v, op):
            acc = v
            c = 1
            while 2 * c <= arc_length:
                acc = op(acc, jnp.roll(acc, -c, axis=0))
                c *= 2
            if c < arc_length:
                acc = op(acc, jnp.roll(acc, -(arc_length - c), axis=0))
            return acc

        bright = jnp.max(arc_reduce(diff, jnp.minimum), axis=0)
        dark = -jnp.min(arc_reduce(diff, jnp.maximum), axis=0)
        # back to f32 for the compares (packed bf16 cmp is unsupported
        # by Mosaic on this target) and the output contract
        score = jnp.maximum(bright, dark).astype(jnp.float32)
        score = jnp.where(score > threshold, score, 0.0)
        if border_mask is not None:
            mtile = refs[1][pl.ds(i * row_t, rt_ext), :w]
            score = score * mtile
        else:
            # kill rows/cols whose ring touched the zero padding
            row0 = i * row_t - ext
            ys = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (rt_ext, w), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (rt_ext, w), 1)
            valid = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
            score = jnp.where(valid, score, 0.0)
        if not nms:
            out_ref[...] = score
            return
        # in-VMEM 3×3 max-pool (cols via ±1 lane shifts with −inf
        # fill, rows via the ext halo)
        ninf = jnp.full((rt_ext, 1), -jnp.inf, jnp.float32)
        m3c = jnp.maximum(
            score,
            jnp.maximum(
                jnp.concatenate([ninf, score[:, :-1]], axis=1),
                jnp.concatenate([score[:, 1:], ninf], axis=1)))
        pooled = jnp.maximum(m3c[:-2], jnp.maximum(m3c[1:-1], m3c[2:]))
        mid = score[1:-1]
        out_ref[...] = jnp.where(mid >= pooled, mid, 0.0)

    operands = (g,) if border_mask is None else (g, m)
    o_spec = pl.BlockSpec((row_t, w), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((h_pad, w), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in operands],
        out_specs=(o_spec, o_spec) if harris else o_spec,
        out_shape=(o_shape, o_shape) if harris else o_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(*operands)
    if harris:
        return out[0][:h], out[1][:h]
    return out[:h]


def lane_gather(src: jax.Array, idx: jax.Array) -> jax.Array:
    """out[i, j] = src[i, idx[i, j]] for (N, 128) operands.

    Mosaic's dynamic_gather handles exactly this shape class (single
    vreg along the gathered lane dimension) at vector rate — 6M elements
    in 0.07 ms vs ~40 ms for the XLA scalar-gather lowering. Rows are
    tiled in chunks of 512; N is padded internally.
    """
    n, l = src.shape
    if l != 128:
        raise ValueError(f"lane_gather needs 128 lanes, got {l}")
    tile = 512
    n_pad = _round_up(max(n, tile), tile)
    if n_pad != n:
        src = jnp.pad(src, ((0, n_pad - n), (0, 0)))
        idx = jnp.pad(idx, ((0, n_pad - n), (0, 0)))

    def kernel(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...],
                                           axis=1)

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[pl.BlockSpec((tile, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), src.dtype),
        interpret=_interpret(),
    )(src, jnp.clip(idx, 0, 127))
    return out[:n]

def extract_windows_pallas(img_f: jax.Array, xy_int: jax.Array,
                           win_h: int = 48, win_w: int = 128,
                           cy_off: int = 24, cx_off: int = 64) -> jax.Array:
    """(K, win_h, 128) keypoint windows, edge-replicated at borders.

    Same contract as features.orb._extract_windows, but the source frame
    stays VMEM-resident across the grid so each window is one in-kernel
    dynamic slice + lane roll instead of a per-window HBM DMA (XLA's
    vmapped dynamic_slice issues one ~1.5 µs DMA per window: 3.1 ms for
    2048 windows; this kernel is bandwidth-bound instead).

    Lane starts must be 128-aligned in Mosaic, so each window takes an
    aligned (win_h, 256) slice covering the target columns and rotates
    the residual offset out with one vector roll.
    """
    if win_w != 128:
        raise ValueError("extract_windows_pallas requires win_w == 128")
    pad = prepare_window_source(img_f, win_h, cy_off, cx_off)
    return extract_windows_prepared(pad, img_f.shape, xy_int, win_h)


def prepare_window_source(img_f: jax.Array, win_h: int = 48,
                          cy_off: int = 24, cx_off: int = 64) -> jax.Array:
    """Edge-replicate + align-pad a frame for window extraction.

    Split out of :func:`extract_windows_pallas` so callers that extract
    repeatedly from the SAME frame (the LK Newton loop re-extracts every
    iteration) pay the two pads once instead of per call."""
    h, w = img_f.shape
    pad = jnp.pad(img_f.astype(jnp.float32),
                  ((cy_off, win_h - cy_off), (cx_off, 128 - cx_off)),
                  mode="edge")
    w_pad = max(_round_up(w + 128, 128),
                ((w - 1) // 128) * 128 + 256)
    h_pad = max(h + win_h, ((h - 1) // 8) * 8 + win_h + 8)
    return jnp.pad(pad, ((0, h_pad - pad.shape[0]),
                         (0, w_pad - pad.shape[1])))


def extract_windows_prepared(pad: jax.Array, img_shape, xy_int: jax.Array,
                             win_h: int = 48) -> jax.Array:
    """Window extraction from a :func:`prepare_window_source` buffer."""
    h, w = img_shape
    k = xy_int.shape[0]
    grp = 8
    k_pad = _round_up(max(k, grp), grp)

    xy = jnp.clip(xy_int, 0, np.asarray([w - 1, h - 1], np.int32))
    if k_pad != k:
        xy = jnp.pad(xy, ((0, k_pad - k), (0, 0)))
    # two 1-D scalar operands: a 2-D (K, 2) SMEM array would be
    # lane-padded to (K, 128) and blow the 1 MB SMEM budget
    xs, ys = xy[:, 0], xy[:, 1]

    def kernel(xs_ref, ys_ref, src_ref, out_ref):
        t = pl.program_id(0)
        for i in range(grp):
            cx = xs_ref[t * grp + i]
            cy = ys_ref[t * grp + i]
            # both vector-load starts must be tile-aligned (8 sublanes /
            # 128 lanes); the residuals come out via two vector rolls
            cra = pl.multiple_of((cy // 8) * 8, 8)
            cla = pl.multiple_of((cx // 128) * 128, 128)
            win = src_ref[pl.ds(cra, win_h + 8), pl.ds(cla, 256)]
            # sublane (axis 0) dynamic roll with a NEGATIVE shift is
            # silently wrong on hardware (lane rolls take either sign) —
            # use the equivalent non-negative shift
            up = jax.lax.rem(win_h + 8 - (cy - cra), win_h + 8)
            rolled = pltpu.roll(pltpu.roll(win, cla - cx, 1), up, 0)
            out_ref[pl.ds(i * win_h, win_h), :] = rolled[:win_h, :128]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(k_pad // grp,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((grp * win_h, 128),
                                   lambda t, *_: (t, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad * win_h, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(xs, ys, pad)
    return out.reshape(k_pad, win_h, 128)[:k]


def extract_windows_prepared_paired(pad: jax.Array, img_shape,
                                    xy_int: jax.Array,
                                    win_h: int = 48) -> jax.Array:
    """Paired window extraction: TWO keypoints per 128-lane window.

    Keypoints 2i and 2i+1 share output row block i — each gets a
    64-lane half centered at lane 32 / 96. ORB's consumers never read
    beyond ±20 lanes of the center (rotated BRIEF taps reach ≤ ±20,
    the orientation patch ±15), so a 64-lane half preserves the
    128-lane window's values bit-exactly (the prepare_window_source
    buffer pads ±64, covering every ±32 half-slice), while the
    extraction writes HALF the bytes — the describe stage is
    bandwidth-bound on window traffic (PERF_NOTES round 5b).

    Returns (ceil(K/2), win_h, 128) f32.
    """
    h, w = img_shape
    k = xy_int.shape[0]
    k2 = -(-k // 2)
    grp = 8
    k2_pad = _round_up(max(k2, grp), grp)

    xy = jnp.clip(xy_int, 0, np.asarray([w - 1, h - 1], np.int32))
    if 2 * k2_pad != k:
        xy = jnp.pad(xy, ((0, 2 * k2_pad - k), (0, 0)))
    xs, ys = xy[:, 0], xy[:, 1]

    def kernel(xs_ref, ys_ref, src_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (win_h, 128), 1)
        t = pl.program_id(0)
        for i in range(grp):
            p = 2 * (t * grp + i)
            halves = []
            for s in range(2):
                cx = xs_ref[p + s]
                cy = ys_ref[p + s]
                cra = pl.multiple_of((cy // 8) * 8, 8)
                cla = pl.multiple_of((cx // 128) * 128, 128)
                win = src_ref[pl.ds(cra, win_h + 8), pl.ds(cla, 256)]
                up = jax.lax.rem(win_h + 8 - (cy - cra), win_h + 8)
                # roll the half's content to lanes [64s, 64s+64): the
                # 128-wide layout centers at lane 64; shifting by
                # −32 + 64·s re-centers at lane 32 / 96
                rolled = pltpu.roll(
                    pltpu.roll(win, cla - cx - 32 + 64 * s, 1), up, 0)
                halves.append(rolled[:win_h, :128])
            out_ref[pl.ds(i * win_h, win_h), :] = jnp.where(
                lane < 64, halves[0], halves[1])

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(k2_pad // grp,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((grp * win_h, 128),
                                   lambda t, *_: (t, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((k2_pad * win_h, 128),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(xs, ys, pad)
    return out.reshape(k2_pad, win_h, 128)[:k2]


def brief_sample_pallas(windows: jax.Array, rows: jax.Array,
                        cols: jax.Array) -> jax.Array:
    """Sample 512 rotated-BRIEF taps per keypoint from (K, 48, 128)
    windows, entirely VMEM-resident.

    The XLA formulation (features/orb.brief_from_windows fallback) runs
    4 lane_gathers + one-hot row reductions through HBM — ~400 MB of
    traffic at K=2048 (0.81 ms measured on v5e, the dominant ORB stage).
    Here each grid step holds a block of windows in VMEM and, per tap
    group of 128, does ONE in-register take_along_axis lane gather (the
    one gather shape Mosaic vectorizes: exactly-128-lane operands along
    lanes) followed by an iota==row one-hot multiply-sum — HBM traffic
    collapses to one read of the windows (50 MB).

    windows: (K, 48, 128) f32; rows/cols: (K, T) int32 window-space tap
    coordinates (clipped by the caller; T a multiple of 128 — 512 for
    the classic layout, 1024 for the paired two-keypoints-per-window
    layout). Returns (K, T) f32.
    """
    k, wh, ww = windows.shape
    if ww != 128 or wh % 8:
        raise ValueError(
            "brief_sample_pallas expects (K, 8m, 128) windows")
    t_taps = rows.shape[1]
    if t_taps % 128:
        raise ValueError("tap count must be a multiple of 128")
    grp = 8
    k_pad = _round_up(max(k, grp), grp)
    if k_pad != k:
        windows = jnp.pad(windows, ((0, k_pad - k), (0, 0), (0, 0)))
        rows = jnp.pad(rows, ((0, k_pad - k), (0, 0)))
        cols = jnp.pad(cols, ((0, k_pad - k), (0, 0)))

    def kernel(win_ref, row_ref, col_ref, out_ref):
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (wh, 128), 0)
        for i in range(grp):
            win = win_ref[i]                      # (48, 128)
            for g in range(t_taps // 128):
                cg = col_ref[i, g * 128:(g + 1) * 128]     # (128,)
                rg = row_ref[i, g * 128:(g + 1) * 128]     # (128,)
                idx = jnp.broadcast_to(cg[None, :], (wh, 128))
                gathered = jnp.take_along_axis(win, idx, axis=1)
                mask = iota_r == rg[None, :]
                out_ref[i, g * 128:(g + 1) * 128] = jnp.sum(
                    jnp.where(mask, gathered, 0.0), axis=0)

    out = pl.pallas_call(
        kernel,
        grid=(k_pad // grp,),
        in_specs=[pl.BlockSpec((grp, wh, ww), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((grp, t_taps), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((grp, t_taps), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((grp, t_taps), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, t_taps), jnp.float32),
        interpret=_interpret(),
    )(windows, rows, cols)
    return out[:k]
