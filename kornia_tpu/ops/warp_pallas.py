"""Exact gather-free warp/remap as a Pallas TPU kernel.

The reference's warp kernels (kornia-imgproc/src/warp/kernels.rs,
interpolation/remap.rs) are exact single-pass bilinear samplers; its GPU
warp_affine runs at 0.842 ms/1080p (BASELINE.md performance-audit). On
TPU a per-pixel gather runs at scalar rate (~60 ms/1080p — PERF_NOTES.md
"gather cliff"), so this module reformulates the exact sample with
vector-rate primitives only:

* The destination is processed in (8, 128) chunks. For a *smooth* map
  (undistortion, rectification, affine/perspective after normalization)
  one chunk's source rows span a small window and its source columns
  span < 254 lanes. Per chunk, a scalar-prefetched row/column base
  positions an (NSEL+8, 384) window of the VMEM-resident source; two
  rolls align it; the per-lane row is resolved by NSEL candidate-row
  selects and the per-lane column by Mosaic's one vectorized gather
  shape — ``take_along_axis`` on (8, 128) operands along lanes.
* Bilinear taps are gathered at their true integer positions and
  blended with their true fractional weights — interpolation happens
  exactly once, so the result matches the reference gather formulation
  to f32 roundoff (tests assert a tight corridor).
* General affine/perspective maps are made chunk-local by an *integer*
  vertical pre-shear ``T[r, i] = src[r + floor(kappa*i), i]`` built
  with a transpose sandwich: pixels move, none are interpolated, so
  exactness is preserved. The kernel undoes the shear arithmetically
  per tap (``floor(kappa*ix)`` in-register; no index tables).
* Maps whose chunk-local spread exceeds the static window capacity
  (extreme minification, perspective horizons, maps with tears) fall
  back to the scalar gather path via ``lax.cond`` — exact, just slow.

Kernels run with ``interpret=True`` on non-TPU backends so the CPU test
mesh exercises the same code paths.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Static geometry of the chunk kernel. Two tiers share one kernel body:
#   narrow: 256-lane fetch window, ONE 128-lane gather window per tap,
#           nsel=6 — serves maps whose per-chunk column span is <= 126
#           and row spread <= 4 (identity/undistort cores, rotations:
#           |dsx/dx| = |cos t| <= 1 keeps the span at ~|a|*127 < 126).
#   wide:   384-lane fetch window, two gather windows, caller nsel —
#           capacity 254 columns (strong minification, distortion
#           edges). The tier is picked per call by a capacity gate
#           (lax.cond); maps beyond wide capacity take the scalar
#           gather fallback as before.
_CW = 384          # wide-tier column window; capacity ~254 source cols
_CWN = 256         # narrow-tier column window; capacity 126 source cols
_NSEL_N = 6        # narrow-tier row candidates (row spread <= 4)
_PT = 8            # top padding rows of the padded source
_PL = 8            # left padding cols
_BH = 32           # destination macro-block rows  (4 sub-chunks)
_BW = 512          # destination macro-block lanes (4 sub-chunks)

# Source staging: the source stays in HBM (pl.ANY memory space) and the
# kernel double-buffer DMAs the _HBB source rows each destination
# row-block needs into a VMEM scratch, overlapped with the previous
# block's compute. This replaced two earlier structures that both lost
# to it on the v5e: (a) the whole source as one VMEM input block — a
# 42 MB block (1080p after the rot30 pre-shear) costs ~0.17 ms of
# un-overlapped fill and caps image size at VMEM; (b) host-side banding
# (5 pallas calls over dynamic-sliced bands) — ~0.2 ms of slice copies
# plus a pipeline drain every 32 grid steps. DMA staging fetches only
# the rows actually sampled (a sheared source is mostly never touched),
# has no size cliff, and hides the fetch behind compute.
_HBB = 256         # staged source rows per destination row-block


def _make_kernel(nsel: int, n_cc: int, with_shear: bool,
                 h_orig: int, w_orig: int, fill: float,
                 cw: int = _CW, nwin: int = 2,
                 map_form: str = "data", nearest: bool = False,
                 border: bool = False, use_box: bool = False):
    """Kernel body: resolve one (8, 128) destination chunk.

    Scalar-prefetch operands (1-D, per flattened chunk g = r*n_cc+cc):
      rb_ref: [0:G] 8-aligned row base, [G:2G] sub-8 residual delta.
      cb_ref: [0:G] 128-aligned col base, [G:2G] sub-128 lane residual
        (cu = true col base - aligned base). The kernel lane-rolls the
        fetched window left by cu so per-lane columns land in [0, 254]
        and only TWO 128-lane gather windows are needed instead of
        three — the dominant per-chunk cost is the take_along_axis
        count (Mosaic vectorizes it only at exactly 128 lanes).
      kap_ref: (2,) i32: pre-shear slope as round(kappa*2^20) (read
        when with_shear) and shear row offset s0.
      bb_ref: (2*n_rb,) i32: per-destination-row-block source staging
        base (8-aligned) and the high-half staging flags. Row bases in
        rb_ref arrive relative to bb of their row-block; iy0 (from the
        map) is global, so candidate matching compares against
        ``rbase + bb_ref[r]``.
      mc_ref (mapless forms only): (13,) i32 f32-bit-patterns:
        [c1x c2x c0x  c1y c2y c0y  p1 p2 p0  xlo xhi ylo yhi] — the
        kernel computes the map in-register from the destination iota
        (``map_form="affine"``: sx = c1x*gx + c2x*gy + c0x;
        ``"persp"``: divided by p1*gx + p2*gy + p0), so no map arrays
        ever exist in HBM. The wrapper derives fetch bases from the 4
        chunk corners of the same f32 expressions — exact for affine
        (Mosaic emits bit-identical mul/add, verified; f32 rounding is
        monotone so chunk extrema sit at corners), margined by ±1 for
        perspective (division monotonicity is only ulp-approximate).

    The source input lives in HBM (pl.ANY): at each row-block the
    kernel DMAs rows [bb, bb + _HBB) of the current channel into a
    double-buffered VMEM scratch, prefetching the next row-block's
    rows while the current one computes. Only sampled rows ever cross
    HBM->VMEM (a pre-sheared source is mostly untouched), there is no
    source-size VMEM cliff, and the fetch hides behind compute.

    Row resolution exploits that real maps advance ~1 source row per
    destination row: the chunk base is defined on ``iy0 - dest_row``
    so candidate v for destination sublane r is source row
    ``rbase + v + r`` — i.e. candidate arrays are the *static diagonal
    slices* ``blk[v:v+8]``, and nsel only needs to cover the chunk's
    deviation from unit row rate (identity/undistort: ~0; rotations
    after the pre-shear: |1/a - 1|*7 + floor jitter).

    The grid runs over (_BH, _BW) destination macro-blocks processed as
    (8, 128) sub-chunks in an unrolled loop (fewer, bigger pipeline
    steps). The sub-8 row residual ``delta`` is removed by one dynamic
    sublane roll per sub-chunk so the candidate count stays at nsel.
    """
    slice_r = _round_up(nsel + 16, 8)
    n_sub_r = _BH // 8
    n_sub_c = _BW // 128

    def kernel(*refs):
        if map_form == "data":
            (rb_ref, cb_ref, kap_ref, bb_ref, mx_ref, my_ref,
             src_ref, out_ref, scratch, sems) = refs
            mc_ref = None
        else:
            (rb_ref, cb_ref, kap_ref, bb_ref, mc_ref,
             src_ref, out_ref, scratch, sems) = refs
        c = pl.program_id(0)
        r = pl.program_id(1)
        cc = pl.program_id(2)
        n_rb = pl.num_programs(1)
        n_t = pl.num_programs(0) * n_rb
        n_g = n_rb * n_sub_r * n_cc

        if map_form != "data":
            def mcf(i):
                return jax.lax.bitcast_convert_type(
                    jnp.full((8, 128), mc_ref[i], jnp.int32),
                    jnp.float32)
            mcs = [mcf(i) for i in range(13)]

        # --- double-buffered source staging (HBM -> VMEM scratch) ---
        # The low half (_HBB/2 rows) is always staged; the high half
        # only when the row-block's span needs it (bb_ref[n_rb + rr]
        # flag) — typical maps span ~56 rows, so staging all of _HBB
        # unconditionally would double-to-quadruple the DMA traffic.
        t = c * n_rb + r
        slot = jax.lax.rem(t, 2)
        hbb2 = _HBB // 2

        def band_dma(tt, sl, hi):
            ch_i = tt // n_rb
            rr = jax.lax.rem(tt, n_rb)
            base = pl.multiple_of(bb_ref[rr], 8) + hi * hbb2
            return pltpu.make_async_copy(
                src_ref.at[ch_i, pl.ds(base, hbb2), :],
                scratch.at[sl, pl.ds(hi * hbb2, hbb2), :],
                sems.at[sl, hi])

        def start_band(tt, sl):
            band_dma(tt, sl, 0).start()

            @pl.when(bb_ref[n_rb + jax.lax.rem(tt, n_rb)] > 0)
            def _():
                band_dma(tt, sl, 1).start()

        @pl.when((cc == 0) & (t == 0))
        def _():
            start_band(0, 0)

        @pl.when(cc == 0)
        def _():
            @pl.when(t + 1 < n_t)
            def _():
                start_band(t + 1, jax.lax.rem(t + 1, 2))
            band_dma(t, slot, 0).wait()

            @pl.when(bb_ref[n_rb + jax.lax.rem(t, n_rb)] > 0)
            def _():
                band_dma(t, slot, 1).wait()

        for si in range(n_sub_r):
            for sj in range(n_sub_c):
                g = ((r * n_sub_r + si) * n_cc + cc * n_sub_c + sj)
                box_ok = None
                if map_form == "data":
                    sx = mx_ref[0, si * 8:(si + 1) * 8,
                                sj * 128:(sj + 1) * 128]
                    sy = my_ref[0, si * 8:(si + 1) * 8,
                                sj * 128:(sj + 1) * 128]
                else:
                    # in-register map evaluation from the destination
                    # pixel iota — no map arrays in HBM at all
                    gyf = (jax.lax.broadcasted_iota(
                        jnp.int32, (8, 128), 0)
                        + (r * _BH + si * 8)).astype(jnp.float32)
                    gxf = (jax.lax.broadcasted_iota(
                        jnp.int32, (8, 128), 1)
                        + (cc * _BW + sj * 128)).astype(jnp.float32)
                    sx = mcs[0] * gxf + mcs[1] * gyf + mcs[2]
                    sy = mcs[3] * gxf + mcs[4] * gyf + mcs[5]
                    if map_form == "persp":
                        den = mcs[6] * gxf + mcs[7] * gyf + mcs[8]
                        den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
                        sx = sx / den
                        sy = sy / den
                    if use_box:
                        box_ok = ((sx >= mcs[9] - 1.0)
                                  & (sx <= mcs[10] + 1.0)
                                  & (sy >= mcs[11] - 1.0)
                                  & (sy <= mcs[12] + 1.0))
                    if border:
                        sx = jnp.clip(sx, mcs[9], mcs[10])
                        sy = jnp.clip(sy, mcs[11], mcs[12])
                    if nearest:
                        sx = jnp.floor(sx + 0.5)
                        sy = jnp.floor(sy + 0.5)
                    sx = jnp.clip(sx, -1.5, w_orig + 0.5)
                    sy = jnp.clip(sy, -1.5, h_orig + 0.5)
                # maps arrive UNOFFSET (original source coords): the
                # fraction must be taken before the pad offset is added
                # or it loses a mantissa bit at power-of-2 crossings
                # (observed 1.5e-5 deviations vs the gather reference).
                ix0f = jnp.floor(sx)
                iy0f = jnp.floor(sy)
                fx = sx - ix0f
                fy = sy - iy0f
                ix0 = ix0f.astype(jnp.int32) + _PL
                iy0 = iy0f.astype(jnp.int32) + _PT

                rb8 = pl.multiple_of(rb_ref[g], 8)
                delta = rb_ref[n_g + g]
                # global row of candidate v=0 at sublane 0: the staging
                # base re-globalizes the scratch-relative fetch base
                rbase = rb8 + delta + bb_ref[r]
                cb128 = pl.multiple_of(cb_ref[g], 128)
                cu = cb_ref[n_g + g]

                blk = scratch[slot, pl.ds(rb8, slice_r),
                              pl.ds(cb128, cw)]
                # roll rows up by delta so candidate 0 sits at the true
                # chunk base. Dynamic rolls need NON-NEGATIVE shifts on
                # hardware (negative shifts are silently wrong on v5e
                # on BOTH axes; interpret mode accepts either sign).
                blk = pltpu.roll(
                    blk, jax.lax.rem(slice_r - delta, slice_r), 0)
                # roll lanes left by the sub-128 column residual so the
                # chunk's true column base sits at lane 0: per-lane
                # columns then fit the gather windows (capacity is
                # cw - 130 wide-tier / 126 narrow-tier)
                blk = pltpu.roll(blk, jax.lax.rem(cw - cu, cw), 1)

                # per-tap source row relative to the chunk diagonal
                # (rbase + sublane)
                riota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                if with_shear:
                    # kappa rides prefetch as round(kappa * 2^20): the
                    # quantized value is exactly representable in f32,
                    # so kernel and wrapper compute identical floors
                    kap = (kap_ref[0].astype(jnp.float32)
                           * jnp.float32(2.0 ** -20))
                    s0 = kap_ref[1]
                    sl = jnp.floor(kap * (ix0 - _PL).astype(jnp.float32))
                    sr = jnp.floor(
                        kap * (ix0 + 1 - _PL).astype(jnp.float32))
                    rel_l = (iy0 + sl.astype(jnp.int32) - s0
                             - rbase - riota)
                    rel_r = (iy0 + sr.astype(jnp.int32) - s0
                             - rbase - riota)
                else:
                    rel_l = iy0 - rbase - riota
                    rel_r = rel_l

                relx = ix0 - (cb128 + cu)
                relx1 = relx + 1
                rx = jnp.clip(relx, 0, 127)
                rx1w = jnp.clip(relx1 - 128, 0, 127)
                if nwin == 2:
                    rxw = jnp.clip(relx - 128, 0, 127)
                    in_k0 = relx < 128
                    in_k1 = relx1 < 128
                else:
                    # narrow tier: span <= 127 (covers exact-unit-rate
                    # maps: 128 lanes at rate 1 span exactly 127); only
                    # the right tap of the last lane can index 128 —
                    # served by a broadcast of window column 128
                    rx1 = jnp.clip(relx1, 0, 127)
                    r1_over = relx1 >= 128

                zero = jnp.zeros((8, 128), jnp.float32)
                tl = zero
                tr = zero
                bl = zero
                br = zero
                for v in range(nsel):
                    cand = blk[v: v + 8, :]    # row r = src rbase+v+r
                    w0 = cand[:, 0:128]
                    if nwin == 2:
                        w1 = cand[:, 128:256]
                        gl = jnp.where(
                            in_k0,
                            jnp.take_along_axis(w0, rx, axis=1),
                            jnp.take_along_axis(w1, rxw, axis=1))
                        gr = jnp.where(
                            in_k1,
                            jnp.take_along_axis(
                                w0, jnp.clip(relx1, 0, 127), axis=1),
                            jnp.take_along_axis(w1, rx1w, axis=1))
                    else:
                        gl = jnp.take_along_axis(w0, rx, axis=1)
                        gr = jnp.where(
                            r1_over, cand[:, 128:129],
                            jnp.take_along_axis(w0, rx1, axis=1))
                    tl = jnp.where(rel_l == v, gl, tl)
                    bl = jnp.where(rel_l == v - 1, gl, bl)
                    tr = jnp.where(rel_r == v, gr, tr)
                    br = jnp.where(rel_r == v - 1, gr, br)

                # cv2 BORDER_CONSTANT: each out-of-bounds tap
                # contributes fill * weight (bounds in ORIGINAL image
                # coords; maps are pre-offset by (_PT, _PL)).
                vy0 = (iy0 >= _PT) & (iy0 <= _PT + h_orig - 1)
                vy1 = (iy0 >= _PT - 1) & (iy0 <= _PT + h_orig - 2)
                vx0 = (ix0 >= _PL) & (ix0 <= _PL + w_orig - 1)
                vx1 = (ix0 >= _PL - 1) & (ix0 <= _PL + w_orig - 2)
                if box_ok is not None:
                    # mapless equivalent of the data path's push-to
                    # -1e6 content-box masking: samples beyond the
                    # rotated content box (+1 px blend rim) read fill
                    vy0 = vy0 & box_ok
                    vy1 = vy1 & box_ok
                    vx0 = vx0 & box_ok
                    vx1 = vx1 & box_ok
                fv = jnp.float32(fill)
                tl = jnp.where(vy0 & vx0, tl, fv)
                tr = jnp.where(vy0 & vx1, tr, fv)
                bl = jnp.where(vy1 & vx0, bl, fv)
                br = jnp.where(vy1 & vx1, br, fv)

                out_ref[0, si * 8:(si + 1) * 8,
                        sj * 128:(sj + 1) * 128] = (
                    (1.0 - fy) * ((1.0 - fx) * tl + fx * tr)
                    + fy * ((1.0 - fx) * bl + fx * br))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nsel", "with_shear", "h_orig", "w_orig", "fill",
                     "cw", "nwin", "hc", "wc", "map_form", "nearest",
                     "border", "use_box"))
def _remap_chunks(src_p: jax.Array, mxc, myc,
                  rb8: jax.Array, cb128: jax.Array,
                  kappa: jax.Array, bb: jax.Array,
                  nsel: int, with_shear: bool,
                  h_orig: int, w_orig: int, fill: float,
                  cw: int = _CW, nwin: int = 2,
                  hc: int = 0, wc: int = 0,
                  map_form: str = "data", nearest: bool = False,
                  border: bool = False, use_box: bool = False,
                  mc: Optional[jax.Array] = None) -> jax.Array:
    """Core chunk resolver; returns (C, Hc, Wc) f32. The source stays
    in HBM and is staged per destination row-block by the kernel's
    double-buffered DMA (see _make_kernel docstring). ``map_form=
    "data"`` reads per-pixel maps mxc/myc; the mapless forms compute
    the map in-register from ``mc`` coefficients (mxc/myc unused)."""
    ch, hp, wp = src_p.shape
    if map_form == "data":
        hc, wc = mxc.shape
    n_cc = wc // 128

    kernel = _make_kernel(nsel, n_cc, with_shear, h_orig, w_orig, fill,
                          cw=cw, nwin=nwin, map_form=map_form,
                          nearest=nearest, border=border,
                          use_box=use_box)

    map_specs = [
        pl.BlockSpec((1, _BH, _BW), lambda c, r, cc, *_: (0, r, cc)),
        pl.BlockSpec((1, _BH, _BW), lambda c, r, cc, *_: (0, r, cc)),
    ] if map_form == "data" else []

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4 if map_form == "data" else 5,
            grid=(ch, hc // _BH, wc // _BW),
            in_specs=map_specs + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, _BH, _BW),
                                   lambda c, r, cc, *_: (c, r, cc)),
            scratch_shapes=[
                pltpu.VMEM((2, _HBB, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ch, hc, wc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )
    pref = [rb8.astype(jnp.int32), cb128.astype(jnp.int32),
            kappa.astype(jnp.int32).reshape(2), bb.astype(jnp.int32)]
    if map_form == "data":
        return call(*pref, mxc[None], myc[None], src_p)
    return call(*pref, mc.astype(jnp.int32).reshape(13), src_p)


def _chunk_reduce(a: jax.Array, op) -> jax.Array:
    hc, wc = a.shape
    return op(a.reshape(hc // 8, 8, wc // 128, 128), axis=(1, 3))


def _prepare_and_run(src: jax.Array, map_x: jax.Array, map_y: jax.Array,
                     nsel: int, fill: float,
                     kappa: Optional[jax.Array] = None,
                     orig_hw: Optional[Tuple[int, int]] = None):
    """Pad source + maps, compute per-chunk bases and the capacity flag,
    run the chunk kernel. Returns (out (C, Ho, Wo) f32, ok flag).

    src: (C, H, W) f32 content — already pre-sheared when ``kappa`` is
    given, in which case ``orig_hw`` carries the ORIGINAL (unsheared)
    dims used for bounds masking. Maps are in original source coords.
    """
    ch, h_arr, w_arr = src.shape
    h, w = orig_hw if orig_hw is not None else (h_arr, w_arr)
    ho, wo = map_x.shape
    slice_r = _round_up(nsel + 16, 8)

    hc = _round_up(ho, _BH)
    wc = _round_up(wo, _BW)
    # pad with an out-of-bounds sentinel: pad lanes must read as
    # invalid or they would drag the per-chunk window spread
    mx = jnp.pad(map_x.astype(jnp.float32),
                 ((0, hc - ho), (0, wc - wo)), constant_values=-1e6)
    my = jnp.pad(map_y.astype(jnp.float32),
                 ((0, hc - ho), (0, wc - wo)), constant_values=-1e6)

    # Window bases and the capacity check only consider lanes with at
    # least one in-bounds tap: fully-out-of-bounds lanes output `fill`
    # whatever window is fetched, so letting them constrain the window
    # (e.g. a clamped flat border region breaking the unit-row-rate
    # diagonal) would force needless fallbacks.
    lane_valid = (mx >= -1.0) & (mx <= w + 0.0) & \
                 (my >= -1.0) & (my <= h + 0.0)
    # Clamp so floor() stays in int32 range even for wild maps; only
    # invalid lanes are affected.
    mxc = jnp.clip(mx, -1.5, w + 0.5)
    myc = jnp.clip(my, -1.5, h + 0.5)

    # integer parts carry the pad offset; fractions are taken from the
    # unoffset maps inside the kernel (precision: see kernel comment)
    ix0 = jnp.floor(mxc) + _PL
    iy0 = jnp.floor(myc) + _PT
    if kappa is not None:
        kap_v = kappa[0] * jnp.float32(2.0 ** -20)
        s0_v = kappa[1]
        sh0 = jnp.floor(kap_v * jnp.floor(mxc)) - s0_v
        sh1 = jnp.floor(kap_v * (jnp.floor(mxc) + 1.0)) - s0_v
        ry_lo = iy0 + jnp.minimum(sh0, sh1)
        ry_hi = iy0 + jnp.maximum(sh0, sh1)
    else:
        ry_lo = iy0
        ry_hi = iy0

    big = jnp.float32(1e9)
    # base is defined on (row - dest_sublane): candidate v for dest
    # sublane r is source row rbase + v + r (kernel diagonal slices)
    riota = (jnp.arange(hc, dtype=jnp.float32) % 8)[:, None]
    rmin = _chunk_reduce(jnp.where(lane_valid, ry_lo - riota, big),
                         jnp.min)
    rmax = _chunk_reduce(jnp.where(lane_valid, ry_hi - riota, -big),
                         jnp.max)
    cmin = _chunk_reduce(jnp.where(lane_valid, ix0, big), jnp.min)
    cmax = _chunk_reduce(jnp.where(lane_valid, ix0, -big), jnp.max)

    return _run_from_bounds(
        src, ho, wo, h, w, rmin, rmax, cmin, cmax,
        parked=(rmin > 1e8), nsel=nsel, fill=fill, kappa=kappa,
        data=(mxc, myc))


def _run_from_bounds(src, ho, wo, h, w, rmin, rmax, cmin, cmax,
                     parked, nsel, fill, kappa,
                     data=None, mc=None, map_form: str = "data",
                     nearest: bool = False, border: bool = False,
                     use_box: bool = False, nsel_narrow: int = _NSEL_N):
    """Shared execution tail: pad the source, derive per-chunk fetch
    bases + staging schedule + capacity gates from the chunk bounds,
    pick the kernel tier, run. Returns (out (C, Ho, Wo) f32, ok).

    ``nsel_narrow`` widens the narrow tier's candidate count for
    callers whose bounds carry analytic slack (the mapless sheared
    path: corner bounds are ±(2+2|κ|) wider than the data-exact
    bounds, so rotations need one extra candidate to stay narrow)."""
    ch, h_arr, w_arr = src.shape
    slice_r = _round_up(nsel + 16, 8)
    hc = _round_up(ho, _BH)
    wc = _round_up(wo, _BW)

    ok_wide = (jnp.all(rmax - rmin <= nsel - 2)
               & jnp.all(cmax - cmin <= _CW - 130))
    # narrow tier: single gather window + fewer row candidates. Span
    # 127 (not 126) so exact-unit-rate maps qualify: 128 lanes at rate
    # 1 span exactly 127; the lane-128 right tap is special-cased in
    # the kernel. Narrow capacity is a subset of wide capacity.
    ok_narrow = (jnp.all(rmax - rmin <= nsel_narrow - 2)
                 & jnp.all(cmax - cmin <= 127))

    hp = max(_round_up(h_arr + _PT + slice_r + 8, 8), _HBB)
    wp = _round_up(w_arr + _PL + _CW + 128, 128)
    src_p = jnp.pad(src.astype(jnp.float32),
                    ((0, 0), (_PT, hp - h_arr - _PT),
                     (_PL, wp - w_arr - _PL)))

    # all-invalid chunks park at base 0 (their output is fill anyway);
    # letting them clip to the array bottom would wreck the staging
    # spans
    rbase = jnp.where(parked, 0,
                      jnp.clip(rmin, 0, hp - slice_r)).astype(jnp.int32)
    rb8 = (rbase // 8) * 8
    delta = rbase - rb8
    cmin_i = cmin.astype(jnp.int32)
    if kappa is not None:
        kap2 = kappa.astype(jnp.int32)
    else:
        kap2 = jnp.zeros((2,), jnp.int32)
    with_shear = kappa is not None

    # per-row-block staging base + DMA capacity gate: each destination
    # row-block's chunks must fit one _HBB-row staged window. Parked
    # chunks are pinned to the block base so they cannot stretch it.
    n_rb = hc // _BH
    big_i = jnp.int32(2 ** 30)
    rb8_blk = rb8.reshape(n_rb, _BH // 8, -1)
    park_blk = parked.reshape(n_rb, _BH // 8, -1)
    bb = jnp.min(jnp.where(park_blk, big_i, rb8_blk), axis=(1, 2))
    bb = (jnp.clip(bb, 0, hp - _HBB) // 8) * 8
    rmax_b = jnp.max(jnp.where(park_blk, 0, rb8_blk), axis=(1, 2))
    ok_dma = jnp.all(rmax_b - bb + slice_r <= _HBB)
    # high-half staging flag: only row-blocks spanning past _HBB/2
    # rows pay the second DMA
    need_hi = (rmax_b - bb + slice_r > _HBB // 2).astype(jnp.int32)
    bb_packed = jnp.concatenate([bb, need_hi])
    bb_of_chunk = jnp.repeat(bb, _BH // 8)[:, None]
    rb8_rel = jnp.clip(jnp.where(parked, bb_of_chunk, rb8)
                       - bb_of_chunk, 0, _HBB - slice_r)
    rb_packed = jnp.concatenate(
        [rb8_rel.reshape(-1), delta.reshape(-1)])

    mxc, myc = data if data is not None else (None, None)

    def run_tier(cw, nwin, nsel_t):
        cbase = jnp.clip(cmin_i, 0, wp - cw)
        cb128 = (cbase // 128) * 128
        cu = cbase - cb128
        cb_packed = jnp.concatenate(
            [cb128.reshape(-1), cu.reshape(-1)])
        return _remap_chunks(src_p, mxc, myc, rb_packed,
                             cb_packed, kap2, bb_packed,
                             nsel=nsel_t, with_shear=with_shear,
                             h_orig=h, w_orig=w, fill=fill,
                             cw=cw, nwin=nwin, hc=hc, wc=wc,
                             map_form=map_form, nearest=nearest,
                             border=border, use_box=use_box, mc=mc)

    out = jax.lax.cond(
        ok_narrow,
        lambda _: run_tier(_CWN, 1, nsel_narrow),
        lambda _: run_tier(_CW, 2, nsel),
        operand=None)
    return out[:, :ho, :wo], ok_wide & ok_dma


def _mapless_bounds(coefs, box, hc, wc, h, w, map_form, nearest,
                    border):
    """Per-chunk fetch bounds from the 4 corners of every (8,128)
    destination chunk — tiny (2,2,hc/8,wc/128) arrays instead of
    full-resolution maps. Sound because every op in the kernel's map
    pipeline (affine eval, clip, floor) is monotone per destination
    axis, so per-axis extrema sit at corners; f32 rounding preserves
    monotonicity. Two refinements:

    * Bounds are taken over UNCLIPPED values (only a ±1e9 int-safety
      clamp). The kernel's [-1.5, w+0.5] positioning clamp only moves
      OUT-OF-IMAGE samples, and those lanes mask themselves to fill —
      they never need window coverage. In-image lanes are unclipped,
      so the unclipped corner bounds cover them exactly, and edge
      chunks never inflate the capacity gate (the clamp's flat regions
      broke the (iy0 - riota) corner-monotonicity AND blew the spread
      to >= 7). Border-mode clipping, by contrast, affects IN-image
      values, so it is applied in bounds too — its flat edge regions
      genuinely exceed the row capacity and fall back, exactly like
      the data-map path.
    * Perspective division is only ulp-monotone, so it gets a ±1
      margin and a denominator sign-uniformity gate (den is affine:
      same corner sign = same sign on the whole chunk).

    Returns (rmin, rmax, cmin, cmax, ok_extra)."""
    i8 = jnp.arange(hc // 8, dtype=jnp.float32) * 8
    j128 = jnp.arange(wc // 128, dtype=jnp.float32) * 128
    gy = jnp.stack([i8, i8 + 7])[:, None, :, None]
    gx = jnp.stack([j128, j128 + 127])[None, :, None, :]
    c = coefs
    sx = c[0] * gx + c[1] * gy + c[2]
    sy = c[3] * gx + c[4] * gy + c[5]
    ok_extra = jnp.asarray(True)
    margin = 0
    if map_form == "persp":
        den = c[6] * gx + c[7] * gy + c[8]
        dmin = jnp.min(den, axis=(0, 1))
        dmax = jnp.max(den, axis=(0, 1))
        ok_extra = jnp.all((dmin > 1e-6) | (dmax < -1e-6))
        den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
        sx = sx / den
        sy = sy / den
        margin = 1
    if border:
        sx = jnp.clip(sx, box[0], box[1])
        sy = jnp.clip(sy, box[2], box[3])
    if nearest:
        sx = jnp.floor(sx + 0.5)
        sy = jnp.floor(sy + 0.5)
    ix0 = jnp.floor(jnp.clip(sx, -1e9, 1e9)) + _PL
    iy0 = jnp.floor(jnp.clip(sy, -1e9, 1e9)) + _PT

    riota_c = jnp.asarray([0.0, 7.0], jnp.float32)[:, None, None, None]
    rmin = jnp.min(iy0 - riota_c, axis=(0, 1)) - margin
    rmax = jnp.max(iy0 - riota_c, axis=(0, 1)) + margin
    cmin = jnp.min(ix0, axis=(0, 1)) - margin
    cmax = jnp.max(ix0, axis=(0, 1)) + margin
    # fully-out-of-image chunks (whole-chunk violation of one image
    # bound shows at the extreme corner, monotone per axis) are parked
    # so they cannot drag fetch/staging bases; their output is fill.
    m = jnp.float32(margin)
    parked = (
        (jnp.max(sy, axis=(0, 1)) < -1.0 - m)
        | (jnp.min(sy, axis=(0, 1)) > h + 1.0 + m)
        | (jnp.max(sx, axis=(0, 1)) < -1.0 - m)
        | (jnp.min(sx, axis=(0, 1)) > w + 1.0 + m))
    return rmin, rmax, cmin, cmax, ok_extra, parked


def _mapless_bounds_sheared(coefs, box, kappa, s0, hc, wc, h, w,
                            nearest, border):
    """Chunk-corner fetch bounds for the PRE-SHEARED affine kernel —
    the piece that previously forced full data maps onto the sheared
    path (round-2b note #4).

    The kernel's per-lane row metric is
        q = floor(sy') + floor(κ·floor(sx')) − s0      (and the right
    tap's floor(κ·(floor(sx')+1)), which is q or q+1 for |κ| ≤ 1).
    q itself mixes two floor staircases with cancelling slopes, so its
    chunk extrema do NOT sit at corners — but the affine combination
        u = sy' + κ·sx'
    does (u is affine in the destination pixel, and by construction of
    κ = −d'/a' its x-gradient is ~0, so u is almost constant along a
    chunk row). Sandwiching the floors gives, for either sign of κ,
        q ∈ [u − |κ| − 2,  u + |κ|] − s0,
    i.e. corner bounds on u widened by the ±(2 + 2|κ|) analytic slack.
    That slack costs ONE extra narrow-tier candidate (nsel_narrow 7)
    versus the data-exact bounds — and deletes the two full-resolution
    maps, their pads, and four full-res chunk reductions that
    dominated the sheared path's cost (0.27 ms at 1080p).

    Returns (rmin, rmax, cmin, cmax, parked) in the same convention as
    :func:`_mapless_bounds` (row bounds are on q + _PT − riota).
    """
    i8 = jnp.arange(hc // 8, dtype=jnp.float32) * 8
    j128 = jnp.arange(wc // 128, dtype=jnp.float32) * 128
    gy = jnp.stack([i8, i8 + 7])[:, None, :, None]
    gx = jnp.stack([j128, j128 + 127])[None, :, None, :]
    c = coefs
    sx = c[0] * gx + c[1] * gy + c[2]
    sy = c[3] * gx + c[4] * gy + c[5]
    if border:
        sx = jnp.clip(sx, box[0], box[1])
        sy = jnp.clip(sy, box[2], box[3])
    if nearest:
        sx = jnp.floor(sx + 0.5)
        sy = jnp.floor(sy + 0.5)
    sx = jnp.clip(sx, -1e9, 1e9)
    sy = jnp.clip(sy, -1e9, 1e9)
    u = sy + kappa * sx
    akap = jnp.abs(kappa)

    riota_c = jnp.asarray([0.0, 7.0], jnp.float32)[:, None, None, None]
    # ±1/16 absorbs f32 evaluation noise of u vs the kernel's exact
    # floor chain at synthetic exact-integer crossings
    rmin = (jnp.min(u - riota_c, axis=(0, 1))
            - akap - 2.0625 + _PT - s0)
    rmax = (jnp.max(u - riota_c, axis=(0, 1))
            + akap + 0.0625 + _PT - s0)
    cmin = jnp.min(jnp.floor(sx), axis=(0, 1)) + _PL
    cmax = jnp.max(jnp.floor(sx), axis=(0, 1)) + _PL
    parked = (
        (jnp.max(sy, axis=(0, 1)) < box[2] - 1.0)
        | (jnp.min(sy, axis=(0, 1)) > box[3] + 1.0)
        | (jnp.max(sx, axis=(0, 1)) < box[0] - 1.0)
        | (jnp.min(sx, axis=(0, 1)) > box[1] + 1.0))
    return rmin, rmax, cmin, cmax, parked


def _prepare_and_run_mapless(src, coefs, box, out_hw, nsel, fill,
                             map_form: str = "affine",
                             nearest: bool = False,
                             border: bool = False):
    """Mapless twin of _prepare_and_run for DIRECT (un-sheared) warps:
    the map is an affine or projective function of the destination
    pixel described by ``coefs`` (9,) f32 — the kernel evaluates it
    in-register and the fetch bounds come from chunk-corner
    evaluation, so no (Ho, Wo) map arrays are ever materialized (at
    1080p the map pipeline — two 8.9 MB maps, pads, validity masks,
    and four full-resolution chunk reductions — dominated the warp's
    cost). The pre-sheared path keeps the data-map route: its row
    metric mixes two floor staircases with cancelling slopes, which
    corner evaluation cannot bound tightly."""
    ch, h, w = src.shape
    ho, wo = out_hw
    hc = _round_up(ho, _BH)
    wc = _round_up(wo, _BW)

    rmin, rmax, cmin, cmax, ok_extra, parked = _mapless_bounds(
        coefs, box, hc, wc, h, w, map_form, nearest, border)

    mc = jax.lax.bitcast_convert_type(
        jnp.concatenate([coefs.astype(jnp.float32),
                         box.astype(jnp.float32)]), jnp.int32)
    out, ok = _run_from_bounds(
        src, ho, wo, h, w, rmin, rmax, cmin, cmax,
        parked=parked, nsel=nsel, fill=fill, kappa=None,
        mc=mc, map_form=map_form, nearest=nearest, border=border,
        use_box=False)
    return out, ok & ok_extra


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def _finalize(out: jax.Array, dtype) -> jax.Array:
    if dtype == jnp.uint8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.astype(dtype)


def _to_chw(img: jax.Array) -> Tuple[jax.Array, bool, object]:
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    return jnp.moveaxis(x, -1, 0).astype(jnp.float32), squeeze, img.dtype


def _from_chw(out: jax.Array, squeeze: bool, dtype) -> jax.Array:
    out = jnp.moveaxis(out, 0, -1)
    out = _finalize(out, dtype)
    return out[..., 0] if squeeze else out


def remap_exact(img: jax.Array, map_x: jax.Array, map_y: jax.Array,
                mode: str = "bilinear", padding_mode: str = "zeros",
                fill_value: float = 0.0, nsel: int = 8,
                fallback: bool = True) -> jax.Array:
    """cv2.remap for smooth maps at vector rate; exact bilinear.

    Maps whose per-(8,128)-chunk row spread exceeds ``nsel - 2`` or
    column span exceeds 254 fall back to the scalar-gather path inside
    a ``lax.cond`` (same values, ~60 ms at 1080p). Undistortion and
    rectification maps always take the fast path.

    Reference: interpolation/remap.rs; calibration/distortion.rs:135.
    """
    if mode == "nearest":
        map_x = jnp.floor(map_x + 0.5)
        map_y = jnp.floor(map_y + 0.5)
    elif mode != "bilinear":
        raise ValueError(f"remap_exact supports bilinear/nearest, "
                         f"got {mode}")
    chw, squeeze, dtype = _to_chw(img)
    h, w = chw.shape[1:]
    if padding_mode == "border":
        map_x = jnp.clip(map_x, 0.0, w - 1.0)
        map_y = jnp.clip(map_y, 0.0, h - 1.0)

    out_fast, ok = _prepare_and_run(chw, map_x, map_y, nsel=nsel,
                                    fill=float(fill_value))

    if fallback:
        def slow(_):
            from kornia_tpu.ops.interpolation import grid_sample
            res = grid_sample(jnp.moveaxis(chw, 0, -1), map_x, map_y,
                              mode="bilinear", padding_mode=padding_mode,
                              fill_value=fill_value)
            return jnp.moveaxis(res, -1, 0)

        out = jax.lax.cond(ok, lambda _: out_fast, slow, operand=None)
    else:
        # scan/compile-size escape hatch: co-compiling the scalar-gather
        # branch inside a lax.scan can SIGSEGV the Mosaic pipeline;
        # callers that know their maps fit the capacity skip it
        out = out_fast
    return _from_chw(out, squeeze, dtype)


# ---------------------------------------------------------------------------
# general affine / perspective: rot90 + integer pre-shear + chunk kernel
# ---------------------------------------------------------------------------

_KMAX = 1.05       # |kappa| bound of the exact path (rot90-normalized)


def _lane_shift_pallas(srcT: jax.Array, shifts: jax.Array,
                       out_w: int) -> jax.Array:
    """out[r, j] = srcT[r, j - shifts[r]] (zero outside), vectorized.

    The integer pre-shear in transposed space: row r of srcT (= source
    column r) is placed at lane offset shifts[r] >= 0. Per 8-row tile:
    one aligned dynamic write + one dynamic roll + <=16 static-shift
    selects (shifts vary by <= ceil(KMAX*8)+1 within a tile).
    """
    rr, cc = srcT.shape
    r8 = _round_up(rr, 8)
    nsel = 16
    in_w = _round_up(cc + 384, 128)
    pad_in = jnp.pad(srcT, ((0, r8 - rr), (0, in_w - cc)))
    seg_w = cc + 256
    out_wp = _round_up(out_w + seg_w - cc, 128)
    sh = jnp.clip(shifts.astype(jnp.int32), 0, out_wp - seg_w)
    if r8 != rr:
        # edge-pad: zero-padding would drag the per-tile min shift down
        # and push real rows past the 16-select residual window
        sh = jnp.pad(sh, (0, r8 - rr), mode="edge")
    base = jnp.min(sh.reshape(-1, 8), axis=1)
    q128 = (base // 128) * 128
    u = base - q128                                     # [0, 128)
    resid = sh.reshape(-1, 8) - base[:, None]           # [0, nsel)
    n_tiles = r8 // 8

    def kernel(q_ref, u_ref, resid_ref, src_ref, out_ref):
        t = pl.program_id(0)
        out_ref[...] = jnp.zeros((8, out_wp), jnp.float32)
        tile = src_ref[...]
        # roll right by u+nsel; the >=256 zero pad lanes at the end wrap
        # to the front, so lanes [0, u+nsel) are zeros as required.
        # (dynamic rolls need non-negative shifts on hardware.)
        rolled = pltpu.roll(tile, u_ref[t] + nsel, 1)
        acc = jnp.zeros((8, seg_w), jnp.float32)
        rv = jnp.stack([resid_ref[t * 8 + i] for i in range(8)])[:, None]
        for c in range(nsel):
            seg = rolled[:, nsel - c: nsel - c + seg_w]
            acc = acc + jnp.where(rv == c, seg, 0.0)
        q = pl.multiple_of(q_ref[t], 128)
        out_ref[:, pl.ds(q, seg_w)] = acc

    resid_flat = resid.reshape(-1)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((8, in_w), lambda t, *_: (t, 0))],
            out_specs=pl.BlockSpec((8, out_wp), lambda t, *_: (t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r8, out_wp), jnp.float32),
        interpret=_interpret(),
    )(q128.astype(jnp.int32), u.astype(jnp.int32),
      resid_flat.astype(jnp.int32), pad_in)[:rr, :out_w]




def _warp_exact_common(img: jax.Array, coefs: jax.Array,
                       dsize: Tuple[int, int],
                       mode: str, padding_mode: str, fill_value: float,
                       nsel: int, fallback: bool = True,
                       form: str = "affine") -> jax.Array:
    """Shared path for warp_affine/warp_perspective via the exact chunk
    kernel: rot90-normalize the inverse map, integer-pre-shear the
    source so every destination chunk becomes row-local, run the
    MAPLESS chunk kernel (the dest->src map is the (9,) ``coefs``
    vector [c1x c2x c0x  c1y c2y c0y  p1 p2 p0], evaluated in-register
    — no map arrays exist), and fall back to the scalar gather for
    maps outside the static capacity (|kappa| > KMAX, extreme scales,
    horizons).
    """
    new_h, new_w = dsize
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    h, w, nch = x.shape
    in_dtype = img.dtype
    s = max(h, w)
    coefs = coefs.astype(jnp.float32)

    def eval_pt(gxp, gyp):
        sxp_ = coefs[0] * gxp + coefs[1] * gyp + coefs[2]
        syp_ = coefs[3] * gxp + coefs[4] * gyp + coefs[5]
        if form == "persp":
            den = coefs[6] * gxp + coefs[7] * gyp + coefs[8]
            den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
            sxp_ = sxp_ / den
            syp_ = syp_ / den
        return sxp_, syp_

    # pick the rot90 branch with the largest positive row rate e' and
    # derive the pre-shear slope kappa = -d'/a' from central samples
    ycf = jnp.float32((new_h - 1) // 2)
    xcf = jnp.float32((new_w - 1) // 2)
    sx_c, sy_c = eval_pt(xcf, ycf)
    sx_x, sy_x = eval_pt(xcf + 8.0, ycf)
    sx_y, sy_y = eval_pt(xcf, ycf + 8.0)
    a0 = (sx_x - sx_c) / 8.0    # dsx/dx
    d0 = (sy_x - sy_c) / 8.0    # dsy/dx
    b0 = (sx_y - sx_c) / 8.0    # dsx/dy
    e0 = (sy_y - sy_c) / 8.0    # dsy/dy
    e_cands = jnp.stack([e0, -b0, -e0, b0])
    k = jnp.argmax(e_cands).astype(jnp.int32)

    nearest = mode == "nearest"
    border = padding_mode == "border"

    # ---- direct fast path: near-axis-aligned maps skip the rot90 /
    # square canvas / pre-shear pipeline entirely (the common
    # scale/translate case)
    box_d = jnp.asarray([0.0, w - 1.0, 0.0, h - 1.0], jnp.float32)
    hc_d = _round_up(new_h, _BH)
    wc_d = _round_up(new_w, _BW)
    rmin_d, rmax_d, cmin_d, cmax_d, okx_d, _pk = _mapless_bounds(
        coefs, box_d, hc_d, wc_d, h, w, form, nearest, border)
    ok_direct = (jnp.all(rmax_d - rmin_d <= nsel - 2)
                 & jnp.all(cmax_d - cmin_d <= _CW - 130) & okx_d)

    ap = jax.lax.switch(k, [lambda: a0, lambda: d0,
                            lambda: -a0, lambda: -d0])
    dp = jax.lax.switch(k, [lambda: d0, lambda: -a0,
                            lambda: -d0, lambda: a0])
    kappa = -dp / jnp.where(jnp.abs(ap) < 1e-6, 1e-6, ap)
    kappa_ok = jnp.abs(kappa) <= _KMAX
    kappa = jnp.clip(kappa, -_KMAX, _KMAX)
    # fixed-point quantization so the kernel (which receives kappa via
    # int32 scalar prefetch) reproduces bit-identical floor(kappa * x)
    kq = jnp.round(kappa * jnp.float32(2.0 ** 20))
    kappa = kq * jnp.float32(2.0 ** -20)


    # rotated VALID content box (the square padding is not real
    # content) in rot-k coords. The kernel masks taps whose sample
    # lies beyond the box (+1 px blend rim) to fill; within the rim,
    # taps land on the canvas's zero padding, which equals cv2
    # BORDER_CONSTANT only for fill == 0 — non-zero fills take the
    # fallback for exactness (okk below).
    hf, wf = jnp.float32(h), jnp.float32(w)
    sm = jnp.float32(s - 1)
    ylo = jax.lax.switch(k, [lambda: jnp.float32(0), lambda: sm - wf + 1,
                             lambda: sm - hf + 1, lambda: jnp.float32(0)])
    yhi = jax.lax.switch(k, [lambda: hf - 1, lambda: sm,
                             lambda: sm, lambda: wf - 1])
    xlo = jax.lax.switch(k, [lambda: jnp.float32(0), lambda: jnp.float32(0),
                             lambda: sm - wf + 1, lambda: sm - hf + 1])
    xhi = jax.lax.switch(k, [lambda: wf - 1, lambda: hf - 1,
                             lambda: sm, lambda: sm])
    s0 = jnp.minimum(jnp.floor(kappa * 0.0),
                     jnp.floor(kappa * jnp.float32(s - 1)))
    shift = jnp.floor(kappa * jnp.arange(s, dtype=jnp.float32)) - s0
    ht = s + int(np.ceil(_KMAX * s)) + 8

    chw_direct = jnp.moveaxis(x, -1, 0).astype(jnp.float32)

    def direct_branch(_):
        out, _ok = _prepare_and_run_mapless(
            chw_direct, coefs, box_d, (new_h, new_w), nsel=nsel,
            fill=float(fill_value), map_form=form, nearest=nearest,
            border=border)
        return out, jnp.asarray(True)

    def _sheared_source():
        # rotated content, already TRANSPOSED for the shear kernel:
        # srcT = rot90(P, k).T collapses to pure flips for odd k
        # (rot90(P,1).T = fliplr(P), rot90(P,3).T = flipud(P)) and one
        # transpose for even k. The old rot90-then-.T chain paid two
        # relayouts because the lax.switch boundary blocks XLA's
        # transpose-of-transpose fusion (measured 0.18 ms at 1080p).
        xc_chw = jnp.moveaxis(x, -1, 0).astype(jnp.float32)
        # transpose the (h, w) CONTENT before padding to the square
        # canvas: rot90(pad(P)).T == pad(rot90(P).T) with pads swapped,
        # so the even-k relayout runs on h·w pixels instead of s²
        # (1080p: 2.07M vs 3.69M — the transposes around the shear are
        # relayout-bound, PERF_NOTES round 4e/5d)
        xT = jnp.swapaxes(xc_chw, 1, 2)

        def _srcT_one2(p, pt):
            # returns rot90(pad(p), k).T as pads of flipped content
            return jax.lax.switch(k, [
                lambda: jnp.pad(pt, ((0, s - w), (0, s - h))),
                lambda: jnp.pad(p[:, ::-1], ((0, s - h), (s - w, 0))),
                lambda: jnp.pad(pt[::-1, ::-1],
                                ((s - w, 0), (s - h, 0))),
                lambda: jnp.pad(p[::-1, :], ((s - h, 0), (0, s - w))),
            ])

        chw_t = jax.vmap(_srcT_one2)(xc_chw, xT)

        # build T = pre-sheared content:
        # T[rho, i] = src'[rho - shift[i], i]
        def shear_one(srcT2d):
            return _lane_shift_pallas(srcT2d, shift, ht).T

        return jax.vmap(shear_one)(chw_t)

    def _gate_sheared(okk):
        okk = okk & kappa_ok
        if float(fill_value) != 0.0 and padding_mode == "zeros":
            # the square canvas's zero padding stands in for the border
            # constant, which is only exact for fill == 0
            okk = jnp.asarray(False)
        return okk

    def sheared_mapless_branch(_):
        # MAPLESS sheared path (affine only): the rot-k composed map
        # is itself affine, so the kernel evaluates it in-register and
        # fetch bounds come from _mapless_bounds_sheared's corner
        # sandwich — the full-resolution map arrays, their pads and
        # four chunk reductions (0.27 ms at 1080p) never exist. The
        # analytic ±(2+2|κ|) slack costs one extra candidate on each
        # tier (narrow 7, wide nsel+2), so every map the data-exact
        # gates admitted is still admitted (data spread + slack ≤
        # data gate + 2).
        smf = jnp.float32(s - 1)
        c = coefs

        def _row_x():                                  # sxp coefs
            return jax.lax.switch(k, [
                lambda: jnp.stack([c[0], c[1], c[2]]),
                lambda: jnp.stack([c[3], c[4], c[5]]),
                lambda: jnp.stack([-c[0], -c[1], smf - c[2]]),
                lambda: jnp.stack([-c[3], -c[4], smf - c[5]])])

        def _row_y():                                  # syp coefs
            return jax.lax.switch(k, [
                lambda: jnp.stack([c[3], c[4], c[5]]),
                lambda: jnp.stack([-c[0], -c[1], smf - c[2]]),
                lambda: jnp.stack([-c[3], -c[4], smf - c[5]]),
                lambda: jnp.stack([c[0], c[1], c[2]])])

        coefs_p = jnp.concatenate(
            [_row_x(), _row_y(),
             jnp.asarray([0.0, 0.0, 1.0], jnp.float32)])
        box_p = jnp.stack([xlo, xhi, ylo, yhi])
        rmin, rmax, cmin, cmax, parked = _mapless_bounds_sheared(
            coefs_p, box_p, kappa, s0, hc_d, wc_d, s, s,
            nearest, border)
        mc = jax.lax.bitcast_convert_type(
            jnp.concatenate([coefs_p, box_p]), jnp.int32)
        out, okk = _run_from_bounds(
            _sheared_source(), new_h, new_w, s, s,
            rmin, rmax, cmin, cmax, parked=parked, nsel=nsel + 2,
            fill=float(fill_value), kappa=jnp.stack([kq, s0]),
            mc=mc, map_form="affine", nearest=nearest, border=border,
            use_box=not border, nsel_narrow=_NSEL_N + 1)
        return out, _gate_sheared(okk)

    def sheared_branch(_):
        # Data-map sheared path (kept for PERSPECTIVE maps: the rot-k
        # composed homography's u = sy' + κ·sx' is not affine, so the
        # corner sandwich doesn't bound it; affine maps ride
        # sheared_mapless_branch instead).
        gx, gy = jnp.meshgrid(jnp.arange(new_w, dtype=jnp.float32),
                              jnp.arange(new_h, dtype=jnp.float32),
                              indexing="xy")
        sx, sy = eval_pt(gx, gy)
        smf = jnp.float32(s - 1)
        sxp = jax.lax.switch(k, [
            lambda: sx, lambda: sy,
            lambda: smf - sx, lambda: smf - sy])
        syp = jax.lax.switch(k, [
            lambda: sy, lambda: smf - sx,
            lambda: smf - sy, lambda: sx])
        # push out-of-content samples far out so they read as invalid
        oob = ((syp < ylo - 1.0) | (syp > yhi + 1.0)
               | (sxp < xlo - 1.0) | (sxp > xhi + 1.0))
        sxp = jnp.where(oob, -1e6, sxp)
        syp = jnp.where(oob, -1e6, syp)
        if border:
            sxp = jnp.clip(sxp, xlo, xhi)
            syp = jnp.clip(syp, ylo, yhi)
        if nearest:
            sxp = jnp.floor(sxp + 0.5)
            syp = jnp.floor(syp + 0.5)

        out, okk = _prepare_and_run(
            _sheared_source(), sxp, syp, nsel=nsel,
            fill=float(fill_value), kappa=jnp.stack([kq, s0]),
            orig_hw=(s, s))
        return out, _gate_sheared(okk)

    out_fast, ok = jax.lax.cond(
        ok_direct, direct_branch,
        sheared_mapless_branch if form == "affine" else sheared_branch,
        operand=None)

    if fallback:
        def slow(_):
            from kornia_tpu.ops.interpolation import grid_sample
            gx, gy = jnp.meshgrid(
                jnp.arange(new_w, dtype=jnp.float32),
                jnp.arange(new_h, dtype=jnp.float32), indexing="xy")
            sx, sy = eval_pt(gx, gy)
            res = grid_sample(x.astype(jnp.float32), sx, sy,
                              mode="bilinear" if mode != "nearest"
                              else "nearest",
                              padding_mode=padding_mode,
                              fill_value=fill_value)
            return jnp.moveaxis(res, -1, 0)

        out = jax.lax.cond(ok, lambda _: out_fast, slow, operand=None)
    else:
        out = out_fast
    out = jnp.moveaxis(out, 0, -1)
    out = _finalize(out, in_dtype)
    return out[..., 0] if squeeze else out


def warp_affine_exact(img: jax.Array, m: jax.Array,
                      dsize: Tuple[int, int], mode: str = "bilinear",
                      padding_mode: str = "zeros",
                      fill_value: float = 0.0,
                      nsel: int = 8, fallback: bool = True) -> jax.Array:
    """Exact cv2.warpAffine at vector rate (reference warp/affine.rs).

    ``m`` is the 2x3 src->dst matrix; every destination pixel samples
    the inverse map with single-pass bilinear taps, identical to the
    gather formulation. Slope-measured at 1080p on v5e: ~0.35-0.45 ms
    for near-axis maps (translate/scale/rot<~15deg — the MAPLESS
    direct path: the map is evaluated in-register from coefficients,
    no map arrays exist), ~0.73 ms for large rotations (rot90-
    normalize + integer pre-shear + MAPLESS sheared chunk kernel with
    corner-sandwich bounds, PERF_NOTES round 4e), vs ~60 ms for the
    scalar-gather path and 0.842 ms for the reference's CUDA kernel
    on AGX Orin (BASELINE.md [A]).
    """
    mm = m.astype(jnp.float32)
    a = mm[:, :2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ainv = jnp.stack([
        jnp.stack([a[1, 1], -a[0, 1]]),
        jnp.stack([-a[1, 0], a[0, 0]])]) / det
    tinv = -ainv @ mm[:, 2]

    coefs = jnp.stack([
        ainv[0, 0], ainv[0, 1], tinv[0],
        ainv[1, 0], ainv[1, 1], tinv[1],
        jnp.float32(0), jnp.float32(0), jnp.float32(1)])
    return _warp_exact_common(img, coefs, dsize, mode, padding_mode,
                              fill_value, nsel, fallback, form="affine")


def warp_perspective_exact(img: jax.Array, m: jax.Array,
                           dsize: Tuple[int, int],
                           mode: str = "bilinear",
                           padding_mode: str = "zeros",
                           fill_value: float = 0.0,
                           nsel: int = 8,
                           fallback: bool = True) -> jax.Array:
    """Exact cv2.warpPerspective at vector rate (warp/perspective.rs).

    Homography chunks whose local foreshortening exceeds the static
    window capacity (extreme horizons) fall back to the gather path.
    """
    minv = jnp.linalg.inv(m.astype(jnp.float32))
    coefs = minv.reshape(9)
    return _warp_exact_common(img, coefs, dsize, mode, padding_mode,
                              fill_value, nsel, fallback, form="persp")
