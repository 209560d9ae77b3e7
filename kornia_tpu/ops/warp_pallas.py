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


# Static geometry of the chunk kernel.
_CW = 384          # column window (3 x 128 lanes); capacity ~254 source cols
_PT = 8            # top padding rows of the padded source
_PL = 8            # left padding cols
_BH = 32           # destination macro-block rows  (4 sub-chunks)
_BW = 512          # destination macro-block lanes (4 sub-chunks)

# Banded-execution knobs (module-level so tests can force the banded
# path at small sizes — it once hid a band-offset bug behind sizes too
# big for the CPU-interpret suite).
_SRC_VMEM_LIMIT = 11 * 1024 * 1024   # single-call source budget, bytes
_BAND_DH = 256                       # destination rows per band
_HB_MAX = 768                        # static source rows per band


def _make_kernel(nsel: int, n_cc: int, with_shear: bool,
                 h_orig: int, w_orig: int, fill: float):
    """Kernel body: resolve one (8, 128) destination chunk.

    Scalar-prefetch operands (1-D, per flattened chunk g = r*n_cc+cc):
      rb_ref: [0:G] 8-aligned row base, [G:2G] sub-8 residual delta.
      cb_ref: [2g] 128-aligned col base, [2g+1] lane roll in [0, 128).
      kap_ref: (3,) i32: pre-shear slope as round(kappa*2^20) (read
        when with_shear), shear row offset s0, and the band row offset
        band0 — row bases arrive relative to the band's source slice,
        but iy0 (from the map) is global, so candidate matching must
        compare against ``rbase + band0`` (single-call path: band0=0).

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

    def kernel(rb_ref, cb_ref, kap_ref, mx_ref, my_ref, src_ref, out_ref):
        r = pl.program_id(1)
        cc = pl.program_id(2)
        n_g = pl.num_programs(1) * n_sub_r * n_cc

        for si in range(n_sub_r):
            for sj in range(n_sub_c):
                g = ((r * n_sub_r + si) * n_cc + cc * n_sub_c + sj)
                sx = mx_ref[0, si * 8:(si + 1) * 8,
                            sj * 128:(sj + 1) * 128]
                sy = my_ref[0, si * 8:(si + 1) * 8,
                            sj * 128:(sj + 1) * 128]
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
                # global row of candidate v=0 at sublane 0: the band
                # offset re-globalizes the band-relative fetch base
                rbase = rb8 + delta + kap_ref[2]
                cb128 = pl.multiple_of(cb_ref[g], 128)

                blk = src_ref[0, pl.ds(rb8, slice_r), pl.ds(cb128, _CW)]
                # roll rows up by delta so candidate 0 sits at the true
                # chunk base. Dynamic rolls need NON-NEGATIVE shifts on
                # hardware (negative shifts are silently wrong on v5e
                # on BOTH axes; interpret mode accepts either sign).
                blk = pltpu.roll(
                    blk, jax.lax.rem(slice_r - delta, slice_r), 0)

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

                relx = ix0 - cb128
                relx1 = relx + 1
                rx = [jnp.clip(relx - 128 * k, 0, 127) for k in range(3)]
                rx1 = [jnp.clip(relx1 - 128 * k, 0, 127)
                       for k in range(3)]

                zero = jnp.zeros((8, 128), jnp.float32)
                tl = zero
                tr = zero
                bl = zero
                br = zero
                for v in range(nsel):
                    cand = blk[v: v + 8, :]    # row r = src rbase+v+r
                    gl = zero
                    gr = zero
                    for k in range(3):
                        win = cand[:, 128 * k: 128 * (k + 1)]
                        in_k = ((relx >= 128 * k)
                                & (relx < 128 * (k + 1)))
                        in_k1 = ((relx1 >= 128 * k)
                                 & (relx1 < 128 * (k + 1)))
                        gl = jnp.where(
                            in_k,
                            jnp.take_along_axis(win, rx[k], axis=1), gl)
                        gr = jnp.where(
                            in_k1,
                            jnp.take_along_axis(win, rx1[k], axis=1), gr)
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
    static_argnames=("nsel", "with_shear", "h_orig", "w_orig", "fill"))
def _remap_chunks(src_p: jax.Array, mxc: jax.Array, myc: jax.Array,
                  rb8: jax.Array, cb128: jax.Array,
                  kappa: jax.Array, nsel: int, with_shear: bool,
                  h_orig: int, w_orig: int, fill: float) -> jax.Array:
    """Core chunk resolver; returns (C, Hc, Wc) f32."""
    ch, hp, wp = src_p.shape
    hc, wc = mxc.shape
    n_cc = wc // 128

    kernel = _make_kernel(nsel, n_cc, with_shear, h_orig, w_orig, fill)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ch, hc // _BH, wc // _BW),
            in_specs=[
                pl.BlockSpec((1, _BH, _BW),
                             lambda c, r, cc, *_: (0, r, cc)),
                pl.BlockSpec((1, _BH, _BW),
                             lambda c, r, cc, *_: (0, r, cc)),
                pl.BlockSpec((1, hp, wp), lambda c, r, cc, *_: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _BH, _BW),
                                   lambda c, r, cc, *_: (c, r, cc)),
        ),
        out_shape=jax.ShapeDtypeStruct((ch, hc, wc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(rb8.astype(jnp.int32), cb128.astype(jnp.int32),
      kappa.astype(jnp.int32).reshape(3), mxc[None], myc[None], src_p)


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

    ok = (jnp.all(rmax - rmin <= nsel - 2)
          & jnp.all(cmax - cmin <= _CW - 130))

    hp = _round_up(h_arr + _PT + slice_r + 8, 8)
    wp = _round_up(w_arr + _PL + _CW + 128, 128)
    src_p = jnp.pad(src.astype(jnp.float32),
                    ((0, 0), (_PT, hp - h_arr - _PT),
                     (_PL, wp - w_arr - _PL)))

    # all-invalid chunks park at base 0 (their output is fill anyway);
    # letting them clip to the array bottom would wreck the band spans
    parked = rmin > 1e8
    rbase = jnp.where(parked, 0,
                      jnp.clip(rmin, 0, hp - slice_r)).astype(jnp.int32)
    rb8 = (rbase // 8) * 8
    delta = rbase - rb8
    cbase = jnp.clip(cmin.astype(jnp.int32), 0, wp - _CW)
    cb128 = (cbase // 128) * 128
    if kappa is not None:
        kap2 = kappa.astype(jnp.int32)
    else:
        kap2 = jnp.zeros((2,), jnp.int32)
    with_shear = kappa is not None

    if hp * wp * 4 <= _SRC_VMEM_LIMIT:
        # source fits VMEM: one kernel call over the whole destination
        rb_packed = jnp.concatenate([rb8.reshape(-1), delta.reshape(-1)])
        kap = jnp.concatenate([kap2, jnp.zeros((1,), jnp.int32)])
        out = _remap_chunks(src_p, mxc, myc, rb_packed,
                            cb128.reshape(-1), kap,
                            nsel=nsel, with_shear=with_shear,
                            h_orig=h, w_orig=w, fill=fill)
        return out[:, :ho, :wo], ok

    # Banded execution: the (pre-sheared) source is too tall for VMEM
    # (general affine: height ~ H + |kappa|*W). Destination rows are
    # processed in bands; each band dynamic-slices the source rows it
    # needs (static height _HB), so every pallas call sees a VMEM-sized
    # operand and all bands share one kernel compilation.
    band_dh = _BAND_DH
    hb = min(_round_up(hp, 8), _HB_MAX)  # static src rows per band
    hcb = _round_up(hc, band_dh)
    n_bands = hcb // band_dh
    pad_r = hcb - hc
    if pad_r:
        mxc = jnp.pad(mxc, ((0, pad_r), (0, 0)), constant_values=-1e6)
        myc = jnp.pad(myc, ((0, pad_r), (0, 0)), constant_values=-1e6)
        zpad = ((0, pad_r // 8), (0, 0))
        rb8 = jnp.pad(rb8, zpad)
        delta = jnp.pad(delta, zpad)
        cb128 = jnp.pad(cb128, zpad)
    outs = []
    ncr_b = band_dh // 8
    if pad_r:
        parked = jnp.pad(parked, ((0, pad_r // 8), (0, 0)),
                         constant_values=True)
    big_i = jnp.int32(2 ** 30)
    for b in range(n_bands):
        rb8_b = rb8[b * ncr_b:(b + 1) * ncr_b]
        park_b = parked[b * ncr_b:(b + 1) * ncr_b]
        # parked (all-invalid) chunks must not stretch the band window:
        # exclude them from the min/max and pin them to the band base;
        # clamp defensively so an over-capacity chunk (ok=False) can
        # never make the kernel read outside the band slice.
        band0 = jnp.min(jnp.where(park_b, big_i, rb8_b))
        band0 = (jnp.clip(band0, 0, hp - hb) // 8) * 8
        real_max = jnp.max(jnp.where(park_b, 0, rb8_b))
        ok = ok & (real_max - band0 + slice_r <= hb)
        rb8_rel = jnp.clip(jnp.where(park_b, band0, rb8_b) - band0,
                           0, hb - slice_r)
        src_band = jax.lax.dynamic_slice(
            src_p, (0, band0, 0), (ch, hb, wp))
        rb_packed = jnp.concatenate([rb8_rel.reshape(-1),
                                     delta[b * ncr_b:(b + 1) * ncr_b]
                                     .reshape(-1)])
        kap = jnp.concatenate([kap2, band0[None]])
        out_b = _remap_chunks(
            src_band,
            mxc[b * band_dh:(b + 1) * band_dh],
            myc[b * band_dh:(b + 1) * band_dh],
            rb_packed,
            cb128[b * ncr_b:(b + 1) * ncr_b].reshape(-1), kap,
            nsel=nsel, with_shear=with_shear,
            h_orig=h, w_orig=w, fill=fill)
        outs.append(out_b)
    out = jnp.concatenate(outs, axis=1)
    return out[:, :ho, :wo], ok


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




def _capacity_ok(map_x: jax.Array, map_y: jax.Array, h: int, w: int,
                 nsel: int) -> jax.Array:
    """The chunk kernel's capacity gate, standalone (no kernel run):
    used to pick between the direct and the rot90+pre-shear pipelines
    before tracing costs into the executed branch."""
    ho, wo = map_x.shape
    hc = _round_up(ho, _BH)
    wc = _round_up(wo, _BW)
    mx = jnp.pad(map_x.astype(jnp.float32),
                 ((0, hc - ho), (0, wc - wo)), constant_values=-1e6)
    my = jnp.pad(map_y.astype(jnp.float32),
                 ((0, hc - ho), (0, wc - wo)), constant_values=-1e6)
    lane_valid = (mx >= -1.0) & (mx <= w + 0.0) & \
                 (my >= -1.0) & (my <= h + 0.0)
    ix0 = jnp.floor(jnp.clip(mx, -1.5, w + 0.5))
    iy0 = jnp.floor(jnp.clip(my, -1.5, h + 0.5))
    big = jnp.float32(1e9)
    riota = (jnp.arange(hc, dtype=jnp.float32) % 8)[:, None]
    rmin = _chunk_reduce(jnp.where(lane_valid, iy0 - riota, big), jnp.min)
    rmax = _chunk_reduce(jnp.where(lane_valid, iy0 - riota, -big),
                         jnp.max)
    cmin = _chunk_reduce(jnp.where(lane_valid, ix0, big), jnp.min)
    cmax = _chunk_reduce(jnp.where(lane_valid, ix0, -big), jnp.max)
    return (jnp.all(rmax - rmin <= nsel - 2)
            & jnp.all(cmax - cmin <= _CW - 130))


def _rot90_maps(sx, sy, s, k):
    """(sx', sy') in rot90(P, k) coordinates for a square (s, s) canvas."""
    sm = jnp.float32(s - 1)
    return (
        jax.lax.switch(k, [
            lambda: sx, lambda: sy, lambda: sm - sx, lambda: sm - sy]),
        jax.lax.switch(k, [
            lambda: sy, lambda: sm - sx, lambda: sm - sy, lambda: sx]),
    )


def _warp_exact_common(img: jax.Array, map_fn, dsize: Tuple[int, int],
                       mode: str, padding_mode: str, fill_value: float,
                       nsel: int, fallback: bool = True) -> jax.Array:
    """Shared path for warp_affine/warp_perspective via the exact chunk
    kernel: rot90-normalize the inverse map, integer-pre-shear the
    source so every destination chunk becomes row-local, run the chunk
    kernel, and fall back to the scalar gather for maps outside the
    static capacity (|kappa| > KMAX, extreme scales, horizons).
    """
    new_h, new_w = dsize
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    h, w, nch = x.shape
    in_dtype = img.dtype

    s = max(h, w)
    gx, gy = jnp.meshgrid(jnp.arange(new_w, dtype=jnp.float32),
                          jnp.arange(new_h, dtype=jnp.float32),
                          indexing="xy")
    sx, sy = map_fn(gx, gy)                 # original src pixel coords

    # pick the rot90 branch with the largest positive row rate e' and
    # derive the pre-shear slope kappa = -d'/a' from central samples
    yc, xc = new_h // 2, new_w // 2
    x1 = max(xc - 8, 0)
    x2 = min(xc + 8, new_w - 1)
    y1 = max(yc - 8, 0)
    y2 = min(yc + 8, new_h - 1)
    ddx = jnp.float32(max(x2 - x1, 1))
    ddy = jnp.float32(max(y2 - y1, 1))
    a0 = (sx[yc, x2] - sx[yc, x1]) / ddx    # dsx/dx
    d0 = (sy[yc, x2] - sy[yc, x1]) / ddx    # dsy/dx
    b0 = (sx[y2, xc] - sx[y1, xc]) / ddy    # dsx/dy
    e0 = (sy[y2, xc] - sy[y1, xc]) / ddy    # dsy/dy
    e_cands = jnp.stack([e0, -b0, -e0, b0])
    k = jnp.argmax(e_cands).astype(jnp.int32)

    # ---- direct fast path: near-axis-aligned maps skip the rot90 /
    # square canvas / pre-shear pipeline entirely (the common
    # scale/translate/small-rotation case: ~0.45 ms at 1080p vs ~1.2)
    mxd = sx
    myd = sy
    if padding_mode == "border":
        mxd = jnp.clip(mxd, 0.0, w - 1.0)
        myd = jnp.clip(myd, 0.0, h - 1.0)
    if mode == "nearest":
        mxd = jnp.floor(mxd + 0.5)
        myd = jnp.floor(myd + 0.5)
    ok_direct = _capacity_ok(mxd, myd, h, w, nsel)

    sxp, syp = _rot90_maps(sx, sy, s, k)
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

    # rotated content on the square canvas
    canvas = jnp.zeros((s, s, nch), x.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas,
                                          x, (0, 0, 0))
    canvas = jax.lax.switch(k, [
        lambda c: c,
        lambda c: jnp.rot90(c, 1, axes=(0, 1)),
        lambda c: jnp.rot90(c, 2, axes=(0, 1)),
        lambda c: jnp.rot90(c, 3, axes=(0, 1)),
    ], canvas)
    chw = jnp.moveaxis(canvas, -1, 0).astype(jnp.float32)

    # mask maps to the rotated VALID content box (the square padding is
    # not real content): valid source box in rot-k coords
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
    # push out-of-content samples far out so they read as invalid
    oob = ((syp < ylo - 1.0) | (syp > yhi + 1.0)
           | (sxp < xlo - 1.0) | (sxp > xhi + 1.0))
    sxp = jnp.where(oob, -1e6, sxp)
    syp = jnp.where(oob, -1e6, syp)
    # edge-partial samples: taps beyond the content box must read fill,
    # not square-canvas zeros; the kernel's h/w masks use the FULL
    # square, so shrink-blend is handled by pre-masking the canvas
    # border... the canvas beyond content is zero already, which equals
    # cv2 BORDER_CONSTANT only when fill == 0. Non-zero fills on the
    # 1-px content rim take the fallback for exactness.

    if padding_mode == "border":
        sxp = jnp.clip(sxp, xlo, xhi)
        syp = jnp.clip(syp, ylo, yhi)
    if mode == "nearest":
        sxp = jnp.floor(sxp + 0.5)
        syp = jnp.floor(syp + 0.5)

    s0 = jnp.minimum(jnp.floor(kappa * 0.0),
                     jnp.floor(kappa * jnp.float32(s - 1)))
    shift = jnp.floor(kappa * jnp.arange(s, dtype=jnp.float32)) - s0
    ht = s + int(np.ceil(_KMAX * s)) + 8

    chw_direct = jnp.moveaxis(x, -1, 0).astype(jnp.float32)

    def direct_branch(_):
        out, _ok = _prepare_and_run(chw_direct, mxd, myd, nsel=nsel,
                                    fill=float(fill_value))
        return out, jnp.asarray(True)

    def sheared_branch(_):
        # build T = pre-sheared content:
        # T[rho, i] = src'[rho - shift[i], i]
        def shear_one(ch2d):
            return _lane_shift_pallas(ch2d.T, shift, ht).T

        t_chw = jax.vmap(shear_one)(chw)
        out, okk = _prepare_and_run(
            t_chw, sxp, syp, nsel=nsel, fill=float(fill_value),
            kappa=jnp.stack([kq, s0]), orig_hw=(s, s))
        okk = okk & kappa_ok
        if float(fill_value) != 0.0 and padding_mode == "zeros":
            # the square canvas's zero padding stands in for the border
            # constant, which is only exact for fill == 0
            okk = jnp.asarray(False)
        return out, okk

    out_fast, ok = jax.lax.cond(ok_direct, direct_branch,
                                sheared_branch, operand=None)

    if fallback:
        def slow(_):
            from kornia_tpu.ops.interpolation import grid_sample
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
    gather formulation. ~0.5 ms at 1080p vs ~60 ms for the gather path
    and 0.842 ms for the reference's CUDA kernel (BASELINE.md [A]).
    """
    mm = m.astype(jnp.float32)
    a = mm[:, :2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ainv = jnp.stack([
        jnp.stack([a[1, 1], -a[0, 1]]),
        jnp.stack([-a[1, 0], a[0, 0]])]) / det
    tinv = -ainv @ mm[:, 2]

    def map_fn(gx, gy):
        sx = ainv[0, 0] * gx + ainv[0, 1] * gy + tinv[0]
        sy = ainv[1, 0] * gx + ainv[1, 1] * gy + tinv[1]
        return sx, sy

    return _warp_exact_common(img, map_fn, dsize, mode, padding_mode,
                              fill_value, nsel, fallback)


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

    def map_fn(gx, gy):
        den = minv[2, 0] * gx + minv[2, 1] * gy + minv[2, 2]
        den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
        sx = (minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]) / den
        sy = (minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]) / den
        return sx, sy

    return _warp_exact_common(img, map_fn, dsize, mode, padding_mode,
                              fill_value, nsel, fallback)
