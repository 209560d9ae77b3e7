"""Gather-free affine warp: shear decomposition on a square canvas.

TPU gathers run at scalar rate (~20 ms for one 1080p bilinear gather
pass — PERF_NOTES.md), so the TPU-native affine warp never gathers. The
inverse map ``src = L·dst + t`` is decomposed as ``L = U·Σ·Vᵀ``
(closed-form 2×2 SVD, in-trace) and applied as a chain of sampling
passes that each touch memory with UNIT stride:

* rotations U, Vᵀ → 90°-multiples as transpose/flip branches
  (``lax.switch`` on a SQUARE canvas so all branches shape-match) plus a
  residual |θ| ≤ 45° as three unit-diagonal shears
  (R(θ) = Sx(−tan θ/2)·Sy(sin θ)·Sx(−tan θ/2)); a shear samples
  ``out[y, x] = img[y, x + shift(y)]`` — one dynamic slice + fractional
  blend per row inside a Pallas kernel, rows resident in VMEM;
* axis scales Σ → 1-D resamples as band matmuls whose tent matrices are
  built in-trace from the RUNTIME σ (host-built static resize matrices
  can't depend on traced values), riding the MXU;
* the translation rides the final pass's shear offsets.

Sampling-pass algebra used throughout (P = (M, o): out(p) = in(M p + o),
p = (x, y) in canvas coords): applying P_a then P_b gives
out(p) = in(M_a M_b p + M_a o_b + o_a).

Everything is fixed-shape: the image sits centered on a C×C canvas
(C ≥ diagonal of src and dst, rounded up to 256), so any rotation of
the content stays on-canvas; rows whose shear shift leaves the canvas
are zeroed — they sample off-canvas content, which is zero by
definition.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------- shear kernel
def _shear_x(img: jax.Array, shifts: jax.Array) -> jax.Array:
    """out[y, x] = img[y, x + shifts[y]] (bilinear in x, zero outside).

    img: (C, C) f32; shifts: (C,) f32 (traced). Pallas kernel: one
    dynamic slice + fractional blend per row — no gather.
    """
    c = img.shape[0]
    row_t = 8
    # shifts are bounded by |tan 22.5°|·c/2 plus small residual offsets
    # (translations are absorbed into the final crop by the caller)
    slack = c // 4 + 192
    # extra 256 lanes on the right so the aligned slice below always fits
    pad = jnp.pad(img, ((0, 0), (slack, slack + 256)))
    n_tiles = c // row_t

    i0 = jnp.floor(shifts)
    frac = (shifts - i0).astype(jnp.float32)
    start = jnp.clip(i0.astype(jnp.int32) + slack, 0, 2 * slack - 1)
    valid = (i0 > -slack) & (i0 < slack - 1)

    # Vectorized tile scheme (Mosaic only allows lane-aligned dynamic
    # slice starts, and per-row rolls waste 7/8 sublanes): per 8-row
    # tile take ONE aligned slice + ONE vector roll, then resolve the
    # ≤8-lane per-row spread (shifts are affine in y, |k| ≤ tan 22.5°)
    # with static shifted-slice selects.
    start_t = start.reshape(n_tiles, row_t)
    valid_t = valid.reshape(n_tiles, row_t)
    # base from VALID rows only (clipped invalid starts would widen the
    # in-tile spread past the 8-select window)
    big = jnp.int32(2 ** 30)
    base = jnp.where(valid_t, start_t, big).min(axis=1)
    base = jnp.clip(base, 0, 2 * slack - 1)
    q128 = (base // 128) * 128
    rem = base - q128                          # [0, 128)
    d = jnp.clip(start_t - base[:, None], 0, 7)
    frac_t = frac.reshape(n_tiles, row_t)
    pad_w = pad.shape[1]
    n_sel = 8

    def kernel(q_ref, rem_ref, d_ref, frac_ref, valid_ref,
               src_ref, out_ref):
        i = pl.program_id(0)
        q = pl.multiple_of(q_ref[i], 128)
        tile = src_ref[:, pl.ds(q, c + 256)]            # (8, c+256)
        rolled = pltpu.roll(tile, -rem_ref[i], 1)
        dv = jnp.stack([d_ref[i, r] for r in range(row_t)])[:, None]
        fv = jnp.stack([frac_ref[i, r] for r in range(row_t)])[:, None]
        vv = jnp.stack([valid_ref[i, r] for r in range(row_t)])[:, None]
        acc = jnp.zeros((row_t, c), jnp.float32)
        for dd in range(n_sel):
            seg = (rolled[:, dd: dd + c] * (1.0 - fv)
                   + rolled[:, dd + 1: dd + 1 + c] * fv)
            acc = acc + jnp.where(dv == dd, seg, 0.0)
        out_ref[...] = jnp.where(vv != 0, acc, 0.0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((row_t, pad_w), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_t, c), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((c, c), jnp.float32),
        interpret=_interpret(),
    )(q128, rem, d, frac_t, valid_t.astype(jnp.int32), pad)


def _shear_y(img: jax.Array, shifts: jax.Array) -> jax.Array:
    """out[y, x] = img[y + shifts[x], x] — the x-shear of the transpose."""
    return _shear_x(img.T, shifts).T


# -------------------------------------------------------- rotation + offset
def _rot90_case(n: int):
    """Content permutation implementing the sampling pass
    out(p) = in(R(n·90°)(p − c) + c) on a square canvas.

    Directions are pinned by tests/test_warp_shear.py against the gather
    reference.
    """
    if n == 0:
        return lambda x: x
    if n == 1:
        # out[y, x] = in[x, C−1−y] — sampling through R(+90°) about the
        # center of a square canvas == np.rot90(k=+1)
        return lambda x: jnp.rot90(x, k=1)
    if n == 2:
        return lambda x: x[::-1, ::-1]
    return lambda x: jnp.rot90(x, k=-1)


def _rot_pass(ch: jax.Array, m_rot: jax.Array, o: jax.Array,
              c: int) -> jax.Array:
    """General rotation sampling pass: out(p) = ch(m_rot p + o).

    m_rot must be a proper rotation R(θ) (any θ). Runs the 90°-multiple
    as a canvas permutation (about-center) and the |θ_r| ≤ 45° residual
    as three shears carrying the full offset.
    """
    cvec = jnp.asarray([(c - 1) / 2.0, (c - 1) / 2.0], jnp.float32)
    theta = jnp.arctan2(m_rot[1, 0], m_rot[0, 0])
    n90 = jnp.round(theta / (jnp.pi / 2))
    n = (n90.astype(jnp.int32)) % 4
    theta_r = theta - n90 * (jnp.pi / 2)

    ch90 = jax.lax.switch(n, [_rot90_case(i) for i in range(4)], ch)

    # residual map: R90_c applied first ⇒ need (M_s, o_s) with
    # R90 M_s = m_rot and R90 o_s + o90 = o, o90 = cvec − R90 cvec
    ang = n.astype(jnp.float32) * (jnp.pi / 2)
    c9, s9 = jnp.cos(ang), jnp.sin(ang)
    r90inv = jnp.stack([jnp.stack([c9, s9]), jnp.stack([-s9, c9])])
    o_r = r90inv @ (o - cvec) + cvec

    k = -jnp.tan(theta_r / 2.0)
    mm = jnp.sin(theta_r)
    ys = jnp.arange(c, dtype=jnp.float32)
    # P1=Sx(k, b1), P2=Sy(mm, b2), P3=Sx(k, 0):
    # total offset = (b1 + k b2, b2) ⇒ b2 = o_r[1], b1 = o_r[0] − k o_r[1]
    b2 = o_r[1]
    b1 = o_r[0] - k * b2
    out = _shear_x(ch90, k * ys + b1)
    out = _shear_y(out, mm * ys + b2)
    out = _shear_x(out, k * ys)
    return out


# ------------------------------------------------------- runtime 1-D resize
def _scale_x(img: jax.Array, sigma: jax.Array) -> jax.Array:
    """out[y, x] = img[y, σ·(x − c) + c] along x (about-center scale).

    Band matmul with a tent matrix built in-trace from the runtime σ.
    Off-canvas taps give zero (canvas border is zero anyway).
    """
    c = img.shape[1]
    ctr = (c - 1) / 2.0
    xs = jnp.arange(c, dtype=jnp.float32)
    src = sigma * (xs - ctr) + ctr
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - xs[None, :]))
    w = jnp.where((src[:, None] >= 0.0) & (src[:, None] <= c - 1), w, 0.0)
    return jnp.einsum("oi,hi->ho", w, img,
                      precision=jax.lax.Precision.DEFAULT)


# ---------------------------------------------------------------- main warp
@functools.partial(jax.jit, static_argnames=("dsize",))
def warp_affine_shear(
    img: jax.Array, m: jax.Array, dsize: Tuple[int, int]
) -> jax.Array:
    """Affine warp (cv2.warpAffine semantics) with zero gathers.

    img: (H, W) or (H, W, C); m: (2, 3) src→dst (runtime value).
    Bilinear, zero border. |σ| is clamped to ≥1e-3 (a singular affine
    collapses the image anyway).
    """
    new_h, new_w = dsize
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    h, w, nch = x.shape
    in_dtype = img.dtype

    # canvas holds the content diagonal D plus intermediate shear
    # excursions: between the shears of a |θ|≤45° rotation the content
    # passes through Sx(±tan 22.5°) whose largest singular value is
    # ~1.23, so 1.3·D + margin covers intermediates and roundoff.
    # Canvas area is the dominant cost (every pass touches c²) — keep
    # the bound tight: 1.5 → 1.3 alone is a 1.3× speedup at 1080p.
    c = _round_up(int(math.ceil(1.3 * math.hypot(max(h, new_h),
                                                 max(w, new_w)))) + 64,
                  256)
    oy = (c - h) // 2
    ox = (c - w) // 2
    doy = (c - new_h) // 2
    dox = (c - new_w) // 2
    cvec = jnp.asarray([(c - 1) / 2.0, (c - 1) / 2.0], jnp.float32)

    # inverse map in canvas coordinates: src_c = L dst_c + t_c
    mm = m.astype(jnp.float32)
    a = mm[:, :2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    linv = jnp.stack([
        jnp.stack([a[1, 1], -a[0, 1]]),
        jnp.stack([-a[1, 0], a[0, 0]])]) / det
    tinv = -linv @ mm[:, 2]
    off_dst = jnp.asarray([dox, doy], jnp.float32)
    off_src = jnp.asarray([ox, oy], jnp.float32)
    # dst_img = dst_c − off_dst; src_img = src_c − off_src;
    # src_img = linv dst_img + tinv
    # ⇒ src_c = linv dst_c + (tinv + off_src − linv off_dst)
    t_c = -linv @ off_dst + tinv + off_src

    # SVD linv = U Σ Vᵀ (closed form; reflection folded into Σ sign)
    e = (linv[0, 0] + linv[1, 1]) / 2
    f_ = (linv[0, 0] - linv[1, 1]) / 2
    g = (linv[1, 0] + linv[0, 1]) / 2
    hh = (linv[1, 0] - linv[0, 1]) / 2
    q = jnp.sqrt(e * e + hh * hh)
    r = jnp.sqrt(f_ * f_ + g * g)
    s1 = q + r
    s2 = q - r                      # negative ⇒ reflection
    a1 = jnp.arctan2(g, f_)
    a2 = jnp.arctan2(hh, e)
    gamma = (a2 + a1) / 2           # U angle

    s1 = jnp.where(jnp.abs(s1) < 1e-3, 1e-3, s1)
    s2m = jnp.abs(s2)
    s2m = jnp.where(s2m < 1e-3, 1e-3, s2m)
    sgn = jnp.where(s2 < 0, -1.0, 1.0)

    # pass maps (sampling form, canvas coords), applied in this order:
    # P1 = rot(U): (R_γ, o_γ) about center
    cg, sg = jnp.cos(gamma), jnp.sin(gamma)
    m1 = jnp.stack([jnp.stack([cg, -sg]), jnp.stack([sg, cg])])
    o1 = cvec - m1 @ cvec
    # P2 = scale diag(s1, sgn·s2m) about center (flip via row reverse)
    m2 = jnp.stack([jnp.stack([s1, jnp.float32(0.0)]),
                    jnp.stack([jnp.float32(0.0), sgn * s2m])])
    o2 = cvec - m2 @ cvec
    # after P1∘P2 the composed map is (m12, o12):
    m12 = m1 @ m2
    o12 = m1 @ o2 + o1
    # P3 must satisfy m12 @ m3 = linv, m12 @ o3 + o12 = t_c
    det12 = m12[0, 0] * m12[1, 1] - m12[0, 1] * m12[1, 0]
    det12 = jnp.where(jnp.abs(det12) < 1e-12, 1e-12, det12)
    m12inv = jnp.stack([
        jnp.stack([m12[1, 1], -m12[0, 1]]),
        jnp.stack([-m12[1, 0], m12[0, 0]])]) / det12
    m3 = m12inv @ linv              # ≡ R(β) up to numeric noise
    o3 = m12inv @ (t_c - o12)
    # orthonormalize m3 against drift
    th3 = jnp.arctan2(m3[1, 0], m3[0, 0])
    c3, s3 = jnp.cos(th3), jnp.sin(th3)
    m3 = jnp.stack([jnp.stack([c3, -s3]), jnp.stack([s3, c3])])
    # absorb the (possibly large) translation into the final crop:
    # cropping at d + p0 instead of d turns out(p) = I2(m3 p + o3) into
    # sampling with offset o3 + m3 p0, so choosing p0 ≈ −m3ᵀ o3 leaves
    # only a sub-pixel residual for the shear offsets (keeps the shear
    # kernel slack small — it is the dominant HBM traffic)
    # (only the excess beyond the rotation's about-center offset moves —
    # the centering part must stay in the pass or content leaves canvas)
    o3_center = cvec - m3 @ cvec
    delta = jnp.round(m3.T @ (o3 - o3_center))
    o3 = o3 - m3 @ delta
    crop_x = jnp.clip(dox + delta[0].astype(jnp.int32), 0, c - new_w)
    crop_y = jnp.clip(doy + delta[1].astype(jnp.int32), 0, c - new_h)

    canvas = jnp.zeros((c, c, nch), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(
        canvas, x.astype(jnp.float32), (oy, ox, 0))

    def one_channel(ch):
        ch = _rot_pass(ch, m1, o1, c)                    # P1
        ch = _scale_x(ch, s1)                            # P2 (x)
        chT = _scale_x(ch.T, s2m).T                      # P2 (y)
        ch = jnp.where(sgn < 0, chT[::-1, :], chT)       # P2 flip
        return _rot_pass(ch, m3, o3, c)                  # P3

    # vmap over channels: one batched program (the scale einsums become
    # batch matmuls, the Pallas shear grids gain a channel dimension)
    # instead of nch sequential pass chains
    out_c = jnp.moveaxis(
        jax.vmap(one_channel)(jnp.moveaxis(canvas, -1, 0)), 0, -1)
    out = jax.lax.dynamic_slice(out_c, (crop_y, crop_x, 0),
                                (new_h, new_w, nch))
    if in_dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    else:
        out = out.astype(in_dtype)
    return out[..., 0] if squeeze else out
