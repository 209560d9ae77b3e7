"""Connected-component labeling — TPU scan-propagation and host union-find.

Capability parity with the reference's SAUF-equivalent CCL
(kornia-imgproc/src/connected_components.rs and the CUDA ccl kernel,
cuda/mod.rs). Two residencies, mirroring the reference's one-API contract:

* :func:`connected_components` — pure-JAX, jittable. Labels propagate by
  alternating segmented min-scans along rows and columns (associative
  scans → VPU-friendly, no data-dependent shapes). Each sweep resolves one
  "turn" of a component's geometry, so convergence is O(turns), not
  O(perimeter); ``max_sweeps`` bounds the lax.while_loop.
* :func:`connected_components_host` — exact one-pass union-find in native
  C++ (kornia_tpu/native/ccl.cpp) with a scipy-free numpy fallback.

Labels are compacted to 1..K on the host path; the JAX path returns
raster-order-min representative labels (stable, but sparse), plus a
``relabel_sequential`` helper for compaction outside jit.
"""

from __future__ import annotations

import ctypes
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def _segmented_min_scan(values: jax.Array, starts: jax.Array,
                        axis: int, reverse: bool) -> jax.Array:
    """Min-scan of `values` along `axis`, restarting where starts==True."""

    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    out, _ = jax.lax.associative_scan(
        combine, (values, starts), axis=axis, reverse=reverse)
    return out


_BIG = 2 ** 30  # python int: folds in-trace (device consts are pathological on axon)


@partial(jax.jit, static_argnames=("connectivity", "max_sweeps"))
def connected_components(
    mask: jax.Array, connectivity: int = 4, max_sweeps: int = 64
) -> jax.Array:
    """Label nonzero pixels of a (H, W) mask; background = -1.

    Returns int32 labels where connected pixels share the smallest linear
    index of their component. Jittable; fixed shapes throughout.
    """
    if mask.ndim != 2:
        raise ValueError(f"mask must be (H, W), got {mask.shape}")
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")
    h, w = mask.shape
    fg = mask != 0
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(fg, idx, _BIG)

    # Segment starts: first pixel of each contiguous fg run along the axis.
    row_start = fg & ~jnp.pad(fg, ((0, 0), (1, 0)))[:, :-1]
    row_end = fg & ~jnp.pad(fg, ((0, 0), (0, 1)))[:, 1:]
    col_start = fg & ~jnp.pad(fg, ((1, 0), (0, 0)))[:-1, :]
    col_end = fg & ~jnp.pad(fg, ((0, 1), (0, 0)))[1:, :]
    bg_or_start_r = ~fg | row_start
    bg_or_end_r = ~fg | row_end
    bg_or_start_c = ~fg | col_start
    bg_or_end_c = ~fg | col_end

    def diag_pass(lab):
        """8-connectivity: take min over the 4 diagonal neighbors."""
        p = jnp.pad(lab, 1, constant_values=_BIG)
        dn = jnp.minimum(
            jnp.minimum(p[:-2, :-2], p[:-2, 2:]),
            jnp.minimum(p[2:, :-2], p[2:, 2:]))
        return jnp.where(fg, jnp.minimum(lab, dn), _BIG)

    def sweep(lab):
        lab = _segmented_min_scan(lab, bg_or_start_r, 1, False)
        lab = _segmented_min_scan(lab, bg_or_end_r, 1, True)
        if connectivity == 8:
            lab = diag_pass(lab)
        lab = _segmented_min_scan(lab, bg_or_start_c, 0, False)
        lab = _segmented_min_scan(lab, bg_or_end_c, 0, True)
        if connectivity == 8:
            lab = diag_pass(lab)
        return lab

    def cond(state):
        i, lab, changed = state
        return changed & (i < max_sweeps)

    def body(state):
        i, lab, _ = state
        new = sweep(lab)
        return i + 1, new, jnp.any(new != lab)

    _, labels, _ = jax.lax.while_loop(cond, body, (0, sweep(labels), True))
    return jnp.where(fg, labels, -1).astype(jnp.int32)


def relabel_sequential(labels: np.ndarray) -> np.ndarray:
    """Compact sparse labels (host, post-jit) to 0=bg, 1..K components."""
    labels = np.asarray(labels)
    out = np.zeros_like(labels, dtype=np.int32)
    fg = labels >= 0
    _, inverse = np.unique(labels[fg], return_inverse=True)
    out[fg] = inverse.astype(np.int32) + 1
    return out


def _ccl_numpy(mask: np.ndarray, connectivity: int) -> np.ndarray:
    """Numpy fallback: two-pass with a python union-find (small inputs)."""
    h, w = mask.shape
    parent = np.arange(h * w, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    fg = mask != 0
    for y in range(h):
        for x in range(w):
            if not fg[y, x]:
                continue
            i = y * w + x
            if x > 0 and fg[y, x - 1]:
                union(i, i - 1)
            if y > 0 and fg[y - 1, x]:
                union(i, i - w)
            if connectivity == 8 and y > 0:
                if x > 0 and fg[y - 1, x - 1]:
                    union(i, i - w - 1)
                if x + 1 < w and fg[y - 1, x + 1]:
                    union(i, i - w + 1)
    labels = np.zeros(h * w, np.int32)
    remap = {}
    nxt = 0
    flat = fg.reshape(-1)
    for i in range(h * w):
        if flat[i]:
            r = find(i)
            if r not in remap:
                nxt += 1
                remap[r] = nxt
            labels[i] = remap[r]
    return labels.reshape(h, w)


def connected_components_host(
    mask: np.ndarray, connectivity: int = 4
) -> np.ndarray:
    """Exact host-side CCL: labels 0=bg, 1..K in raster order.

    Uses the native C++ union-find (native/ccl.cpp) when available.
    """
    from kornia_tpu.native import load_native_library

    mask = np.ascontiguousarray(np.asarray(mask) != 0, np.uint8)
    if mask.ndim != 2:
        raise ValueError(f"mask must be (H, W), got {mask.shape}")
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")
    lib = load_native_library()
    if lib is not None:
        fn = lib.kornia_ccl_label
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                       ctypes.c_int64, ctypes.c_int32,
                       ctypes.POINTER(ctypes.c_int32)]
        labels = np.empty(mask.shape, np.int32)
        fn(mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           mask.shape[0], mask.shape[1], connectivity,
           labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return labels
    return _ccl_numpy(mask, connectivity)


def label_classes_host(img: np.ndarray, skip: int = 127) -> np.ndarray:
    """Label same-valued regions of a u8 class image: 4-connectivity,
    with WHITE (255) additionally 8-connected — the apriltag C
    library's rule (reference segmentation.rs cc_strip_phase1), so a
    tag's white bit cells touching only at corners stay one component.

    The AprilTag segmentation primitive (reference: rle_cc.rs) — pixels
    equal to ``skip`` stay label 0.
    """
    from kornia_tpu.native import load_native_library

    img = np.ascontiguousarray(img, np.uint8)
    lib = load_native_library()
    if lib is not None:
        fn = lib.kornia_ccl_label_classes
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                       ctypes.c_int64, ctypes.c_uint8,
                       ctypes.POINTER(ctypes.c_int32)]
        labels = np.empty(img.shape, np.int32)
        fn(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           img.shape[0], img.shape[1], skip,
           labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return labels
    # fallback: run per-value masks through the numpy CCL
    labels = np.zeros(img.shape, np.int32)
    offset = 0
    for v in np.unique(img):
        if v == skip:
            continue
        conn = 8 if v == 255 else 4
        sub = _ccl_numpy((img == v).astype(np.uint8), conn)
        labels[sub > 0] = sub[sub > 0] + offset
        offset = labels.max()
    return labels
