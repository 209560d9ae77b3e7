"""Benchmark harness — prints ONE JSON line for the driver.

Methodology follows the reference's (kornia-py/benchmarks.md): best-of-N
min with GC off, device-synced timing (`block_until_ready`), byte-level
sanity checks alongside speed. Headline metric: the fused DNN-preprocess
pipeline (1080p RGB u8 → 640×640 normalized CHW f32), the reference's
flagship fused kernel (benchmark-cuda-color-conversions.md §Fused:
0.0968 ms on Orin Nano CUDA). vs_baseline is the speedup factor
(baseline_ms / ours_ms; > 1 means faster than the reference's GPU number).

Detailed per-op results go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import gc
import json
import sys
import time

import numpy as np


def _bench(fn, inputs, warmup=2):
    """Median over one pass of DISTINCT inputs.

    Not min-of-N on one input: the axon tunnel memoizes identical
    (program, input) executions, so repeated calls with the same buffer
    can return cached results and under-report (PERF_NOTES.md
    §memoization). Distinct inputs + median is cache-proof and robust
    to first-touch outliers.
    """
    import jax

    for i in range(warmup):
        jax.block_until_ready(fn(inputs[-(i + 1)]))
    gc.disable()
    try:
        times = []
        for x in inputs[: len(inputs) - warmup]:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            times.append(time.perf_counter() - t0)
    finally:
        gc.enable()
    times.sort()
    return times[len(times) // 2] * 1e3  # median ms


def main():
    import jax
    import jax.numpy as jnp

    from kornia_tpu.ops import preprocess as pp
    from kornia_tpu.ops import color, resize, warp, filters
    from kornia_tpu.features import fast, orb, matching

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.integers(0, 256, (1080, 1920, 3), np.uint8))
              for _ in range(10)]
    frame = frames[0]

    results = {}

    # --- headline: fused resize+normalize+CHW 1080p→640² ---
    cfg = pp.PreprocessorConfig(
        out_size=(640, 640),
        normalize=pp.NormalizeMode.MEAN_STD,
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
    )
    fused = jax.jit(lambda x: pp.resize_normalize_to_tensor(x, cfg))
    results["fused_preprocess_1080p_to_640"] = _bench(fused, frames)

    # --- supporting ops (reported to stderr for the record) ---
    gray_fn = jax.jit(lambda x: color.rgb_to_gray(x))
    results["gray_from_rgb_1080p"] = _bench(gray_fn, frames)

    rs_fn = jax.jit(lambda x: resize.resize(x, (540, 960), "bilinear"))
    results["resize_half_bilinear_1080p"] = _bench(rs_fn, frames)

    gauss_fn = jax.jit(lambda x: filters.gaussian_blur(x, (5, 5), 1.5))
    results["gaussian5x5_1080p"] = _bench(gauss_fn, frames)

    # NB: m must be a runtime argument — captured as a jit constant, XLA
    # folds the index maps into 16 MB literal arrays and the gather takes
    # the slow opaque-index path (70 ms vs 0.08 ms, measured on v5e).
    m = jnp.asarray([[0.9, 0.2, 10.0], [-0.1, 1.05, -5.0]], jnp.float32)
    warp_fn = jax.jit(lambda x, mm: warp.warp_affine(x, mm, (1080, 1920)))
    results["warp_affine_1080p"] = _bench(lambda x: warp_fn(x, m), frames)

    grays = [gray_fn(f)[..., 0] for f in frames]
    fast_fn = jax.jit(lambda g: fast.fast_detect(g, threshold=20.0, max_keypoints=4096))
    results["fast_detect_1080p"] = _bench(fast_fn, grays)

    for k, v in results.items():
        print(f"# {k}: {v:.4f} ms", file=sys.stderr)

    headline = results["fused_preprocess_1080p_to_640"]
    baseline_ms = 0.0968  # reference fused kernel, Orin Nano CUDA (640²)
    print(json.dumps({
        "metric": "fused_preprocess_1080p_to_640",
        "value": round(headline, 4),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / headline, 3),
    }))


if __name__ == "__main__":
    main()
