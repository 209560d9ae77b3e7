"""Benchmark harness — prints ONE JSON line for the driver.

Methodology: the SLOPE instrument (PERF_NOTES.md §Methodology). The axon
tunnel defeats naive timing three ways: `block_until_ready` doesn't
block (only a value fetch does), identical (program, input) executions
are memoized, and partially-consumed outputs get dead-code-sliced. So
each op runs K times *inside one lax.scan program* with a chained data
dependency and full-output consumption; cost = the slope of fetched
wall time between two K values.

Trust hardening (round 2 — the round-1 record contained a negative
time and a faster-than-light fused-preprocess number):
  * every operand (including warp matrices and undistortion maps) is
    threaded as a runtime argument — a jitted program closing over a
    device array costs ~34 ms/dispatch and poisons the process;
  * ΔK is sized per op from a pilot measurement so that ΔK*cost covers
    dispatch jitter (~±2 ms) at least 30x;
  * each op is measured by three independent slopes; the median is
    reported and the spread recorded;
  * every op declares a physical floor (bytes moved at the v5e's
    ~819 GB/s HBM bandwidth); a measurement below floor or <= 0 is
    re-measured with doubled ΔK and, if still unphysical, reported
    with "suspect": true rather than silently recorded.

All rows are emitted in the JSON line under "rows"; the headline
remains the reference's flagship fused kernel (1080p RGB u8 -> 640x640
normalized CHW f32; 0.0968 ms on Orin Nano CUDA,
benchmark-cuda-color-conversions.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_HBM_GBPS = 819.0     # v5e HBM bandwidth; floors use ~90% of it
_JITTER_MS = 2.0      # dispatch jitter through the axon tunnel


_RUNNER_CACHE = {}


def _make_runner(op, n):
    import jax
    import jax.numpy as jnp

    key = (id(op), n)
    if key in _RUNNER_CACHE:
        return _RUNNER_CACHE[key]

    @jax.jit
    def run(args, seed):
        a0 = args[0] + seed.astype(args[0].dtype)
        rest = args[1:]

        def body(carry, _):
            out = op(carry, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            probe = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            bump = (probe * jnp.float32(1e-30)).astype(carry.dtype)
            return carry + bump, probe

        _, probes = jax.lax.scan(body, a0, None, length=n)
        return probes.sum()

    _RUNNER_CACHE[key] = run
    return run


def _slope_once(op, args, k0, k1, seed0):
    import jax.numpy as jnp

    times = {}
    for n in (k0, k1):
        fn = _make_runner(op, n)
        float(fn(args, jnp.float32(seed0)))          # compile + warm
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            float(fn(args, jnp.float32(seed0 + 1 + i)))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[k1] - times[k0]) / (k1 - k0) * 1e3


def measure(name, op, args, floor_ms, est_hint=None,
            pilot_k=(2, 10), budget_ms=4000.0):
    """Median-of-3 slope with per-op dK sizing and a physics gate.

    est_hint skips the pilot measurement (2 compiles) when the op's
    rough cost is known; the gate still catches a wrong hint."""
    if est_hint is None:
        est_hint = _slope_once(op, args, *pilot_k, seed0=11)
    est = max(est_hint, floor_ms, 1e-3)
    dk = int(min(max(30.0 * _JITTER_MS / est, 8), budget_ms / est))
    k0 = max(2, dk // 16)
    k1 = k0 + dk
    slopes = sorted(
        _slope_once(op, args, k0, k1, seed0=100 + 37 * i)
        for i in range(3))
    med = slopes[1]
    suspect = False
    if med <= 0 or med < floor_ms:
        k1 = k0 + 2 * dk
        slopes = sorted(
            _slope_once(op, args, k0, k1, seed0=500 + 37 * i)
            for i in range(3))
        med = slopes[1]
        suspect = med <= 0 or med < floor_ms
    row = {
        "ms": round(med, 4),
        "spread": round(slopes[2] - slopes[0], 4),
        "floor_ms": round(floor_ms, 4),
    }
    if suspect:
        row["suspect"] = True
    print(f"# {name}: {med:.4f} ms (floor {floor_ms:.4f}, "
          f"spread {slopes[2]-slopes[0]:.4f}"
          f"{', SUSPECT' if suspect else ''})", file=sys.stderr)
    return name, row


def _floor(read_bytes, write_bytes):
    return (read_bytes + write_bytes) / (_HBM_GBPS * 0.95 * 1e6)


def _ops():
    """Yield (name, op, args, floor_ms) lazily; import inside so the
    subprocess only pays for what it runs."""
    import jax
    import jax.numpy as jnp

    from kornia_tpu.ops import preprocess as pp
    from kornia_tpu.ops import color, resize, filters, histogram
    from kornia_tpu.ops.warp_pallas import (
        warp_affine_exact, remap_exact)
    from kornia_tpu.features import fast, orb, matching
    from kornia_tpu.geometry import camera

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (1080, 1920, 3), np.uint8))
    gray = jnp.asarray(rng.integers(0, 256, (1080, 1920), np.uint8))
    grayf = jnp.asarray(
        rng.integers(0, 256, (1080, 1920)).astype(np.float32))
    px = 1080 * 1920
    out = []

    def add(name, op, args, floor_ms, est=None):
        out.append((name, op, args, floor_ms, est))

    # --- headline: fused resize+normalize+CHW 1080p→640² ---
    cfg = pp.PreprocessorConfig(
        out_size=(640, 640),
        normalize=pp.NormalizeMode.MEAN_STD,
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
    )
    add("fused_preprocess_1080p_to_640", 
        lambda x: pp.resize_normalize_to_tensor(x, cfg), (rgb,),
        _floor(3 * px, 3 * 640 * 640 * 4))

    add("gray_from_rgb_1080p",  color.rgb_to_gray, (rgb,),
        _floor(3 * px, px))
    add("resize_half_bilinear_1080p", 
        lambda x: resize.resize(x, (540, 960), "bilinear"), (gray,),
        _floor(px, px // 4))
    add("gaussian5x5_1080p", 
        lambda x: filters.gaussian_blur(
            x.astype(jnp.float32)[..., None], (5, 5), 1.5), (gray,),
        _floor(px, 4 * px))
    add("histogram_u8_1080p",  histogram.histogram_u8, (gray,),
        _floor(px, 256 * 4))

    # --- exact warp/remap (Pallas chunk kernel; fallback=False keeps
    # the scalar-gather branch out of the scanned program) ---
    m = jnp.asarray(
        [[0.866, 0.5, 10.0], [-0.5, 0.866, 300.0]], np.float32)
    add("warp_affine_exact_rot30_1080p",
        lambda x, mm: warp_affine_exact(x, mm, (1080, 1920),
                                        fallback=False),
        (grayf, m), _floor(8 * px, 4 * px))
    # near-axis maps ride the mapless direct path (coefficients
    # evaluated in-register; no map arrays) — the common library case
    m2 = jnp.asarray(
        [[1.2, 0.02, -8.0], [-0.02, 1.2, 12.0]], np.float32)
    add("warp_affine_exact_scale_1080p",
        lambda x, mm: warp_affine_exact(x, mm, (1080, 1920),
                                        fallback=False),
        (grayf, m2), _floor(5 * px, 4 * px))
    k = jnp.asarray([[800.0, 0, 960], [0, 800, 540], [0, 0, 1]],
                    jnp.float32)
    dist = jnp.asarray([0.08, -0.03, 0.001, 0.001, 0.0], jnp.float32)
    mapx, mapy = camera.generate_correction_map_polynomial(
        k, dist, (1080, 1920))
    # nsel=4 mirrors undistort_image's configuration (smooth maps)
    add("remap_undistort_1080p",
        lambda x, a, b: remap_exact(x, a, b, nsel=4, fallback=False),
        (grayf, mapx, mapy), _floor(8 * px, 4 * px))

    # --- front-end ---
    add("fast_detect_1080p", 
        lambda g: fast.fast_detect(
            g, threshold=20.0, max_keypoints=4096).xy, (gray,),
        _floor(px, 0))
    g640 = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    add("orb_2000kp_480x640", 
        lambda g: orb.orb_detect_and_describe(g), (g640,),
        _floor(480 * 640, 0))
    bits_a = jnp.asarray(
        rng.integers(0, 2, (1024, 256)).astype(np.uint8))
    bits_b = jnp.asarray(
        rng.integers(0, 2, (1024, 256)).astype(np.uint8))
    add("hamming_match_1024",
        lambda a, b: matching.match_descriptors(a, b),
        (bits_a, bits_b), 1e-4)

    # --- pyramidal LK (method="auto" = whatever ships as the TPU
    # default, so a default-path regression is visible here; the gather
    # formulation measures 2320 ms on this fixture — PERF_NOTES) ---
    from kornia_tpu.ops import optical_flow as oflow

    import scipy.ndimage as ndi

    lk0 = ndi.gaussian_filter(
        rng.standard_normal((480, 752)), 2.0).astype(np.float32) * 100
    lk1 = np.roll(lk0, (2, 3), axis=(0, 1)).astype(np.float32)
    lk_pts = np.stack([rng.uniform(20, 732, 1024),
                       rng.uniform(20, 460, 1024)], 1).astype(np.float32)
    lk_params = oflow.PyrLKParams(window=21, max_level=3)
    add("lk_flow_1024pts_480p",
        lambda a, b, p: oflow.calc_optical_flow_pyr_lk(
            a, b, p, lk_params, method="auto").points,
        (jnp.asarray(lk0), jnp.asarray(lk1), jnp.asarray(lk_pts)),
        0.01)
    # realistic convergent motion (VERDICT r4 item 6): subpixel shift
    # on the same texture — the batched while_loop exits when ALL
    # points meet eps, so this measures the practical cost the
    # adversarial row (a worst-case never-converging batch) bounds
    lk1c = ndi.shift(lk0, (0.6, -0.4), order=3).astype(np.float32)
    add("lk_flow_convergent_1024pts_480p",
        lambda a, b, p: oflow.calc_optical_flow_pyr_lk(
            a, b, p, lk_params, method="auto").points,
        (jnp.asarray(lk0), jnp.asarray(lk1c), jnp.asarray(lk_pts)),
        0.01)
    # practical static-bound config: max_iters=10 returns flows
    # identical to max_iters=30 within 1e-4 px on both fixtures
    # (PERF_NOTES round 5e — on TPU a small STATIC bound beats the
    # data-dependent while exit, which XLA cannot pipeline)
    lk_params10 = oflow.PyrLKParams(window=21, max_level=3,
                                    max_iters=10)
    add("lk_flow_mi10_1024pts_480p",
        lambda a, b, p: oflow.calc_optical_flow_pyr_lk(
            a, b, p, lk_params10, method="auto").points,
        (jnp.asarray(lk0), jnp.asarray(lk1c), jnp.asarray(lk_pts)),
        0.01)

    return out


_EST_HINTS = {
    "fused_preprocess_1080p_to_640": 0.08,
    "gray_from_rgb_1080p": 0.02,
    "resize_half_bilinear_1080p": 0.03,
    "gaussian5x5_1080p": 0.06,
    "histogram_u8_1080p": 0.07,
    "warp_affine_exact_rot30_1080p": 0.87,
    "warp_affine_exact_scale_1080p": 0.38,
    "remap_undistort_1080p": 0.43,
    "fast_detect_1080p": 0.37,
    "orb_2000kp_480x640": 1.6,
    "hamming_match_1024": 0.15,
    "lk_flow_1024pts_480p": 28.0,
    "lk_flow_convergent_1024pts_480p": 11.0,
    "lk_flow_mi10_1024pts_480p": 4.0,
}

# ops grouped per subprocess: enough isolation that one worker crash
# cannot take down the whole record, few enough processes to keep the
# round's bench wall time bounded
_GROUPS = [
    ["fused_preprocess_1080p_to_640", "gray_from_rgb_1080p",
     "resize_half_bilinear_1080p", "gaussian5x5_1080p",
     "histogram_u8_1080p"],
    ["warp_affine_exact_rot30_1080p", "warp_affine_exact_scale_1080p",
     "remap_undistort_1080p"],
    ["fast_detect_1080p", "orb_2000kp_480x640", "hamming_match_1024",
     "lk_flow_1024pts_480p", "lk_flow_convergent_1024pts_480p",
     "lk_flow_mi10_1024pts_480p"],
]


def _run_group(names):
    wanted = set(names.split(","))
    for item in _ops():
        n, op, args, floor_ms = item[0], item[1], item[2], item[3]
        if n in wanted:
            try:
                key, row = measure(n, op, args, floor_ms,
                                   est_hint=_EST_HINTS.get(n))
            except Exception as e:  # keep the rest of the group alive
                key, row = n, {"error": str(e)[:120]}
            print("ROW " + json.dumps({key: row}), flush=True)


def main():
    """Each op runs in its own subprocess: a kernel fault or worker
    crash in one op cannot destroy the rest of the record (observed:
    the tunnel worker dies after ~8 heavy pallas programs in one
    process). Compiles are server-side cached, so the per-process
    compile cost is paid once per round."""
    import subprocess

    rows = {}
    for grp in _GROUPS:
        try:
            res = subprocess.run(
                [sys.executable, __file__, "--group", ",".join(grp)],
                capture_output=True, text=True, timeout=1500)
            for line in res.stdout.splitlines():
                if line.startswith("ROW "):
                    rows.update(json.loads(line[4:]))
            for line in res.stderr.splitlines():
                if line.startswith("#"):
                    print(line, file=sys.stderr)
        except subprocess.TimeoutExpired as e:
            for line in (e.stdout or "").splitlines():
                if line.startswith("ROW "):
                    rows.update(json.loads(line[4:]))
        for n in grp:
            if n not in rows:
                rows[n] = {"error": "missing (crash/timeout)"}
                print(f"# {n}: ERROR missing", file=sys.stderr)

    head = rows.get("fused_preprocess_1080p_to_640", {})
    headline = head.get("ms", float("nan"))
    baseline_ms = 0.0968  # reference fused kernel, Orin Nano CUDA
    vs = round(baseline_ms / headline, 3) if headline == headline \
        and headline > 0 else None
    print(json.dumps({
        "metric": "fused_preprocess_1080p_to_640",
        "value": headline,
        "unit": "ms",
        "vs_baseline": vs,
        "rows": rows,
        "protocol_note": (
            "slope method: K in-program reps, chained dependency, "
            "full-output fetch; each row is median-of-3 slopes and "
            "INCLUDES per-iteration dispatch overhead that PERF_NOTES' "
            "isolated stage slopes exclude — expect rows ~0.02-0.06 ms "
            "above the stage-sum, and differences within 'spread' are "
            "not regressions (tunnel jitter; the orb row varies "
            "~0.1 ms between processes)"),
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--group":
        _run_group(sys.argv[2])
    else:
        main()
