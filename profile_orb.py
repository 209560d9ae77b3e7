"""Per-stage slope profile of ORB detection on the real TPU (VERDICT r3
item 3: fast_detect_1080p <= 0.15 ms, orb_2000kp_480x640 <= 0.8 ms)."""
import json
import sys

import numpy as np

from bench import measure


def main():
    import jax
    import jax.numpy as jnp

    from kornia_tpu.features import fast, orb
    from kornia_tpu.features.orb import (
        OrbConfig, _level_budgets, _select_level, _extract_windows,
        orientation_from_windows, brief_from_windows)
    from kornia_tpu.ops.filters import gaussian_blur
    from kornia_tpu.ops.resize import resize

    rng = np.random.default_rng(0)
    gray1080 = jnp.asarray(rng.integers(0, 256, (1080, 1920), np.uint8))
    gray = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    cfg = OrbConfig(n_features=2000, n_levels=8)
    budgets = _level_budgets(cfg)

    results = {}

    def run(name, op, args, floor=1e-4, est=None):
        n, row = measure(name, op, args, floor, est_hint=est)
        results[n] = row

    # headline rows as-shipped
    run("fast_detect_1080p",
        lambda g: fast.fast_detect(g, 20.0, 2048).xy, (gray1080,),
        est=0.35)
    run("orb_full", lambda g: orb.orb_detect_and_describe(g, cfg).xy,
        (gray,), est=1.4)

    # pyramid
    def pyramid(g):
        levels = [g]
        h, w = g.shape
        for i in range(1, cfg.n_levels):
            s = cfg.scale_factor**i
            levels.append(resize(levels[-1],
                                 (int(round(h / s)), int(round(w / s))),
                                 mode="bilinear"))
        return [l.sum() for l in levels]
    run("pyramid8", pyramid, (gray,), est=0.1)

    def levels_of(g):
        levels = [g]
        h, w = g.shape
        for i in range(1, cfg.n_levels):
            s = cfg.scale_factor**i
            levels.append(resize(levels[-1],
                                 (int(round(h / s)), int(round(w / s))),
                                 mode="bilinear"))
        return levels

    # detect all levels (score+nms+cells+topk, no harris/describe)
    def detect_all(g):
        out = []
        for img, b in zip(levels_of(g), budgets):
            lh, lw = img.shape
            n_cells = (-(-lh // cfg.cell_size)) * (-(-lw // cfg.cell_size))
            per_cell = max(2, -(-2 * b // n_cells))
            kps = fast.fast_detect_cells(
                img, cell_size=cfg.cell_size,
                threshold_high=cfg.fast_threshold_high,
                threshold_low=cfg.fast_threshold_low, per_cell=per_cell)
            out.append(kps.score.sum())
        return out
    run("detect8", detect_all, (gray,), est=0.6)

    # score+nms only, all levels
    def score_all(g):
        from kornia_tpu.features.fast import _score_nms_dispatch
        return [_score_nms_dispatch(img, 7.0, 9).sum()
                for img in levels_of(g)]
    run("score_nms8", score_all, (gray,), est=0.4)

    # blur all levels
    def blur_all(g):
        return [gaussian_blur(img.astype(jnp.float32)[..., None],
                              (7, 7), 2.0).sum()
                for img in levels_of(g)]
    run("blur8", blur_all, (gray,), est=0.1)

    # per-stage at K=2000 on one 480p frame
    gf = gray.astype(jnp.float32)
    xy = jnp.asarray(
        rng.integers(16, 460, (2000, 2)).astype(np.int32))
    run("extract_windows_2000",
        lambda g, p: _extract_windows(g, p).sum(),
        (gf, xy), est=0.1)
    win = _extract_windows(gf, xy)
    run("orientation_2000",
        lambda w: orientation_from_windows(w).sum(), (win,), est=0.1)
    ang = orientation_from_windows(win)
    run("brief_2000",
        lambda w, a: brief_from_windows(w, a).astype(jnp.float32).sum(),
        (win, ang), est=0.2)

    # harris at 2x budget
    from kornia_tpu.features.responses import harris_at_windows
    xy4k = jnp.asarray(
        rng.integers(16, 460, (4000, 2)).astype(np.int32))
    run("harris_4000",
        lambda g, p: harris_at_windows(g, p).sum(), (gf, xy4k), est=0.15)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
