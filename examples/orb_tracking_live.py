"""Live ORB tracking loop with an FPS meter (reference: the
`orb_detector` example's live V4L2 webcam match loop + FpsCounter,
kornia-io/src/fps_counter.rs).

Grabs frames from a camera (`v4l2:/dev/video0`), a directory-backed
virtual camera (`dir:frames/`), or — with no source — a synthetic
panning camera over a textured scene; runs the jitted
pyramid→ORB→match front-end frame to frame; prints tracked-match
counts and the rolling frame rate; optionally writes the matched-track
trajectory view.

    python examples/orb_tracking_live.py [--source dir:frames]
        [--frames 120] [--viz tracks.html]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from examples._common import base_parser, configure_backend


def _synthetic_frames(n, rng):
    import cv2
    import numpy as np

    tex = cv2.resize((rng.random((120, 160)) * 255).astype("uint8"),
                     (1280, 960), interpolation=cv2.INTER_CUBIC)
    for i in range(n):
        x0 = 2 * i
        yield tex[240: 720, x0: x0 + 640]


def main():
    p = base_parser(__doc__)
    p.add_argument("--source", default=None,
                   help="v4l2:/dev/videoN | dir:PATH | camera index; "
                        "default: synthetic panning scene")
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--n-features", type=int, default=800)
    p.add_argument("--viz", default=None, metavar="OUT.html")
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from kornia_tpu.features import matching, orb
    from kornia_tpu.io.fps_counter import FpsCounter

    cfg = orb.OrbConfig(n_features=args.n_features, n_levels=4)
    extract = jax.jit(lambda g: orb.orb_detect_and_describe(g, cfg))

    rng = np.random.default_rng(0)
    if args.source is None:
        frames = _synthetic_frames(args.frames, rng)
        grab = lambda: next(frames)
    else:
        from kornia_tpu.io.video import CameraCapture, NativeCapture

        if args.source.isdigit():
            cap = CameraCapture(int(args.source))
        else:
            cap = NativeCapture(args.source)
        grab = lambda: np.asarray(cap.grab_frame()).mean(-1).astype(
            np.uint8)

    meter = FpsCounter(window=30)
    prev = None
    centers = []
    shape = None
    for i in range(args.frames):
        try:
            g = grab()
        except StopIteration:
            break
        if g.ndim == 3:
            g = g.mean(-1).astype(np.uint8)
        if shape is None:
            shape = g.shape
        feats = extract(jnp.asarray(np.ascontiguousarray(g)))
        if prev is not None:
            m = matching.match_descriptors(
                prev.descriptors, feats.descriptors,
                a_mask=prev.mask, b_mask=feats.mask, cross_check=True)
            nm = int(np.asarray(m.mask).sum())
            ia = np.nonzero(np.asarray(m.mask))[0]
            ib = np.asarray(m.idx)[ia]
            flow = (np.asarray(feats.xy)[ib]
                    - np.asarray(prev.xy)[ia])
            med = np.median(flow, axis=0) if nm else (0.0, 0.0)
            centers.append([float(med[0]), float(med[1]), 0.0])
            meter.tick()
            if i % 10 == 0:
                print(f"frame {i}: {nm} tracked matches, median flow "
                      f"({med[0]:+.1f}, {med[1]:+.1f}) px, "
                      f"{meter.fps():.1f} fps")
        prev = feats

    print(f"done: {meter.fps():.1f} fps over the last "
          f"{min(30, args.frames)} frames")
    if args.viz and centers:
        from kornia_tpu.utils.viz import write_trajectory_html

        traj = np.cumsum(np.asarray(centers), axis=0)
        write_trajectory_html(args.viz, traj,
                              title="orb_tracking_live median-flow path")
        print(f"wrote {args.viz}")


if __name__ == "__main__":
    main()
