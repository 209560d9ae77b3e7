"""Video read → per-frame TPU processing → video write loop.

Reference: examples/video_player + examples/video_write(_tasks)
(GStreamer read/process/write loops). Here the container path is the
built-in codec-free MJPEG/AVI muxer/demuxer (io/mjpeg_avi.py), the
per-frame op is a jitted gray+Sobel edge overlay, and FpsCounter
reports the loop rate.

    python examples/video_player.py [--video in.avi] [--out out.avi]
                                    [--frames 8] [--cpu]

With no --video, a synthetic moving-square clip is generated first so
the demo always runs headless.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
from examples._common import base_parser, configure_backend


def _synth_clip(path: str, n: int = 8, h: int = 240, w: int = 320) -> None:
    from kornia_tpu.io import VideoWriter

    yy, xx = np.mgrid[0:h, 0:w]
    with VideoWriter(path, fps=20.0, size_hw=(h, w), codec="mjpg") as vw:
        for i in range(n):
            f = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                          np.full((h, w), 30)], -1).astype(np.uint8)
            x0 = 20 + 30 * i
            f[80:160, x0:x0 + 60] = (240, 60, 60)
            vw.write(f)


def main() -> int:
    p = base_parser("video player: read, process on TPU, write")
    p.add_argument("--video", default=None, help="input video path")
    p.add_argument("--out", default=None, help="output video path")
    p.add_argument("--frames", type=int, default=0,
                   help="stop after N frames (0 = all)")
    args = p.parse_args()
    configure_backend(args)

    import jax
    import jax.numpy as jnp

    from kornia_tpu.io import FpsCounter, VideoReader, VideoWriter
    from kornia_tpu.ops.color import rgb_to_gray
    from kornia_tpu.ops.filters import sobel

    video = args.video
    if video is None:
        video = os.path.join(tempfile.mkdtemp(prefix="kornia_vp_"),
                             "clip.avi")
        _synth_clip(video)
        print(f"synthesized clip: {video}")
    out_path = args.out or os.path.join(
        os.path.dirname(video), "processed.avi")

    @jax.jit
    def edge_overlay(rgb_u8):
        g = rgb_to_gray(rgb_u8).squeeze(-1).astype(jnp.float32)
        gx = sobel(g, 1, 0)
        gy = sobel(g, 0, 1)
        mag = jnp.sqrt(gx * gx + gy * gy)
        mag = jnp.clip(mag / (mag.max() + 1e-6) * 255.0, 0, 255)
        edge = mag.astype(jnp.uint8)
        out = rgb_u8.astype(jnp.float32) * 0.5
        out = out.at[..., 1].add(0.5 * edge.astype(jnp.float32))
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    fps = FpsCounter()
    n = 0
    with VideoReader(video) as vr:
        print(f"input: {vr.n_frames} frames @ {vr.fps:.1f} fps, "
              f"size {vr.size}")
        with VideoWriter(out_path, fps=vr.fps or 20.0, size_hw=vr.size,
                         codec="mjpg") as vw:
            for frame in vr:
                processed = np.asarray(edge_overlay(jnp.asarray(frame)))
                vw.write(processed)
                fps.tick()
                n += 1
                if args.frames and n >= args.frames:
                    break
    print(f"wrote {n} frames to {out_path} ({fps.fps():.1f} loop fps)")
    return 0 if n > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
