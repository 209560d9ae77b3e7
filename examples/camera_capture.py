"""Native capture → grayscale → FAST corners live loop.

Reference: examples/v4l (V4L2 webcam loop) + examples/orb_detector's
live-match loop. Works against real hardware (``--uri
v4l2:/dev/video0``) or, headless, against a directory of .ppm/.pgm
frames driven through the SAME native grab API (``--uri dir:PATH``;
default synthesizes a few frames into a temp dir so the demo always
runs).

    python examples/camera_capture.py [--uri v4l2:/dev/video0]
                                      [--frames 10]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
from examples._common import base_parser, configure_backend


def _synth_dir() -> str:
    """Write a few moving-square PPM frames for the virtual camera."""
    import ctypes

    import numpy as np

    from kornia_tpu.native import load_native_library

    d = tempfile.mkdtemp(prefix="kornia_cam_")
    lib = load_native_library()
    fn = lib.kornia_image_write_pnm
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                   ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, (240, 320, 3), np.uint8)
    for i in range(4):
        f = base.copy()
        x = 40 + 50 * i
        f[80:160, x: x + 80] = 255
        fc = np.ascontiguousarray(f)
        fn(os.path.join(d, f"frame_{i}.ppm").encode(),
           fc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           240, 320, 3)
    return d


def main():
    p = base_parser(__doc__)
    p.add_argument("--uri", default=None,
                   help="v4l2:/dev/videoN or dir:PATH (default: "
                        "synthesized virtual camera)")
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--threshold", type=float, default=20.0)
    args = p.parse_args()
    configure_backend(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kornia_tpu.io import FpsCounter, NativeCapture
    from kornia_tpu.ops import color
    from kornia_tpu.features import fast

    uri = args.uri or ("dir:" + _synth_dir())
    step = jax.jit(lambda x: fast.fast_detect(
        color.rgb_to_gray(x)[..., 0], threshold=args.threshold,
        max_keypoints=1024))

    fps = FpsCounter()
    with NativeCapture(uri) as cap:
        for i in range(args.frames):
            rgb = cap.grab_frame()
            kps = step(jnp.asarray(rgb))
            n = int(jnp.sum(kps.mask))
            fps.tick()
            print(f"frame {i}: {rgb.shape[1]}x{rgb.shape[0]} "
                  f"{n} corners  ({fps.fps():.1f} fps)")
    print("done")


if __name__ == "__main__":
    main()
