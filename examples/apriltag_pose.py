"""Baseline config 3: AprilTag detection + 6-DOF pose over a sequence.

Reference: examples/apriltag + apriltag_pose (SURVEY.md §3.5).
Runs on the reference photo fixture by default, or renders a synthetic
moving-tag sequence with --synthetic.

    python examples/apriltag_pose.py [--image PATH | --synthetic N]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
from examples._common import APRILTAG_JPG, base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--image", default=APRILTAG_JPG)
    p.add_argument("--synthetic", type=int, default=0,
                   help="render an N-frame synthetic sequence instead")
    p.add_argument("--tag-size", type=float, default=0.16)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import cv2

    from kornia_tpu import apriltag as at

    k = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    det = at.AprilTagDecoder()

    if args.synthetic:
        fam = at.get_family("tag36h11")
        tag = at.render_tag(fam, 42, scale=20)
        s = tag.shape[0]
        src = np.array([[s * .1, s * .1], [s * .9, s * .1],
                        [s * .9, s * .9], [s * .1, s * .9]], np.float32)
        for i in range(args.synthetic):
            z = 0.8 + 0.05 * i
            half = args.tag_size / 2
            obj = np.array([[-half, -half, 0], [half, -half, 0],
                            [half, half, 0], [-half, half, 0]])
            cam = obj + [0.02 * i, 0, z]
            px = cam @ k.T
            px = (px[:, :2] / px[:, 2:]).astype(np.float32)
            h, _ = cv2.findHomography(src, px)
            frame = cv2.warpPerspective(tag, h, (640, 480), borderValue=255)
            ds = det.decode(frame)
            if not ds:
                print(f"frame {i}: no detection")
                continue
            pose = at.estimate_tag_pose(ds[0], k, args.tag_size)
            t = pose.best.translation
            print(f"frame {i}: id {ds[0].tag_id} "
                  f"t=({t[0]:+.3f}, {t[1]:+.3f}, {t[2]:.3f}) m "
                  f"ambiguity {pose.ambiguity:.2f}")
        return

    gray = cv2.imread(args.image, cv2.IMREAD_GRAYSCALE)
    if gray is None:
        raise SystemExit(f"cannot read {args.image}")
    ds = det.decode(gray)
    print(f"{len(ds)} tags detected")
    for d in ds:
        pose = at.estimate_tag_pose(d, k, args.tag_size)
        t = pose.best.translation
        print(f"  id {d.tag_id} ham {d.hamming} "
              f"center ({d.center[0]:.0f}, {d.center[1]:.0f}) "
              f"t=({t[0]:+.2f}, {t[1]:+.2f}, {t[2]:.2f})")


if __name__ == "__main__":
    main()
