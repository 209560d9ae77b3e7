"""Dense pixel operations (the TPU re-design of crates/kornia-imgproc).

Every op is a pure, jittable, batch-polymorphic function on arrays:
inputs are ``(..., H, W, C)`` (HWC) unless documented otherwise. u8 inputs
follow the reference's u8 semantics (compute in f32/i32, round, clamp);
f32 inputs are assumed in [0, 1] unless documented.

XLA fuses elementwise chains automatically; Pallas kernels back the few
fusion-limited hot paths (see kornia_tpu.ops.preprocess / features.fast).
"""

from kornia_tpu.ops import color
from kornia_tpu.ops import resize
from kornia_tpu.ops import warp
from kornia_tpu.ops import filters
from kornia_tpu.ops import interpolation
from kornia_tpu.ops import enhance
from kornia_tpu.ops import normalize
from kornia_tpu.ops import threshold
from kornia_tpu.ops import morphology
from kornia_tpu.ops import pyramid
from kornia_tpu.ops import geometry_utils
from kornia_tpu.ops import yuv
from kornia_tpu.ops import metrics
from kornia_tpu.ops import preprocess
from kornia_tpu.ops import histogram
from kornia_tpu.ops import canny
from kornia_tpu.ops import draw
from kornia_tpu.ops import bayer
from kornia_tpu.ops import connected_components
from kornia_tpu.ops import contours
from kornia_tpu.ops import distance_transform
from kornia_tpu.ops import optical_flow
from kornia_tpu.ops import depth
from kornia_tpu.ops import segmentation
from kornia_tpu.ops import pallas_kernels

__all__ = [
    "depth",
    "segmentation",
    "pallas_kernels",
    "bayer",
    "connected_components",
    "contours",
    "distance_transform",
    "optical_flow",
    "color",
    "resize",
    "warp",
    "filters",
    "interpolation",
    "enhance",
    "normalize",
    "threshold",
    "morphology",
    "pyramid",
    "geometry_utils",
    "yuv",
    "metrics",
    "preprocess",
    "histogram",
    "canny",
    "draw",
]
