"""kornia_tpu — a TPU-native computer-vision / visual-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
kornia/kornia-rs (see SURVEY.md): dense image kernels, a FAST/ORB feature
front-end, multi-view geometry (PnP / two-view / triangulation / RANSAC),
non-linear least squares (LM, bundle adjustment with Schur complement,
pose-graph optimization), ICP, AprilTag, bag-of-words place recognition,
image/pointcloud/dataset I/O, and a distributed (multi-chip) backend built
on `jax.sharding` + `shard_map` collectives.

Design stance (vs the Rust/CUDA reference):
  * Arrays, not objects — images are plain ``jax.Array`` in HWC (u8) or
    CHW/HWC (f32); a thin :class:`kornia_tpu.image.Image` wrapper carries
    static metadata only.
  * Batched, not branchy — RANSAC / NMS / detection are fixed-shape
    hypothesize-score-topk programs, never data-dependent Python loops.
  * XLA fusion by default; Pallas kernels for the few genuinely
    fusion-limited hot paths (fused preprocess, FAST stencil, Hamming
    matcher).
  * Residency/sharding is explicit: ``NamedSharding`` over a ``Mesh``;
    no implicit cross-host resharding of frame-sized arrays.
"""

__version__ = "0.1.0"

import jax as _jax

# Framework numerics contract (mirrors the reference's bit-exactness
# discipline, kornia-imgproc/src/cuda/mod.rs:8-53): float32 arrays get
# float32 matmul math. TPU's default lowers f32 matmuls to one bf16 MXU
# pass (~8e-3 relative error) — enough to corrupt NN assignment in ICP and
# RANSAC scoring (observed on v5e). Model code that wants MXU-speed bf16
# should use bfloat16 *dtypes*, which this setting does not affect.
_jax.config.update("jax_default_matmul_precision", "highest")

from kornia_tpu import image
from kornia_tpu import ops
from kornia_tpu import features
from kornia_tpu import geometry
from kornia_tpu import optim
from kornia_tpu import io
from kornia_tpu import utils
from kornia_tpu import augmentations
from kornia_tpu import apriltag
from kornia_tpu import bow
from kornia_tpu import parallel
from kornia_tpu import slam
from kornia_tpu import models

__all__ = [
    "image",
    "ops",
    "features",
    "geometry",
    "optim",
    "io",
    "utils",
    "augmentations",
    "apriltag",
    "bow",
    "parallel",
    "slam",
    "models",
    "__version__",
]
