"""AprilTag detection + pose (TPU re-design of crates/kornia-apriltag).

Dense threshold on TPU, irregular CCL in native C++, vectorized host
clustering/decode; 9 tag families vendored as data tables.
"""

from kornia_tpu.apriltag.families import (
    FAMILY_NAMES,
    TagFamily,
    get_family,
    render_tag,
)
from kornia_tpu.apriltag.threshold import adaptive_threshold
from kornia_tpu.apriltag.detector import (
    AprilTagDecoder,
    Detection,
    DetectorConfig,
)
from kornia_tpu.apriltag.pose import (
    TagPose,
    TagPosePair,
    estimate_tag_pose,
)

__all__ = [
    "FAMILY_NAMES",
    "TagFamily",
    "get_family",
    "render_tag",
    "adaptive_threshold",
    "AprilTagDecoder",
    "Detection",
    "DetectorConfig",
    "TagPose",
    "TagPosePair",
    "estimate_tag_pose",
]
