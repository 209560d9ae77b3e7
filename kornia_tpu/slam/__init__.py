"""Visual SLAM loop: tracking, mapping, loop closure, evaluation
(the SURVEY.md §7.7 integration layer the reference never assembles)."""

from kornia_tpu.slam.map import Keyframe, SlamMap
from kornia_tpu.slam.system import (
    FrameResult,
    MonocularSlam,
    SlamConfig,
    TrackingState,
)
from kornia_tpu.slam.evaluate import (
    AteResult,
    RpeResult,
    absolute_trajectory_error,
    relative_pose_error,
    umeyama_alignment,
    poses7_to_t44,
)
from kornia_tpu.slam.checkpoint import load_map, save_map

__all__ = [
    "Keyframe",
    "SlamMap",
    "MonocularSlam",
    "SlamConfig",
    "TrackingState",
    "FrameResult",
    "AteResult",
    "RpeResult",
    "absolute_trajectory_error",
    "relative_pose_error",
    "umeyama_alignment",
    "poses7_to_t44",
    "save_map",
    "load_map",
]
