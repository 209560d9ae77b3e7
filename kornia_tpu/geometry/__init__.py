"""Geometric vision: Lie groups, cameras, epipolar geometry, PnP, RANSAC,
triangulation, ICP (the TPU re-design of kornia-algebra + kornia-3d)."""

from kornia_tpu.geometry import liegroup
from kornia_tpu.geometry import linalg
from kornia_tpu.geometry import camera
from kornia_tpu.geometry import epipolar
from kornia_tpu.geometry import triangulation
from kornia_tpu.geometry import ransac
from kornia_tpu.geometry import pnp
from kornia_tpu.geometry import twoview
from kornia_tpu.geometry import icp
from kornia_tpu.geometry import stereo

__all__ = [
    "stereo",
    "liegroup",
    "linalg",
    "camera",
    "epipolar",
    "triangulation",
    "ransac",
    "pnp",
    "twoview",
    "icp",
]
