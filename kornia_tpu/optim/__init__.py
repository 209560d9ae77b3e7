"""Non-linear least squares: LM, bundle adjustment (Schur), pose-graph
optimization (the TPU re-design of kornia-algebra/optim + kornia-3d
ba/ba_schur/pgo)."""

from kornia_tpu.optim import losses
from kornia_tpu.optim import lm
from kornia_tpu.optim import ba
from kornia_tpu.optim import pgo

__all__ = ["losses", "lm", "ba", "pgo"]
