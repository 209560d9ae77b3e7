"""Distributed (multi-chip) layer: mesh helpers, sharded Schur BA,
distributed PGO, ragged observation exchange, data-parallel front-end
(the north-star layer the reference lacks — SURVEY.md §2.14/§5.8)."""

from kornia_tpu.parallel import mesh
from kornia_tpu.parallel import ba_dist
from kornia_tpu.parallel import pgo_dist
from kornia_tpu.parallel import exchange
from kornia_tpu.parallel import frontend_dist
from kornia_tpu.parallel import resilience

__all__ = ["mesh", "ba_dist", "pgo_dist", "exchange", "frontend_dist",
           "resilience"]
