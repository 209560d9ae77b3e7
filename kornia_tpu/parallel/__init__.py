"""Multi-chip parallelism (the distributed layer the reference lacks —
SURVEY.md §2.14/§5.8): mesh helpers + sharded Schur-complement bundle
adjustment over `shard_map` with ICI collectives."""

from kornia_tpu.parallel import mesh
from kornia_tpu.parallel import ba_dist

__all__ = ["mesh", "ba_dist"]
