"""Bag-of-words place recognition (TPU re-design of crates/kornia-bow)."""

from kornia_tpu.bow.vocabulary import Vocabulary
from kornia_tpu.bow.scoring import (
    SCORES,
    score_l1,
    score_l2,
    score_dot,
    score_chi_square,
    score_bhattacharyya,
    score_kl,
)
from kornia_tpu.bow.database import BowDatabase, QueryResult

__all__ = [
    "Vocabulary",
    "BowDatabase",
    "QueryResult",
    "SCORES",
    "score_l1",
    "score_l2",
    "score_dot",
    "score_chi_square",
    "score_bhattacharyya",
    "score_kl",
]
