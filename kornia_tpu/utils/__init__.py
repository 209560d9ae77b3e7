"""Utilities: tensor-ops parity layer, tracing/stage timing."""

from kornia_tpu.utils import tensor_ops
from kornia_tpu.utils import tracing
from kornia_tpu.utils.tracing import Tracer, env_variant, trace_enabled

__all__ = [
    "tensor_ops",
    "tracing",
    "Tracer",
    "env_variant",
    "trace_enabled",
]
