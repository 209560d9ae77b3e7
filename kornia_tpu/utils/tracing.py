"""Tracing / stage timing (reference behavior: SURVEY.md §5.1).

The reference's observability is (a) env-gated per-stage ms printouts
(KORNIA_ORB_TRACE) and (b) env-var kernel-variant switches. TPU
equivalents here: a `stage` context manager that times with
``block_until_ready`` when ``KORNIA_TPU_TRACE`` is set, a ``Tracer``
accumulating per-stage stats, and a thin ``profile_trace`` wrapper over
``jax.profiler`` for deep dives.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

TRACE_ENV = "KORNIA_TPU_TRACE"


def trace_enabled() -> bool:
    return bool(os.environ.get(TRACE_ENV))


class Tracer:
    """Accumulates wall-time per named stage.

    >>> tracer = Tracer(force=True)
    >>> with tracer.stage("gray"):
    ...     out = jax.block_until_ready(fn(x))
    >>> tracer.summary()   # {'gray': {'count': 1, 'total_ms': ..., ...}}
    """

    def __init__(self, force: bool = False, stream=None):
        self.enabled = force or trace_enabled()
        self.stream = stream if stream is not None else sys.stderr
        self._acc: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync: object = None) -> Iterator[None]:
        """Time a stage; pass device arrays via `sync` to include their
        completion (block_until_ready) in the measurement."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = (time.perf_counter() - t0) * 1e3
        self._acc[name].append(dt)
        print(f"[trace] {name}: {dt:.3f} ms", file=self.stream)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, times in self._acc.items():
            out[name] = {
                "count": len(times),
                "total_ms": sum(times),
                "mean_ms": sum(times) / len(times),
                "min_ms": min(times),
            }
        return out

    def reset(self) -> None:
        self._acc.clear()


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def env_variant(name: str, default: str) -> str:
    """Kernel-variant switch (reference: KORNIA_FAST_NEON-style env gates).

    Reads KORNIA_TPU_<NAME>; returns `default` when unset.
    """
    return os.environ.get(f"KORNIA_TPU_{name.upper()}", default)
