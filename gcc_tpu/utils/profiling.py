"""Profiling and observability hooks.

The reference's observability is wall-clock meters + TensorBoard
scalars (gcc/utils/misc.py:22-43, train.py:464-477). Here: the same
meters, JSONL metrics (always on), an optional TensorBoard writer, and
a jax.profiler trace context for on-device timeline capture.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """jax.profiler trace over the wrapped block when trace_dir is set."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class TensorBoardWriter:
    """Optional TB scalars (torch's writer, present in this environment;
    silently disabled if unavailable)."""

    def __init__(self, logdir: str | None):
        self._sw = None
        if logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._sw = SummaryWriter(logdir)
            except Exception:
                self._sw = None

    def scalar(self, tag: str, value: float, step: int):
        if self._sw is not None:
            self._sw.add_scalar(tag, value, step)

    def close(self):
        if self._sw is not None:
            self._sw.close()
