"""Device tracing: jax.profiler integration.

The reference ships only a commented-out chrono Timer
(extensions/Timer.hpp:5-63, include disabled at association.cpp:11) and
wall-clock ETA logging (exps/stage3_root2/train.py:96-102). The TPU-native
equivalent is the XLA profiler: traces capture per-op device timelines,
HLO names and memory, viewable in TensorBoard's profile plugin / xprof /
Perfetto.

Usage: pass ``--profile-dir`` to scripts/train_smap.py or
scripts/test_smap.py, or wrap any region::

    from smap_tpu.utils.profiling import trace
    with trace("/tmp/prof"):
        state, losses = step(state, batch)

Traces are written once per context entry; ``StepWindowProfiler`` bounds
a training capture to a step window so the file stays small.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op when falsy)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-span inside an active trace (shows up on the timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepWindowProfiler:
    """Trace a [start, stop) step window of a training loop.

    Mirrors the usual xprof capture recipe: start at ``first_step``,
    stop ``num_steps`` later. Inert when ``log_dir`` is falsy.
    """

    def __init__(self, log_dir: Optional[str], first_step: int = 10,
                 num_steps: int = 5):
        # A zero-width window must be inert (otherwise the start branch at
        # it == first_step wins and one step is captured anyway).
        self.log_dir = log_dir if num_steps > 0 else None
        self.first = first_step
        self.last = first_step + num_steps
        self._active = False

    def step(self, it: int, window: int = 1) -> None:
        """Advance to iteration ``it``; ``window`` > 1 when the caller
        executes several steps per call (steps-per-execution), so the
        start boundary triggers when ``first_step`` falls anywhere inside
        the executed window (it - window, it]."""
        if not self.log_dir:
            return
        import jax

        if it - window < self.first <= it and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif it >= self.last and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
