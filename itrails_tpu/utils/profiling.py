"""Profiling and timing instrumentation.

The reference's only performance signal is the wall-clock column of
``optimization_history.csv`` (reference optimizer.py:569-572).  Here:

* :func:`trace` wraps a region in a ``jax.profiler`` trace (viewable in
  TensorBoard / XProf) — pass ``--profile DIR`` to the CLIs;
* :class:`StageTimer` collects named wall-clock stages and can be printed
  or written as JSON next to the run artifacts.
"""

from __future__ import annotations

import contextlib
import json
import time

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(log_dir=None):
    """Profile the enclosed region with jax.profiler when ``log_dir`` is
    given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def write(self, path):
        with open(path, "w") as f:
            json.dump({k: round(v, 4) for k, v in self.stages.items()}, f,
                      indent=2)

    def __repr__(self):
        inner = ", ".join(f"{k}={v:.2f}s" for k, v in self.stages.items())
        return f"StageTimer({inner})"
