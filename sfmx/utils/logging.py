"""Structured observability (SURVEY §5.5): JSON-lines stage metrics + scopes.

The reference logs free text to stdout; here every pipeline stage emits one
JSON record with its north-star metrics (#features, #matches, #inliers,
reprojection RMSE, BA iters/s, frames/s) so runs are machine-comparable.
`jax.profiler` traces can be enabled around any scope with SFMX_TRACE_DIR.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class StageLogger:
    def __init__(self, stream=None, run_id: str | None = None):
        self._stream = stream  # None = resolve sys.stderr at log time
        self.run_id = run_id or f"run{int(time.time())}"

    @property
    def stream(self):
        return self._stream if self._stream is not None else sys.stderr

    def log(self, stage: str, **metrics):
        rec = {"ts": round(time.time(), 3), "run": self.run_id, "stage": stage}
        rec.update(metrics)
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()

    @contextlib.contextmanager
    def scope(self, stage: str, **extra):
        """Times a stage; optionally captures a jax.profiler trace."""
        import jax

        trace_dir = os.environ.get("SFMX_TRACE_DIR")
        t0 = time.perf_counter()
        ctx = (
            jax.profiler.trace(os.path.join(trace_dir, stage))
            if trace_dir
            else contextlib.nullcontext()
        )
        with ctx:
            with jax.named_scope(stage):
                out = {}
                yield out
        self.log(stage, wall_s=round(time.perf_counter() - t0, 4), **extra, **out)


LOGGER = StageLogger()
