"""Tracing / profiling hooks (SURVEY.md section 5.1).

The reference had at most ``time.time()`` prints; here profiling is
first-class:

- ``trace(log_dir)``: context manager wrapping ``jax.profiler.trace``
  with perfetto output (the dump ``bench.py``'s device timing parses).
- ``scope(name)``: ``jax.named_scope`` alias used around the cascade
  stages, the fused warp and the pipeline phases so traces read in
  model terms rather than HLO fusion ids.
- ``wall_breakdown``: tiny helper accumulating host-side phase times
  (decode vs H2D vs compute) for the bench CLI.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator

import jax

scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class wall_breakdown:
    """Accumulate wall-clock per phase: ``with wb.phase("decode"): ...``"""

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)
