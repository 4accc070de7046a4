"""Device-true timing utilities (SURVEY.md section 5.1 tracing).

Wall-clock timing of individual dispatches is meaningless in this
environment: the TPU is reached through a tunnel with ~30-100 ms
per-dispatch/transfer latency, and async dispatch makes naive
``block_until_ready`` loops report fantasy numbers (measured 0.09 ms
for a forward whose real device time is 21 ms).

``device_time`` therefore measures on-device: it wraps N executions in
a ``jax.profiler`` trace and sums the TPU "XLA Modules" track —
the actual device occupancy of the compiled module — dividing by the
number of executions.  This is the methodology behind every number in
``bench.py``.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from typing import Callable, Sequence

import jax


def _module_events_ms(trace_dir: str) -> dict:
    """Sum per-module device durations (ms) from a perfetto trace."""
    files = glob.glob(
        os.path.join(trace_dir, "**", "perfetto_trace.json.gz"), recursive=True
    )
    if not files:
        raise RuntimeError(f"no perfetto trace found under {trace_dir}")
    events = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]

    # Identify device pids (process_name "/device:TPU:N") and their
    # "XLA Modules" thread.
    device_tids = set()
    device_pids = {
        e.get("pid")
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in str(e.get("args", {}).get("name", ""))
    }
    for e in events:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in device_pids
            and e.get("args", {}).get("name") == "XLA Modules"
        ):
            device_tids.add((e.get("pid"), e.get("tid")))

    totals: dict = {}
    for e in events:
        if (
            e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in device_tids
            and "dur" in e
        ):
            name = e.get("name", "?")
            totals[name] = totals.get(name, 0.0) + e["dur"] / 1e3
    return totals


def device_time(
    fn: Callable,
    args: Sequence,
    iters: int = 10,
    warmup: int = 2,
) -> float:
    """Seconds of device time per call of ``fn(*args)`` (jitted or not).

    Dispatches ``iters`` executions inside a profiler trace and reads
    the device-track duration, so tunnel dispatch latency and host
    overhead are excluded.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    with tempfile.TemporaryDirectory(prefix="pwstable_trace_") as td:
        jax.profiler.start_trace(td, create_perfetto_trace=True)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        totals = _module_events_ms(td)

    if not totals:
        raise RuntimeError("no device module events captured")
    # The traced jit function dominates; ignore tiny helper modules
    # (transfers, mean computations) by taking the largest total.
    return max(totals.values()) / 1e3 / iters
