"""Parse jax.profiler Chrome-format traces into device-op summaries.

The TPU analog of parsing nvprof output on the reference's CUDA stack
(SURVEY.md N9): `jax.profiler.start_trace` emits a gzipped Chrome trace;
these helpers pull out the DEVICE lanes (TPU core pids) and aggregate op
durations.  Used by tools/trace_chunk.py (top-op ledger) and
tools/bench_dense.py (device ms/frame scaling, immune to host/tunnel
transfer noise).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict


def load_latest_trace(out_dir: str) -> list:
    """traceEvents of the most recent *.trace.json.gz under out_dir ([] if none)."""
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return []
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    return trace.get("traceEvents", [])


def device_op_times(events: list) -> tuple[dict[str, float], dict[str, int]]:
    """(total_ms_by_op, call_count_by_op) over the device lanes, excluding
    container spans (jit_* / program) so ops aren't double-counted."""
    pid_name = {e["pid"]: e["args"].get("name", "")
                for e in events if e.get("ph") == "M"
                and e.get("name") == "process_name" and "args" in e}
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n.upper() or "/device" in n.lower()}
    by_op: dict[str, float] = defaultdict(float)
    n_ev: dict[str, int] = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name == "program":
            continue
        by_op[name] += e.get("dur", 0) / 1e3          # us -> ms
        n_ev[name] += 1
    return dict(by_op), dict(n_ev)


def device_total_ms(out_dir: str) -> float:
    """Total device op time (ms) in the latest trace under out_dir."""
    by_op, _ = device_op_times(load_latest_trace(out_dir))
    return sum(by_op.values())
