#!/usr/bin/env python
"""Live-mode per-frame latency: p50/p95/p99 + transport-floor decomposition.

The reference claims 11.5/15.5/20.8 ms mean/p95/p99 e2e on its GPU host
(reference TECHNICAL_DESIGN_DOCUMENT.md:1131) with a < 40 ms acceptance
bound (TDD:1107).  On a DIRECTLY-ATTACHED TPU host the packed live path is
device-bound (~4 ms).  In this sandbox every host<->device interaction
crosses a network relay, so this tool measures the floor explicitly:

  rpc_round_trip   - tiny put + fetch (pure relay latency, no payload)
  put_frame        - one packed-I420 720p frame (0.35 MB) put + sync
  fetch_outputs    - one TrackOutputs-sized fetch (~7 KB)
  device_compute   - amortized fused-step time from a chunked dispatch

and then the real per-frame loop at pipeline depth 0/1/2, reporting
p50/p95/p99 of submit->consume latency.  Anything above
(rpc_round_trip x 2 + put_frame + device_compute) is framework overhead;
the decomposition shows which part is relay and which is ours.

Usage: python tools/bench_latency.py [--frames 300] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from rtmodt_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    from rtmodt_tpu.config import load_config
    from rtmodt_tpu.ops.yuv import pack_i420
    from rtmodt_tpu.runtime.pipeline import Pipeline
    from rtmodt_tpu.utils.synthetic import moving_boxes_frame

    cfg = load_config(overrides={
        "detection": {"model": "yolov8s", "input_size": 640},
        "profiling": {"per_stage": False, "warmup_frames": 10, "log_interval": 0},
        "visualization": {"enabled": False},
        "events": {"enabled": True},
    })
    pipe = Pipeline(cfg)
    h, w = 720, 1280
    frames = [moving_boxes_frame(t, h, w, n_objects=8)[0] for t in range(32)]
    names = pipe.detector.class_names

    report: dict = {}

    # --- floor components -------------------------------------------------
    print("measuring relay floor...", file=sys.stderr)
    pipe.warmup((h, w), iters=2)

    tiny = np.zeros((8,), np.float32)
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(tiny))      # put + fetch round trip
        ts.append((time.perf_counter() - t0) * 1e3)
    report["rpc_round_trip_ms"] = {"p50": pct(ts, 50), "p95": pct(ts, 95)}

    ts = []
    for i in range(20):
        yuv, _ = pack_i420(frames[i % len(frames)], cfg.detection.input_size)
        yuv = yuv.copy()
        yuv[:2, :4] = i                        # defeat transfer dedup
        t0 = time.perf_counter()
        buf = jax.device_put(yuv)
        np.asarray(buf[:1, :1])               # force completion via fetch
        ts.append((time.perf_counter() - t0) * 1e3)
    report["put_frame_ms"] = {"p50": pct(ts, 50), "p95": pct(ts, 95)}

    # amortized device compute from the chunked program (the honest number;
    # a single-dispatch wall time would count a full relay round trip)
    from rtmodt_tpu.ops.yuv import pack_chunk

    k = 16
    planes = pack_chunk(np.stack(frames[:k]), cfg.detection.input_size)[0]
    pipe.submit_packed_yuv(planes, h, w)       # compile
    outs, _ = pipe.submit_packed_yuv(planes, h, w)
    jax.device_get(outs)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        outs, _ = pipe.submit_packed_yuv(planes, h, w)
    jax.device_get(outs)
    chunk_wall = (time.perf_counter() - t0) / reps
    report["device_compute_ms_per_frame_amortized"] = chunk_wall * 1e3 / k

    # --- real per-frame live loop at several depths -----------------------
    for depth in (0, 1, 2):
        lats = []
        inflight = []

        def consume(entry):
            t_sub, outputs = entry
            tracks = pipe.tracker.tracks_from_outputs(
                jax.device_get(outputs), names)
            if pipe.events:
                pipe.events.process(tracks, 0, None)
            lats.append((time.perf_counter() - t_sub) * 1e3)

        n = args.frames
        for i in range(n):
            f = frames[i % len(frames)].copy()
            f[:2, :4, 0] = i & 0xFF
            t_sub = time.perf_counter()
            outputs, _res = pipe.submit_packed_frame(f)
            inflight.append((t_sub, outputs))
            if len(inflight) > depth:
                consume(inflight.pop(0))
        while inflight:
            consume(inflight.pop(0))
        lats = lats[20:]                      # drop warm tail-in
        report[f"live_depth{depth}_ms"] = {
            "mean": float(np.mean(lats)), "p50": pct(lats, 50),
            "p95": pct(lats, 95), "p99": pct(lats, 99)}
        print(f"depth {depth}: mean {np.mean(lats):.1f} p50 {pct(lats, 50):.1f} "
              f"p95 {pct(lats, 95):.1f} p99 {pct(lats, 99):.1f} ms",
              file=sys.stderr)

    floor = (2 * report["rpc_round_trip_ms"]["p50"]
             + report["put_frame_ms"]["p50"]
             - report["rpc_round_trip_ms"]["p50"]  # put includes one RT
             + report["device_compute_ms_per_frame_amortized"])
    report["relay_floor_ms_est"] = floor
    report["framework_overhead_ms_est"] = (
        report["live_depth1_ms"]["p50"] - floor)
    print(json.dumps(report, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
