#!/usr/bin/env python
"""Benchmark harness: per-stage latency + throughput tables.

Produces the reference design doc's benchmark-report format (SURVEY.md 6:
stage mean/p95/p99 table + end-to-end FPS) from real runs on the current
accelerator, over the synthetic scene generator (no dataset needed).
"""

from __future__ import annotations

import json
import os
import sys
import time

import click
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@click.command()
@click.option("--model", default="yolov8s")
@click.option("--imgsz", default=640, type=int)
@click.option("--height", default=720, type=int)
@click.option("--width", default=1280, type=int)
@click.option("--frames", default=200, type=int)
@click.option("--mode", type=click.Choice(["per_stage", "fused", "chunked"]),
              default="per_stage")
@click.option("--chunk", default=16, type=int)
@click.option("--json-out", default=None)
def main(model, imgsz, height, width, frames, mode, chunk, json_out):
    from rtmodt_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    from rtmodt_tpu.config import load_config
    from rtmodt_tpu.runtime.pipeline import Pipeline
    from rtmodt_tpu.utils.synthetic import moving_boxes_frame

    cfg = load_config(overrides={
        "detection": {"model": model, "input_size": imgsz},
        "profiling": {"per_stage": mode == "per_stage", "warmup_frames": 10,
                      "log_interval": 0},
        "visualization": {"enabled": True},
    })
    pipe = Pipeline(cfg)
    scene = [moving_boxes_frame(t, height, width, 8)[0] for t in range(64)]

    if mode == "chunked":
        from rtmodt_tpu.ops.yuv import pack_i420_planar

        planes = [pack_i420_planar(f, imgsz)[0] for f in scene[:chunk]]
        yuv = tuple(np.stack([p[i] for p in planes]) for i in range(3))
        pipe.submit_packed_yuv(yuv, height, width)  # compile
        t0 = time.perf_counter()
        done = 0
        it = 0
        while done < frames:
            # perturb the payload each dispatch: the remote-TPU tunnel dedups
            # byte-identical transfers, which would overstate chunked FPS
            # (same rule as bench_dense.py / bench.py)
            y = yuv[0].copy()
            y[:, :2, :4] = it & 0xFF
            it += 1
            outs, _ = pipe.submit_packed_yuv((y, yuv[1], yuv[2]), height, width)
            jax.device_get(outs.visible)
            done += chunk
        dt = time.perf_counter() - t0
        summary = {"fps_mean": done / dt, "mode": "chunked", "chunk": chunk}
    else:
        pipe.warmup((height, width))
        zones = pipe.events.get_zone_polygons() if pipe.events else []
        for i in range(frames):
            frame = scene[i % len(scene)].copy()
            tracks, events, _ = pipe.step(frame, i, i / 30.0)
            if pipe.renderer:
                pipe.profiler.tick("visualization")
                pipe.renderer.render(frame, tracks, zones)
                pipe.profiler.tock("visualization")
            pipe.profiler.end_frame()
        summary = pipe.profiler.summary()
        pipe.profiler.print_summary()

    click.echo(json.dumps({k: round(v, 2) for k, v in summary.items()
                           if isinstance(v, (int, float))}, indent=2))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
