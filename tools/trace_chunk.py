#!/usr/bin/env python
"""Capture + summarize a device trace of the production packed-chunk program.

The TPU analog of nvprof on the reference's CUDA path: runs the fused
detect+track chunk program (yolov8s 640, packed planar I420 transport) for a
few chunks under ``jax.profiler``, then parses the emitted Chrome-format
trace and prints the top device ops by total time.  Use this to decide what
to optimize next (see docs/PERF_NOTES.md "Trace-driven" entries).

Usage: python tools/trace_chunk.py [--chunk 16] [--iters 4] [--out /tmp/trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, chunk: int, iters: int,
            algorithm: str = "bytetrack", gmc: bool = False,
            quant: str = "none", weights: str | None = None,
            quant_scales: str | None = None, num_classes: int = 80,
            transport: str = "packed", topk: str = "exact") -> None:
    import numpy as np

    from rtmodt_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    from rtmodt_tpu.config import load_config
    from rtmodt_tpu.ops.yuv import pack_chunk
    from rtmodt_tpu.runtime.pipeline import Pipeline
    from rtmodt_tpu.utils.synthetic import moving_boxes_frame

    det_over: dict = {"model": "yolov8s", "input_size": 640,
                      "num_classes": num_classes, "topk_impl": topk}
    if quant != "none":
        # the reference's TRT INT8 analog (TECHNICAL_DESIGN_DOCUMENT.md:1104):
        # measure what int8 convs actually buy on THIS chip (VERDICT r3 #4)
        det_over["quant"] = quant
        if quant_scales:
            det_over["quant_scales"] = quant_scales
    if weights:
        det_over["weights"] = weights
    cfg = load_config(overrides={
        "detection": det_over,
        "tracking": {"algorithm": algorithm,
                     **({"gmc": {"method": "phase"}} if gmc else {})},
        "profiling": {"per_stage": False, "warmup_frames": 0, "log_interval": 0},
        "visualization": {"enabled": False},
        "events": {"enabled": False},
        "parallel": {"chunk_size": chunk, "pipeline_depth": 2,
                     "transport": transport},
    })
    pipe = Pipeline(cfg)
    h, w = 720, 1280

    # enough distinct chunks that the remote tunnel cannot dedupe dispatches
    packs = []
    for c in range(iters + 2):
        frames = np.stack([moving_boxes_frame(c * chunk + t, h, w, n_objects=8)[0]
                           for t in range(chunk)])
        packs.append(pack_chunk(frames, 640)[0])

    print("compile/warmup...", file=sys.stderr)
    outs, _ = pipe.submit_packed_yuv(packs[-1], h, w)
    outs, _ = pipe.submit_packed_yuv(packs[-2], h, w)
    jax.block_until_ready(outs.visible)

    print(f"tracing {iters} chunks of {chunk}...", file=sys.stderr)
    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for i in range(iters):
        outs, _ = pipe.submit_packed_yuv(packs[i], h, w)
    np.asarray(outs.visible)          # fetch-sync (tunnel-safe, PERF_NOTES 1)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"wall {wall * 1e3:.1f} ms for {iters * chunk} frames "
          f"({wall / (iters * chunk) * 1e3:.2f} ms/frame submitted)",
          file=sys.stderr)


def summarize(out_dir: str, iters: int, chunk: int, top: int = 25) -> None:
    from rtmodt_tpu.profiling.trace_summary import (device_op_times,
                                                    load_latest_trace)

    events = load_latest_trace(out_dir)
    if not events:
        print("no trace.json.gz found under", out_dir, file=sys.stderr)
        return
    by_op, n_ev = device_op_times(events)
    total = sum(by_op.values())
    frames = iters * chunk
    print(f"\ndevice op time over {frames} frames "
          f"(total {total:.1f} ms, {total / frames:.3f} ms/frame):")
    print(f"{'op':60s} {'total_ms':>9s} {'ms/frame':>9s} {'calls':>6s} {'%':>5s}")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name[:60]:60s} {ms:9.2f} {ms / frames:9.4f} "
              f"{n_ev[name]:6d} {100 * ms / max(total, 1e-9):5.1f}")


def attribute(dump_dir: str, out_dir: str, iters: int, chunk: int,
              top: int = 8) -> None:
    """Map opaque trace op names (``fusion.764``) back to model source ops.

    Reads the ``--xla_dump_to`` after-optimizations HLO text emitted during
    capture and, for each of the top trace ops whose name is an HLO
    instruction (fusion.N / convert.N / ...), prints the ``op_name``
    metadata of the instructions inside its fused computation - the JAX
    source path (e.g. ``jit(chunk)/.../conv_general_dilated``) that tells
    you WHICH model layer the time belongs to (VERDICT r4 weak #3: the
    0.039 ms/frame ``fusion.764`` row was unattributed)."""
    import glob
    import re

    from rtmodt_tpu.profiling.trace_summary import (device_op_times,
                                                    load_latest_trace)

    paths = glob.glob(os.path.join(dump_dir, "*after_optimizations.txt"))
    if not paths:
        print(f"no after_optimizations HLO dump under {dump_dir}",
              file=sys.stderr)
        return
    # the chunk program is by far the largest module dumped
    path = max(paths, key=os.path.getsize)
    text = open(path).read()
    # computation bodies: "%fused_computation.N (param...) -> ... {" blocks;
    # map each computation name -> list of op_name metadata inside it
    comp_ops: dict[str, list] = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*{", line)
        if m:
            cur = m.group(1)
            comp_ops[cur] = []
            continue
        if cur and line.strip() == "}":
            cur = None
            continue
        if cur:
            om = re.search(r'op_name="([^"]+)"', line)
            if om:
                comp_ops[cur].append(om.group(1))
    # instruction -> called computation (+ own metadata)
    inst_call = {}
    for m in re.finditer(
            r"%?([\w.\-]+)\s*=\s*\S+\s+(\w+)\([^\n]*?"
            r"(?:calls=%?([\w.\-]+))?(?:[^\n]*?op_name=\"([^\"]+)\")?", text):
        inst, kind, called, op_name = m.groups()
        if called or op_name:
            inst_call[inst] = (called, op_name)

    by_op, _ = device_op_times(load_latest_trace(out_dir))
    frames = iters * chunk
    print(f"\nattribution (HLO metadata from {os.path.basename(path)}):")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        called, own = inst_call.get(name, (None, None))
        srcs = comp_ops.get(called or "", [])
        if not srcs and own:
            srcs = [own]
        # condense: unique tails, most frequent first
        from collections import Counter

        tails = Counter(s.split("/")[-1] + "  <- " + "/".join(
            s.split("/")[-3:-1]) for s in srcs)
        label = "; ".join(f"{t} x{c}" if c > 1 else t
                          for t, c in tails.most_common(3)) or "?"
        print(f"  {name:30s} {ms / frames:7.4f} ms/frame  {label[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default="/tmp/rtmodt_trace")
    ap.add_argument("--algorithm", default="bytetrack",
                    choices=["bytetrack", "deepsort", "botsort", "ocsort"])
    ap.add_argument("--gmc", action="store_true",
                    help="enable tracking.gmc (phase correlation) to "
                         "measure its device cost in the chunk program")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="detection.quant - measure the int8 MXU path's "
                         "device cost vs bf16 (reference TRT INT8 analog)")
    ap.add_argument("--weights", default=None,
                    help="detection.weights override (e.g. the QAT npz)")
    ap.add_argument("--quant-scales", default=None,
                    help="frozen activation scales npz (QAT)")
    ap.add_argument("--num-classes", type=int, default=80,
                    help="head class count of the weights (rich* ckpts: 8)")
    ap.add_argument("--transport", default="packed",
                    choices=["packed", "x6", "i420", "bgr"],
                    help="parallel.transport - pin i420 vs x6 to A/B the "
                         "host-side space-to-depth packing win")
    ap.add_argument("--topk", default="exact", choices=["exact", "approx"],
                    help="detection.topk_impl - measure approx_max_k "
                         "(TPU PartialReduce) vs the full-sort lax.top_k")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--attribute", action="store_true",
                    help="also dump optimized HLO (--xla_dump_to) during "
                         "capture and map the top trace ops (fusion.N) to "
                         "their source-op metadata")
    args = ap.parse_args()
    dump_dir = os.path.join(args.out, "hlo_dump")
    if args.attribute and not args.summarize_only:
        # must be set before jax initializes inside capture()
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_dump_to={dump_dir} --xla_dump_hlo_as_text").strip()
    if not args.summarize_only:
        capture(args.out, args.chunk, args.iters, args.algorithm, args.gmc,
                args.quant, args.weights, args.quant_scales,
                args.num_classes, args.transport, args.topk)
    summarize(args.out, args.iters, args.chunk)
    if args.attribute:
        attribute(dump_dir, args.out, args.iters, args.chunk)


if __name__ == "__main__":
    main()
