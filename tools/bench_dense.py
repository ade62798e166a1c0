#!/usr/bin/env python
"""Dense-scene device-cost scaling: ms/frame vs object count.

The production chunk program is fully static-shape EXCEPT its data-dependent
`lax.while_loop`s: the parallel-fixpoint NMS (ops/nms.py) and the mutual-best
assignment rounds inside the tracker scan (ops/assignment.py) both iterate
until convergence, so crowded scenes are the one place device time can grow
with content.  VERDICT round-1 weakness #4 asked for measurements beyond the
sparse 8-object scene; this tool sweeps object density with a real trained
checkpoint so the detection pool genuinely fills (random weights produce a
density-independent candidate pool and would measure nothing).

For each density it reports:

  * amortized wall ms/frame of the production `submit_packed_yuv` chunk
    program over chunks with CONTINUOUS motion (time advances monotonically
    across every dispatch, so tracker occupancy is the real steady state);
  * mean detections/frame and live-track occupancy at the end of the run;
  * fixpoint diagnostics on real head outputs (ops/nms.py
    ::nms_debug_from_logits): NMS rounds to convergence, candidate-pool
    saturation vs `nms_candidates`, survivors; and the mutual-best
    assignment round count (ops/assignment.py::greedy_assign_rounds) on the
    IoU matrix between consecutive frames' detections - the same matrix
    shape the tracker's first association stage solves.

Usage:
  python tools/bench_dense.py --weights checkpoints/rich/ema_final.npz \
      --model yolov8n --num-classes 8 --input-size 416 \
      --densities 8,32,64,128 [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--model", default="yolov8n")
    ap.add_argument("--num-classes", type=int, default=8)
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--densities", default="8,32,64,128")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--json", default=None)
    ap.add_argument("--trace", action="store_true",
                    help="also capture a jax.profiler trace per density and "
                         "report DEVICE ms/frame (immune to tunnel transfer "
                         "noise - the ground-truth scaling column)")
    args = ap.parse_args()

    from rtmodt_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from rtmodt_tpu.config import load_config
    from rtmodt_tpu.detection.detector import letterbox
    from rtmodt_tpu.ops.assignment import greedy_assign_rounds
    from rtmodt_tpu.ops.iou import pairwise_iou
    from rtmodt_tpu.ops.nms import batched_nms_from_logits, nms_debug_from_logits
    from rtmodt_tpu.ops.yuv import pack_chunk
    from rtmodt_tpu.runtime.pipeline import Pipeline
    from rtmodt_tpu.utils.synthetic import dense_moving_scene

    cfg = load_config(overrides={
        "detection": {"model": args.model, "weights": args.weights,
                      "num_classes": args.num_classes,
                      "input_size": args.input_size,
                      "conf_threshold": args.conf, "classes": None,
                      "max_detections": 256, "nms_candidates": 512},
        # thresholds matched to dense-scene statistics: tiny crowded shapes
        # score 0.3-0.6, so the default track_thresh=0.5 would suppress most
        # births and idle the tracker; canonical iou_distance gate tolerates
        # the fast relative motion of small objects (docs/RESULTS.md tracker
        # comparison)
        "tracking": {"bytetrack": {"max_tracks": 256, "track_thresh": 0.3,
                                   "new_track_thresh": 0.3,
                                   "match_thresh": 0.7,
                                   "match_metric": "iou_distance"}},
        "profiling": {"per_stage": False, "warmup_frames": 0,
                      "log_interval": 0},
        "visualization": {"enabled": False},
        "events": {"enabled": False},
    })
    pipe = Pipeline(cfg)
    det = pipe.detector
    h, w, k = args.height, args.width, args.chunk
    n_warm = 2 + max(2, args.reps // 2)   # compile + tracker fill + ramp

    @partial(jax.jit, static_argnames=())
    def debug_fn(params, frame_prev, frame_cur):
        """NMS fixpoint + assignment-round diagnostics on real head outputs."""
        dtype = jnp.bfloat16 if cfg.detection.half else jnp.float32
        outs = []
        for f in (frame_prev, frame_cur):
            img, _ = letterbox(f, cfg.detection.input_size, dtype=dtype)
            bd, cl = det.model.apply(params, img[None], train=False)
            rounds, pool, kept = nms_debug_from_logits(
                bd[0], cl[0], cfg.detection.input_size,
                cfg.detection.conf_threshold, cfg.detection.iou_threshold,
                num_candidates=cfg.detection.nms_candidates,
                class_mask=det._class_mask,
                agnostic=cfg.detection.agnostic_nms)
            res = batched_nms_from_logits(
                bd[0], cl[0], cfg.detection.input_size,
                conf_thresh=cfg.detection.conf_threshold,
                iou_thresh=cfg.detection.iou_threshold,
                max_det=cfg.detection.max_detections,
                num_candidates=cfg.detection.nms_candidates,
                class_mask=det._class_mask,
                agnostic=cfg.detection.agnostic_nms)
            outs.append((rounds, pool, kept, res))
        (_, _, _, res_p), (rounds, pool, kept, res_c) = outs
        # the tracker's stage-1 association matrix: prev dets (as the track
        # slots they become) x current dets, IoU similarity
        sim = pairwise_iou(res_p.boxes, res_c.boxes)
        a_rounds = greedy_assign_rounds(
            sim, 0.2, row_valid=res_p.valid, col_valid=res_c.valid)
        return rounds, pool, kept, a_rounds

    rows = []
    for dens in [int(d) for d in args.densities.split(",")]:
        # continuous motion across ALL dispatches: pre-render n_warm + reps
        # consecutive chunks (occupancy is the true steady state; no two
        # payloads are byte-identical so the tunnel cannot dedup them)
        n_total = n_warm + args.reps
        raw = [np.stack([dense_moving_scene(c * k + t, h, w,
                                            n_objects=dens,
                                            seed=1234 + dens)[0]
                         for t in range(k)])
               for c in range(n_total)]
        chunks = [pack_chunk(f, cfg.detection.input_size)[0] for f in raw]

        pipe.tracker.reset()
        for c in range(n_warm):           # compile + ramp + fill tracker
            outs, _ = pipe.submit_packed_yuv(chunks[c], h, w)
        jax.block_until_ready(outs)

        t0 = time.perf_counter()
        counts = []
        for c in range(n_warm, n_total):
            outs, res = pipe.submit_packed_yuv(chunks[c], h, w)
            counts.append(res.count)
        host = jax.device_get(outs)          # sync once at the end
        wall = (time.perf_counter() - t0) / (args.reps * k)

        n_det = float(np.concatenate(
            [np.asarray(jax.device_get(c)).ravel() for c in counts]).mean())
        occupancy = int(np.asarray(host.visible[-1]).sum())

        dev_ms = None
        if args.trace:
            from rtmodt_tpu.profiling.trace_summary import device_total_ms

            tdir = f"/tmp/rtmodt_dense_trace_{dens}"
            jax.profiler.start_trace(tdir)
            for c in range(n_warm, n_total):
                outs, _ = pipe.submit_packed_yuv(chunks[c], h, w)
            np.asarray(jax.device_get(outs.visible))
            jax.profiler.stop_trace()
            dev_ms = device_total_ms(tdir) / (args.reps * k)

        rounds, pool, kept, a_rounds = jax.device_get(debug_fn(
            det.params, jnp.asarray(raw[-1][-2]), jnp.asarray(raw[-1][-1])))
        rows.append({"objects": dens, "ms_per_frame": wall * 1e3,
                     "device_ms_per_frame": dev_ms,
                     "mean_detections": n_det, "live_tracks": occupancy,
                     "nms_rounds": int(rounds), "nms_pool_used": int(pool),
                     "nms_kept": int(kept), "assign_rounds": int(a_rounds)})
        dev_s = f"  device={dev_ms:6.3f} ms/f" if dev_ms is not None else ""
        print(f"objects={dens:4d}  {wall * 1e3:7.3f} ms/frame{dev_s}  "
              f"det/frame={n_det:6.1f}  live_tracks={occupancy:4d}  "
              f"nms_rounds={int(rounds)}  pool={int(pool)}/"
              f"{cfg.detection.nms_candidates}  kept={int(kept)}  "
              f"assign_rounds={int(a_rounds)}",
              flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
