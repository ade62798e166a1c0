#!/usr/bin/env python
"""Offline inference runner -> COCO predictions / MOT tracking files.

Closes the gap the reference leaves open: its TDD sketches a
``tools/run_inference.py`` that never exists (SURVEY.md 3.5), so its
evaluation functions have no in-repo producer.  This tool:

  * ``detect`` mode: run the detector over a COCO GT json's images (or an
    image directory) and write predictions in COCO results format, then
    optionally evaluate mAP in-process;
  * ``track`` mode: run detect+track over a video (or MOT image sequence)
    and write MOT15-2D rows, then optionally evaluate IDF1/MOTA vs a GT file.
"""

from __future__ import annotations

import json
import os
import sys

import click
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@click.group()
def main() -> None:
    pass


@main.command()
@click.option("--images", required=True, help="image directory")
@click.option("--gt-json", default=None, help="COCO GT json (ids + optional eval)")
@click.option("--out", default="outputs/predictions.json")
@click.option("--model", default="yolov8s")
@click.option("--weights", default=None)
@click.option("--num-classes", default=80, type=int)
@click.option("--input-size", default=640, type=int)
@click.option("--conf", default=0.001, type=float, help="low conf for mAP sweeps")
@click.option("--quant", default="none", type=click.Choice(["none", "int8"]),
              help="int8 deploys the PTQ/QAT path (quant/ptq.py)")
@click.option("--quant-scales", default=None,
              help="qat_act_scales.npz from tools/train.py --qat-steps")
@click.option("--evaluate", "do_eval", is_flag=True)
def detect(images, gt_json, out, model, weights, num_classes, input_size,
           conf, quant, quant_scales, do_eval):
    """Detection over images -> COCO results json (+ optional mAP)."""
    import cv2

    from rtmodt_tpu.config.loader import DetectionConfig
    from rtmodt_tpu.detection.detector import Detector
    from rtmodt_tpu.utils.logging import logger

    det = Detector(DetectionConfig(
        model=model, weights=weights, num_classes=num_classes,
        input_size=input_size, conf_threshold=conf, classes=None,
        max_detections=300, nms_candidates=1000, quant=quant,
        quant_scales=quant_scales), warmup=False)

    cat_ids = None
    if gt_json:
        with open(gt_json) as f:
            gt = json.load(f)
        entries = [(img["id"], os.path.join(images, img["file_name"]))
                   for img in gt["images"]]
        # real COCO category ids have gaps (12, 26, ...): map the model's
        # contiguous class index through the GT's sorted category list, as
        # the COCO->YOLO label conversion does in reverse
        if gt.get("categories"):
            cat_ids = sorted(c["id"] for c in gt["categories"])
    else:
        files = sorted(f for f in os.listdir(images)
                       if f.lower().endswith((".jpg", ".jpeg", ".png")))
        entries = list(enumerate(files := [os.path.join(images, f) for f in files], 1))

    preds = []
    for img_id, path in entries:
        frame = cv2.imread(path)
        if frame is None:
            logger.warning(f"unreadable: {path}")
            continue
        d = det.detect(frame)
        for i in range(len(d)):
            x1, y1, x2, y2 = d.xyxy[i]
            ci = int(d.class_id[i])
            preds.append({
                "image_id": img_id,
                "category_id": (cat_ids[ci] if cat_ids and ci < len(cat_ids)
                                else ci + 1),
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "score": float(d.confidence[i]),
            })
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(preds, f)
    logger.info(f"wrote {len(preds)} predictions -> {out}")

    if do_eval and gt_json:
        from rtmodt_tpu.evaluation.metrics import evaluate_detection

        result = evaluate_detection(gt_json, out)
        click.echo(json.dumps(result, indent=2))


@main.command()
@click.option("--video", required=True, help="video file or image-sequence dir")
@click.option("--out", default="outputs/tracks.txt")
@click.option("--model", default="yolov8s")
@click.option("--weights", default=None)
@click.option("--num-classes", default=80, type=int)
@click.option("--input-size", default=640, type=int)
@click.option("--gt-mot", default=None, help="MOT15-2D GT for evaluation")
@click.option("--conf", default=0.35, type=float)
@click.option("--match-thresh", default=0.8, type=float)
@click.option("--track-thresh", default=0.5, type=float,
              help="min confidence to BIRTH a track (ByteTrack high gate); "
                   "match scene statistics - small/crowded objects score "
                   "lower than large clean ones")
@click.option("--max-frames", default=None, type=int)
@click.option("--algorithm", default="bytetrack",
              type=click.Choice(["bytetrack", "deepsort", "botsort", "ocsort"]),
              help="deepsort adds the appearance embedder (shipped weights); "
                   "botsort fuses motion+appearance costs (pair with "
                   "tracking.gmc for moving cameras); ocsort is observation-"
                   "centric for occlusion-heavy scenes")
@click.option("--interpolate", default=0, type=int, metavar="MAX_GAP",
              help="offline post-processing: linearly fill per-id track "
                   "gaps up to MAX_GAP frames (ByteTrack's standard offline "
                   "trick; needs future frames so it never runs live)")
@click.option("--embedder", default=None,
              help="appearance embedder .npz override for deepsort/botsort "
                   "(default: the shipped checkpoints/embedder.npz)")
def track(video, out, model, weights, num_classes, input_size, gt_mot, conf,
          match_thresh, track_thresh, max_frames, algorithm, interpolate,
          embedder):
    """Detect+track over a video -> MOT15-2D rows (+ optional IDF1/MOTA)."""
    import cv2

    from rtmodt_tpu.config import load_config
    from rtmodt_tpu.runtime.pipeline import Pipeline
    from rtmodt_tpu.utils.logging import logger

    cfg = load_config(overrides={
        "detection": {"model": model, "weights": weights, "conf_threshold": conf,
                      "num_classes": num_classes, "input_size": input_size,
                      "classes": None},
        "tracking": {"algorithm": algorithm,
                     "bytetrack": {"match_thresh": match_thresh,
                                   "track_thresh": track_thresh,
                                   "new_track_thresh": track_thresh},
                     "deepsort": {"min_confidence": track_thresh,
                                  **({"embedder": embedder} if embedder else {})},
                     "botsort": {"track_thresh": track_thresh,
                                 "new_track_thresh": track_thresh,
                                 "match_thresh": match_thresh,
                                 **({"embedder": embedder} if embedder else {})},
                     "ocsort": {"det_thresh": track_thresh}},
        "events": {"enabled": False},
        "visualization": {"enabled": False},
        "profiling": {"per_stage": False, "warmup_frames": 0, "log_interval": 0},
    })
    pipe = Pipeline(cfg)

    def frames():
        if os.path.isdir(video):
            for i, f in enumerate(sorted(os.listdir(video)), 1):
                if f.lower().endswith((".jpg", ".jpeg", ".png")):
                    yield i, cv2.imread(os.path.join(video, f))
        else:
            cap = cv2.VideoCapture(video)
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                i += 1
                yield i, frame
            cap.release()

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    n = 0
    with open(out, "w") as f:
        for fid, frame in frames():
            if frame is None:
                continue
            tracks, _, _ = pipe.step(frame, fid, fid / 30.0)
            for t in tracks:
                x1, y1, x2, y2 = t.xyxy
                f.write(f"{fid},{t.track_id},{x1:.2f},{y1:.2f},"
                        f"{x2 - x1:.2f},{y2 - y1:.2f},{t.confidence:.3f},-1,-1,-1\n")
            n += 1
            if max_frames and n >= max_frames:
                break
    logger.info(f"tracked {n} frames -> {out}")

    if interpolate > 0:
        from rtmodt_tpu.tracking.postprocess import (interpolate_mot_rows,
                                                     load_mot_rows,
                                                     write_mot_rows)

        rows = load_mot_rows(out)
        filled = interpolate_mot_rows(rows, max_gap=interpolate)
        write_mot_rows(out, filled)
        logger.info(f"interpolated {len(filled) - len(rows)} gap rows "
                    f"(max_gap={interpolate}) -> {out}")

    if gt_mot:
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking

        click.echo(json.dumps(evaluate_tracking(gt_mot, out), indent=2))


if __name__ == "__main__":
    main()
