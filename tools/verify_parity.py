#!/usr/bin/env python
"""Weight-conversion parity harness.

The day a real ultralytics checkpoint reaches this machine, this tool is the
one-command check that the torch->Flax conversion chain is weight-exact
(reference loads ``yolov8s.pt`` directly, ``src/detection/detector.py:82-90``;
this framework converts it - ``rtmodt_tpu/models/weights.py``):

  1. convert the checkpoint (fails loudly on any unconsumed tensor);
  2. detect on the sample gallery with the fp32 unfused model;
  3. detect again with the BN-fused deploy model and diff boxes (fusion must
     be numerically exact to ~1e-2 px);
  4. if ``ultralytics`` is importable, run the torch model on the same images
     and IoU-match boxes against ours (the definitive parity verdict);
  5. write all boxes + diffs to a JSON artifact.

Runs end-to-end TODAY with any native checkpoint (.npz / orbax, e.g. the
synthetic-trained ``selftest_e2e`` output), exercising steps 2-3-5; it
auto-SKIPS (exit 0) when no weights exist at all, so CI can always call it.

Usage:
  python tools/verify_parity.py [--pt yolov8s.pt | --weights ckpt.npz]
        [--model yolov8s] [--samples web/static/samples] [--out parity.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4),(M,4) xyxy -> (N,M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _detect_all(det, frames: list[np.ndarray]) -> list[dict]:
    out = []
    for f in frames:
        d = det.detect(f)   # Detections: xyxy / confidence / class_id
        out.append({"boxes": np.asarray(d.xyxy, np.float64).tolist(),
                    "scores": np.asarray(d.confidence, np.float64).tolist(),
                    "classes": np.asarray(d.class_id).tolist()})
    return out


def _diff(a: list[dict], b: list[dict], name_a: str, name_b: str) -> dict:
    """Greedy IoU matching per image; reports box/score deltas + unmatched."""
    per_img, worst_box, worst_score, unmatched = [], 0.0, 0.0, 0
    for da, db in zip(a, b):
        ba, bb = np.asarray(da["boxes"]), np.asarray(db["boxes"])
        sa, sb = np.asarray(da["scores"]), np.asarray(db["scores"])
        m = _iou_matrix(ba.reshape(-1, 4), bb.reshape(-1, 4))
        pairs = []
        used_b: set[int] = set()
        for i in np.argsort(-sa):
            if m.shape[1] == 0:
                break
            j = int(np.argmax(np.where(
                np.isin(np.arange(m.shape[1]), list(used_b)), -1.0, m[i])))
            if m[i, j] >= 0.5 and j not in used_b:
                used_b.add(j)
                pairs.append((int(i), j))
        un = (len(ba) - len(pairs)) + (len(bb) - len(pairs))
        unmatched += un
        if pairs:
            ii = [p[0] for p in pairs]
            jj = [p[1] for p in pairs]
            worst_box = max(worst_box,
                            float(np.abs(ba[ii] - bb[jj]).max()))
            worst_score = max(worst_score,
                              float(np.abs(sa[ii] - sb[jj]).max()))
        per_img.append({"matched": len(pairs), "unmatched": un})
    return {"a": name_a, "b": name_b, "per_image": per_img,
            "max_box_delta_px": worst_box, "max_score_delta": worst_score,
            "total_unmatched": unmatched}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", default=None,
                    help="ultralytics .pt to convert (default: first "
                         "checkpoints/*.pt if present)")
    ap.add_argument("--weights", default=None,
                    help="native checkpoint (.npz / orbax dir) instead of --pt")
    ap.add_argument("--model", default="yolov8s")
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--input-size", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--samples", default="web/static/samples")
    ap.add_argument("--out", default="outputs/parity.json")
    args = ap.parse_args()

    weights = args.weights
    if weights is None:
        pt = args.pt or next(iter(sorted(glob.glob("checkpoints/*.pt"))), None)
        if pt and os.path.exists(pt):
            weights = pt
    if weights is None or not os.path.exists(weights):
        print("verify_parity: SKIP - no checkpoint found (supply --pt or "
              "--weights); conversion parity needs real weights")
        return 0

    # honor JAX_PLATFORMS=cpu: the remote-TPU (axon) plugin overrides the
    # env var, so pin via config before first backend use (CI runs this
    # tool on CPU; production parity checks run on the chip)
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2

    from rtmodt_tpu.detection.detector import Detector

    frames = []
    for p in sorted(glob.glob(os.path.join(args.samples, "*.jpg")))[:8]:
        img = cv2.imread(p)
        if img is not None:
            frames.append(img)
    if not frames:
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, (720, 1280, 3), np.uint8)
                  for _ in range(4)]
        print("verify_parity: no gallery images; using random frames")

    base = dict(model=args.model, num_classes=args.num_classes,
                input_size=args.input_size, weights=weights,
                conf_threshold=args.conf)
    report: dict = {"weights": weights, "n_images": len(frames), "diffs": []}

    # fp32 unfused (numerical ground truth of the converted tree)
    det32 = Detector({**base, "half": False, "fuse_bn": False}, warmup=False)
    ref_boxes = _detect_all(det32, frames)
    report["fp32_unfused"] = ref_boxes

    # BN-fused fp32 deploy model: fusion must be numerically exact
    detf = Detector({**base, "half": False, "fuse_bn": True}, warmup=False)
    fused_boxes = _detect_all(detf, frames)
    d = _diff(ref_boxes, fused_boxes, "fp32_unfused", "fp32_bn_fused")
    report["diffs"].append(d)
    fused_ok = d["max_box_delta_px"] < 0.05 and d["total_unmatched"] == 0

    # production bf16 fused: expected drift small but nonzero
    detb = Detector({**base, "half": True, "fuse_bn": True}, warmup=False)
    d16 = _diff(ref_boxes, _detect_all(detb, frames),
                "fp32_unfused", "bf16_bn_fused")
    report["diffs"].append(d16)

    # definitive check when the torch side is importable
    try:
        from ultralytics import YOLO  # type: ignore

        if weights.endswith((".pt", ".pth")):
            yolo = YOLO(weights)
            ultra = []
            for f in frames:
                r = yolo.predict(f, conf=args.conf, imgsz=args.input_size,
                                 verbose=False)[0]
                ultra.append({
                    "boxes": r.boxes.xyxy.cpu().numpy().tolist(),
                    "scores": r.boxes.conf.cpu().numpy().tolist(),
                    "classes": r.boxes.cls.cpu().numpy().astype(int).tolist()})
            du = _diff(ref_boxes, ultra, "fp32_unfused", "ultralytics_torch")
            report["diffs"].append(du)
            report["ultralytics_parity"] = (
                du["max_box_delta_px"] < 1.0 and du["total_unmatched"] == 0)
    except ImportError:
        report["ultralytics_parity"] = "unavailable (ultralytics not installed)"

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"verify_parity: {len(frames)} images")
    for d in report["diffs"]:
        print(f"  {d['a']} vs {d['b']}: max box delta "
              f"{d['max_box_delta_px']:.4f}px, score delta "
              f"{d['max_score_delta']:.4f}, unmatched {d['total_unmatched']}")
    print(f"  report -> {args.out}")
    if not fused_ok:
        print("verify_parity: FAIL - BN fusion is not numerically exact")
        return 1
    print("verify_parity: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
