#!/usr/bin/env python
"""End-to-end self-test: train a detector from scratch, then detect+track
and evaluate IDF1/MOTA - all with this framework's own components.

Generates a synthetic dataset, trains YOLOv8n on it (~5-7 min on a TPU
chip), runs the jitted detect+track pipeline over the val sequence, and
scores the result with the built-in CLEAR-MOT/IDF1 evaluator. Passes when
IDF1/MOTA clear the thresholds (expected: 1.0 / 1.0).

This is the zero-egress substitute for pretrained-weight validation: it
proves the full learning + inference + tracking + evaluation loop.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import click

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd: list[str]) -> str:
    click.echo("$ " + " ".join(cmd))
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        click.echo(r.stdout[-2000:])
        click.echo(r.stderr[-2000:], err=True)
        sys.exit(1)
    return r.stdout


@click.command()
@click.option("--workdir", default=None)
@click.option("--steps", default=320, type=int)
@click.option("--idf1-min", default=0.95, type=float)
def main(workdir, steps, idf1_min):
    import yaml

    work = workdir or tempfile.mkdtemp(prefix="rtmodt_selftest_")
    data = os.path.join(work, "synthetic")
    run([sys.executable, "tools/download_dataset.py", "--dataset", "synthetic",
         "--root", work, "--n-train", "64", "--n-val", "16",
         "--height", "320", "--width", "320", "--objects", "3"])

    cfg = {
        "model": "yolov8n", "num_classes": 1, "input_size": 320,
        "data": {"root": data, "train_split": "train", "val_split": "val",
                 "max_boxes": 8},
        "epochs": 40, "batch_size": 8, "steps_per_epoch": 8,
        "optimizer": {"lr0": 0.002, "lrf": 0.05, "weight_decay": 0.0005,
                      "warmup_epochs": 2, "clip_norm": 10.0},
        "loss": {"box": 7.5, "cls": 0.5, "dfl": 1.5},
        "augmentation": {"mosaic": 0.5, "fliplr": 0.5, "hsv_h": 0.01,
                         "hsv_s": 0.3, "hsv_v": 0.2, "scale": 0.3,
                         "translate": 0.1},
        "precision": "fp32", "ema_decay": 0.999,
        "checkpoint": {"dir": os.path.join(work, "ckpt"), "save_period": 10,
                       "resume": False},
        "patience": 0, "val_interval": 5, "parallel": {"num_devices": 0},
    }
    cfg_path = os.path.join(work, "train.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run([sys.executable, "tools/train.py", "-c", cfg_path,
         "--max-steps", str(steps)])

    weights = os.path.join(work, "ckpt", "ema_final.npz")
    assert os.path.exists(weights), "training did not produce EMA weights"
    out = run([sys.executable, "tools/run_inference.py", "track",
               "--video", os.path.join(data, "images", "val"),
               "--model", "yolov8n", "--weights", weights,
               "--num-classes", "1", "--input-size", "320",
               "--conf", "0.5", "--match-thresh", "0.3",
               "--out", os.path.join(work, "pred_tracks.txt"),
               "--gt-mot", os.path.join(data, "val_mot_gt.txt")])
    result = json.loads(out[out.index("{"):])
    click.echo(json.dumps(result, indent=2))
    assert result["idf1"] >= idf1_min, f"IDF1 {result['idf1']} < {idf1_min}"
    assert result["mota"] >= idf1_min, f"MOTA {result['mota']} < {idf1_min}"
    click.echo(f"SELFTEST PASSED (idf1={result['idf1']:.3f}, "
               f"mota={result['mota']:.3f})")


if __name__ == "__main__":
    main()
