"""CLI tool integration tests (click runner, tiny model, synthetic data)."""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner


class TestDownloadDataset:
    def test_synthetic_generation(self, tmp_path):
        from tools.download_dataset import main

        res = CliRunner().invoke(main, [
            "--dataset", "synthetic", "--root", str(tmp_path),
            "--n-train", "4", "--n-val", "3",
            "--height", "160", "--width", "160", "--objects", "2"])
        assert res.exit_code == 0, res.output
        root = tmp_path / "synthetic"
        assert len(list((root / "images" / "train").iterdir())) == 4
        assert len(list((root / "images" / "val").iterdir())) == 3
        assert (root / "val_coco_gt.json").exists()
        assert (root / "val_mot_gt.txt").exists()
        gt = json.loads((root / "val_coco_gt.json").read_text())
        assert len(gt["images"]) == 3
        # every image has a matching YOLO label file with valid rows
        for f in (root / "labels" / "train").iterdir():
            for line in f.read_text().splitlines():
                vals = line.split()
                assert len(vals) == 5
                assert all(0.0 <= float(v) <= 1.0 for v in vals[1:])

    def test_rich_dense_frac_mix(self, tmp_path):
        """--dense-frac renders that fraction of the rich set as 720x1280
        crowd frames with per-frame-dimension-normalized labels (VERDICT r3
        #3: the 640 checkpoint must see the small-object regime)."""
        import cv2

        from tools.download_dataset import main

        res = CliRunner().invoke(main, [
            "--dataset", "synthetic", "--classes", "8",
            "--root", str(tmp_path), "--n-train", "10", "--n-val", "5",
            "--height", "320", "--width", "320", "--dense-frac", "0.4"])
        assert res.exit_code == 0, res.output
        root = tmp_path / "synthetic_rich"
        dense = 0
        for i in range(10):
            im = cv2.imread(str(root / "images" / "train" / f"{i:06d}.jpg"))
            rows = [r.split() for r in
                    (root / "labels" / "train" / f"{i:06d}.txt")
                    .read_text().splitlines()]
            assert all(len(r) == 5 for r in rows)
            assert all(0.0 <= float(v) <= 1.0 for r in rows for v in r[1:])
            if im.shape[:2] == (720, 1280):
                dense += 1
                assert len(rows) >= 15      # crowd frame
                # normalized against the DENSE frame's own dims: every box
                # denormalizes to >= ~6 px, none degenerate
                for r in rows:
                    assert float(r[3]) * 1280 > 4 and float(r[4]) * 720 > 4
            else:
                assert im.shape[:2] == (320, 320)
        assert dense == 4                   # exactly the requested fraction
        # COCO GT for the val split carries per-image dims
        gt = json.loads((root / "val_coco_gt.json").read_text())
        dims = {(im["width"], im["height"]) for im in gt["images"]}
        assert (1280, 720) in dims and (320, 320) in dims

    def test_coco_to_yolo_conversion(self, tmp_path):
        from tools.download_dataset import coco_to_yolo_labels

        ann = {
            "images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 200}],
            "categories": [{"id": 7, "name": "x"}, {"id": 9, "name": "y"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 9,
                 "bbox": [10, 20, 30, 40], "iscrowd": 0},
                {"id": 2, "image_id": 1, "category_id": 7,
                 "bbox": [0, 0, 50, 50], "iscrowd": 1},  # crowd -> skipped
            ],
        }
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(ann))
        n = coco_to_yolo_labels(str(p), str(tmp_path / "labels"))
        assert n == 1
        row = (tmp_path / "labels" / "a.txt").read_text().split()
        assert int(row[0]) == 1                       # second category -> idx 1
        assert float(row[1]) == pytest.approx(0.25)   # (10+15)/100
        assert float(row[2]) == pytest.approx(0.20)   # (20+20)/200


class TestRunInferenceTrack:
    def test_track_then_eval_end_to_end(self, tmp_path):
        """Full offline loop: synthetic video -> MOT txt -> file is well-formed.
        (Random weights -> no real detections expected; the plumbing is the
        subject under test.)"""
        from tools.run_inference import main
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "v.mp4")
        write_synthetic_video(video, frames=6, h=160, w=160, n_objects=2)
        out = str(tmp_path / "tracks.txt")
        res = CliRunner().invoke(main, [
            "track", "--video", video, "--out", out,
            "--model", "yolov8n", "--conf", "0.01", "--max-frames", "5"])
        assert res.exit_code == 0, res.output
        assert os.path.exists(out)
        for line in open(out):
            parts = line.strip().split(",")
            assert len(parts) == 10
            assert int(parts[0]) >= 1

    def test_track_deepsort_algorithm(self, tmp_path):
        """--algorithm deepsort routes through the appearance tracker."""
        from tools.run_inference import main
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "v.mp4")
        write_synthetic_video(video, frames=4, h=128, w=128, n_objects=1)
        out = str(tmp_path / "tracks_ds.txt")
        res = CliRunner().invoke(main, [
            "track", "--video", video, "--out", out, "--input-size", "128",
            "--model", "yolov8n", "--conf", "0.01", "--max-frames", "3",
            "--algorithm", "deepsort", "--track-thresh", "0.01"])
        assert res.exit_code == 0, res.output
        assert os.path.exists(out)


class TestExport:
    def test_npz_export(self, tmp_path, monkeypatch):
        from tools.export_model import main

        monkeypatch.chdir(tmp_path)
        res = CliRunner().invoke(main, [
            "--model", "yolov8n", "--format", "npz", "--imgsz", "64",
            "--out", "m.npz"])
        assert res.exit_code == 0, res.output
        assert os.path.exists(tmp_path / "m.npz")
        with np.load(tmp_path / "m.npz") as z:
            assert any(k.startswith("params/") for k in z.files)

    def test_stablehlo_export(self, tmp_path, monkeypatch):
        from tools.export_model import main

        monkeypatch.chdir(tmp_path)
        res = CliRunner().invoke(main, [
            "--model", "yolov8n", "--format", "stablehlo", "--imgsz", "64",
            "--out", "m.shlo"])
        assert res.exit_code == 0, res.output
        assert os.path.getsize(tmp_path / "m.shlo") > 1000
        assert "stablehlo" in (tmp_path / "m.shlo.mlir").read_text()[:5000]


class TestDownloadSamples:
    def test_synthetic_gallery(self, tmp_path, monkeypatch):
        import tools.download_samples as ds

        monkeypatch.setattr(ds, "samples_dir", lambda: str(tmp_path))
        res = CliRunner().invoke(ds.main, ["--synthetic-only", "--count", "4"])
        assert res.exit_code == 0, res.output
        files = list(tmp_path.iterdir())
        assert len(files) == 4
        assert all(f.suffix == ".jpg" for f in files)
