"""Evaluation metrics tests with hand-computable synthetic cases."""

import json

import numpy as np
import pytest


def make_gt(boxes_per_image, cat_id=1):
    """boxes_per_image: {img_id: [xywh, ...]}"""
    images = [{"id": i} for i in boxes_per_image]
    anns = []
    aid = 1
    for img, boxes in boxes_per_image.items():
        for b in boxes:
            anns.append({"id": aid, "image_id": img, "category_id": cat_id,
                         "bbox": list(b), "area": b[2] * b[3], "iscrowd": 0})
            aid += 1
    return {"images": images, "categories": [{"id": cat_id}], "annotations": anns}


def make_preds(dets, cat_id=1):
    """dets: [(img_id, xywh, score)]"""
    return [{"image_id": i, "category_id": cat_id, "bbox": list(b), "score": s}
            for i, b, s in dets]


class TestCOCOEval:
    def test_perfect_predictions(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_detection

        gt = make_gt({1: [[10, 10, 50, 50], [200, 200, 40, 80]],
                      2: [[5, 5, 30, 30]]})
        preds = make_preds([(1, [10, 10, 50, 50], 0.9),
                            (1, [200, 200, 40, 80], 0.8),
                            (2, [5, 5, 30, 30], 0.95)])
        g, p = tmp_path / "gt.json", tmp_path / "p.json"
        g.write_text(json.dumps(gt))
        p.write_text(json.dumps(preds))
        r = evaluate_detection(str(g), str(p))
        assert r["mAP"] == pytest.approx(1.0, abs=0.01)
        assert r["recall"] == pytest.approx(1.0, abs=0.01)

    def test_no_predictions(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_detection

        g, p = tmp_path / "gt.json", tmp_path / "p.json"
        g.write_text(json.dumps(make_gt({1: [[10, 10, 50, 50]]})))
        p.write_text(json.dumps([]))
        r = evaluate_detection(str(g), str(p))
        assert r["mAP"] == 0.0

    def test_half_recall(self, tmp_path):
        """2 GT, 1 perfect det -> AP ~ 0.5 (precision 1 up to recall 0.5)."""
        from rtmodt_tpu.evaluation.metrics import evaluate_detection

        gt = make_gt({1: [[10, 10, 50, 50], [300, 300, 50, 50]]})
        preds = make_preds([(1, [10, 10, 50, 50], 0.9)])
        g, p = tmp_path / "gt.json", tmp_path / "p.json"
        g.write_text(json.dumps(gt))
        p.write_text(json.dumps(preds))
        r = evaluate_detection(str(g), str(p))
        # 101-pt interp: precision 1.0 for recall thrs 0..0.5 (51/101 points)
        assert r["mAP"] == pytest.approx(51 / 101, abs=0.01)

    def test_false_positive_after_tp(self, tmp_path):
        """TP at s=0.9 then FP at s=0.8: AP = 51/101 for the single GT."""
        from rtmodt_tpu.evaluation.metrics import evaluate_detection

        gt = make_gt({1: [[10, 10, 50, 50]]})
        preds = make_preds([(1, [10, 10, 50, 50], 0.9),
                            (1, [400, 400, 50, 50], 0.8)])
        g, p = tmp_path / "gt.json", tmp_path / "p.json"
        g.write_text(json.dumps(gt))
        p.write_text(json.dumps(preds))
        r = evaluate_detection(str(g), str(p))
        assert r["mAP"] == pytest.approx(1.0, abs=0.01)  # all recall at precision 1

    def test_low_iou_is_fp(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_detection

        gt = make_gt({1: [[10, 10, 100, 100]]})
        preds = make_preds([(1, [80, 80, 100, 100], 0.9)])  # IoU ~ 0.10
        g, p = tmp_path / "gt.json", tmp_path / "p.json"
        g.write_text(json.dumps(gt))
        p.write_text(json.dumps(preds))
        assert evaluate_detection(str(g), str(p))["mAP"] == 0.0

    def test_crowd_ignored(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_detection

        gt = make_gt({1: [[10, 10, 50, 50]]})
        gt["annotations"].append({"id": 99, "image_id": 1, "category_id": 1,
                                  "bbox": [200, 200, 100, 100], "area": 1e4,
                                  "iscrowd": 1})
        # det inside the crowd region: should be IGNORED, not an FP
        preds = make_preds([(1, [10, 10, 50, 50], 0.9),
                            (1, [210, 210, 80, 80], 0.8)])
        g, p = tmp_path / "gt.json", tmp_path / "p.json"
        g.write_text(json.dumps(gt))
        p.write_text(json.dumps(preds))
        assert evaluate_detection(str(g), str(p))["mAP"] == pytest.approx(1.0, abs=0.01)


def write_mot(path, rows):
    with open(path, "w") as f:
        for fr, tid, x, y, w, h in rows:
            f.write(f"{fr},{tid},{x},{y},{w},{h},1,-1,-1,-1\n")


class TestMOTEval:
    def test_perfect_tracking(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking

        rows = [(fr, 1, 10 + fr, 10, 50, 80) for fr in range(1, 11)]
        rows += [(fr, 2, 300, 10 + fr, 40, 60) for fr in range(1, 11)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, rows)
        write_mot(p, rows)
        r = evaluate_tracking(g, p)
        assert r["mota"] == pytest.approx(1.0)
        assert r["idf1"] == pytest.approx(1.0)
        assert r["num_switches"] == 0
        assert r["mostly_tracked"] == 2
        assert r["mostly_lost"] == 0

    def test_id_switch_counted(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking

        gt = [(fr, 1, 10, 10, 50, 80) for fr in range(1, 11)]
        pred = [(fr, 7 if fr <= 5 else 8, 10, 10, 50, 80) for fr in range(1, 11)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, gt)
        write_mot(p, pred)
        r = evaluate_tracking(g, p)
        assert r["num_switches"] == 1
        assert r["mota"] == pytest.approx(0.9)
        # IDF1: best global match covers 5 frames -> idtp=5, idfp=idfn=5
        assert r["idf1"] == pytest.approx(0.5)

    def test_missed_frames_mota(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking

        gt = [(fr, 1, 10, 10, 50, 80) for fr in range(1, 11)]
        pred = [(fr, 1, 10, 10, 50, 80) for fr in range(1, 6)]  # half missed
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, gt)
        write_mot(p, pred)
        r = evaluate_tracking(g, p)
        assert r["mota"] == pytest.approx(0.5)
        assert r["mostly_lost"] == 0
        assert r["mostly_tracked"] == 0

    def test_false_positives_penalize(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking

        gt = [(fr, 1, 10, 10, 50, 80) for fr in range(1, 11)]
        pred = gt + [(fr, 99, 500, 500, 50, 50) for fr in range(1, 6)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, [(f, t, x, y, w, h) for f, t, x, y, w, h in gt])
        write_mot(p, [(f, t, x, y, w, h) for f, t, x, y, w, h in pred])
        r = evaluate_tracking(g, p)
        assert r["mota"] == pytest.approx(0.5)  # 5 FP / 10 GT

    def test_continuity_prefers_previous_match(self, tmp_path):
        """Two overlapping preds: the one matched last frame keeps the GT."""
        from rtmodt_tpu.evaluation.mot_eval import evaluate_mot, load_mot_txt

        gt = [(fr, 1, 100, 100, 60, 90) for fr in range(1, 6)]
        # pred 5 tracks gt from frame 1; pred 6 appears later, slightly closer
        pred = [(fr, 5, 102, 102, 60, 90) for fr in range(1, 6)]
        pred += [(fr, 6, 100, 100, 60, 90) for fr in range(3, 6)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, gt)
        write_mot(p, pred)
        r = evaluate_mot(load_mot_txt(g), load_mot_txt(p))
        assert r["num_switches"] == 0

    def test_idf1_counts_gated_overlap_not_clear_matches(self, tmp_path):
        """Ristani ID measures: IDTP comes from a GLOBAL matching over
        per-pair spatially-compatible frames, not from CLEAR's per-frame
        assignment. Here p2 co-gates with gt on all 10 frames but CLEAR
        gives frames 1-2 to the closer p1: the old CLEAR-derived overlap
        capped (gt,p2) at 8 frames (idf1 0.8); the correct count is 10
        (idf1 = 20/22)."""
        from rtmodt_tpu.evaluation.mot_eval import evaluate_mot, load_mot_txt

        gt = [(fr, 1, 100, 100, 60, 90) for fr in range(1, 11)]
        pred = [(fr, 5, 100, 100, 60, 90) for fr in (1, 2)]     # exact: wins CLEAR
        pred += [(fr, 6, 103, 103, 60, 90) for fr in range(1, 11)]  # all 10, gated
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, gt)
        write_mot(p, pred)
        r = evaluate_mot(load_mot_txt(g), load_mot_txt(p))
        assert r["idf1"] == pytest.approx(20 / 22)


class TestHOTA:
    """HOTA (TrackEval protocol) on analytically solvable scenes."""

    def test_perfect_tracking_is_one(self, tmp_path):
        from rtmodt_tpu.evaluation.mot_eval import evaluate_mot, load_mot_txt

        rows = [(fr, tid, 10 + 80 * tid, 10, 50, 80)
                for fr in range(1, 11) for tid in (1, 2)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, rows)
        write_mot(p, rows)
        r = evaluate_mot(load_mot_txt(g), load_mot_txt(p))
        assert r["hota"] == pytest.approx(1.0)
        assert r["det_a"] == pytest.approx(1.0)
        assert r["ass_a"] == pytest.approx(1.0)
        assert r["loc_a"] == pytest.approx(1.0)

    def test_id_split_penalizes_association_only(self, tmp_path):
        """One GT track of 10 frames predicted as two 5-frame ids with
        exact boxes: DetA=1 (every frame a TP at every alpha); each pair's
        association Jaccard is 5/(10+5-5)=0.5, so AssA=0.5 and
        HOTA=sqrt(0.5)."""
        from rtmodt_tpu.evaluation.mot_eval import evaluate_hota, load_mot_txt

        gt = [(fr, 1, 100, 100, 60, 90) for fr in range(1, 11)]
        pred = [(fr, 5, 100, 100, 60, 90) for fr in range(1, 6)]
        pred += [(fr, 6, 100, 100, 60, 90) for fr in range(6, 11)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, gt)
        write_mot(p, pred)
        r = evaluate_hota(load_mot_txt(g), load_mot_txt(p))
        assert r["det_a"] == pytest.approx(1.0)
        assert r["ass_a"] == pytest.approx(0.5)
        assert r["hota"] == pytest.approx(np.sqrt(0.5))

    def test_localization_thresholds_average(self, tmp_path):
        """Boxes offset to IoU ~= 0.538: TPs only at alphas below that, so
        DetA averages the per-alpha step function (11 of 19 thresholds)."""
        from rtmodt_tpu.evaluation.mot_eval import (_iou_xywh, evaluate_hota,
                                                    load_mot_txt)

        gt = [(fr, 1, 100, 100, 60, 90) for fr in range(1, 11)]
        pred = [(fr, 5, 112, 112, 60, 90) for fr in range(1, 11)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, gt)
        write_mot(p, pred)
        iou = float(_iou_xywh(np.array([[100, 100, 60, 90.0]]),
                              np.array([[112, 112, 60, 90.0]]))[0, 0])
        alphas = np.arange(0.05, 0.99, 0.05)
        n_pass = int((alphas <= iou).sum())
        r = evaluate_hota(load_mot_txt(g), load_mot_txt(p))
        # below the cut every frame is TP (DetA=1, AssA=1); above, all
        # frames are FN+FP (DetA=0)
        assert r["det_a"] == pytest.approx(n_pass / len(alphas))
        assert r["hota"] == pytest.approx(n_pass / len(alphas))
        assert r["loc_a"] < 1.0

    def test_empty_and_surfaced_in_facade(self, tmp_path):
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking
        from rtmodt_tpu.evaluation.mot_eval import evaluate_hota

        assert evaluate_hota({1: {1: np.array([0, 0, 10, 10.0])}}, {})["hota"] == 0.0
        assert evaluate_hota({}, {})["hota"] == 1.0
        rows = [(fr, 1, 10, 10, 50, 80) for fr in range(1, 6)]
        g, p = str(tmp_path / "gt.txt"), str(tmp_path / "p.txt")
        write_mot(g, rows)
        write_mot(p, rows)
        r = evaluate_tracking(g, p)
        assert {"hota", "det_a", "ass_a", "loc_a"} <= set(r)


class TestHelpers:
    def test_confusion_matrix(self):
        from rtmodt_tpu.evaluation.metrics import build_confusion_matrix

        cm = build_confusion_matrix(np.array([0, 0, 1, 2, 5]),
                                    np.array([0, 1, 1, 2, 1]), 3)
        assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 1 and cm[2, 2] == 1
        assert cm.sum() == 4  # out-of-range label dropped

    def test_drift(self):
        from rtmodt_tpu.evaluation.metrics import measure_tracking_drift

        gt = {1: [(0, 0), (10, 0)], 2: [(5, 5)]}
        pred = {1: [(3, 4), (13, 4)], 3: [(0, 0)]}
        r = measure_tracking_drift(gt, pred)
        assert r["mean_drift_px"] == pytest.approx(5.0)
        assert r["per_track"] == {1: pytest.approx(5.0)}
