"""OC-SORT state-machine tests on synthetic detection sequences.

Scenario coverage for the three observation-centric mechanisms
(tracking/ocsort.py): OCM velocity-consistent association, OCR recovery on
last observations, and the closed-form ORU re-anchor after a lost stretch.
"""

import jax
import numpy as np
import pytest

from rtmodt_tpu.config.loader import OCSortConfig, load_config
from rtmodt_tpu.detection.detector import Detections
from rtmodt_tpu.tracking.tracker import MultiObjectTracker


def dets(boxes, conf, cls=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    conf = np.asarray(conf, np.float32)
    cls = np.zeros(len(boxes), np.int32) if cls is None else np.asarray(cls, np.int32)
    return Detections(boxes, conf, cls)


def walk(box, t, v=(4.0, 2.0)):
    return [box[0] + v[0] * t, box[1] + v[1] * t, box[2] + v[0] * t, box[3] + v[1] * t]


def make(min_hits=1, **kw):
    cfg = OCSortConfig(min_hits=min_hits, **kw)
    return MultiObjectTracker("ocsort", ocsort=cfg)


class TestOCSortCore:
    def test_id_persistence(self):
        tr = make()
        box = [100, 100, 200, 300]
        ids = []
        for t in range(10):
            tracks = tr.update(dets([walk(box, t)], [0.9]))
            assert len(tracks) == 1
            ids.append(tracks[0].track_id)
        assert set(ids) == {1}
        assert tracks[0].age == 10

    def test_min_hits_gate(self):
        # after the early-stream grace (frame_count <= min_hits), a newborn
        # track must build a 3-frame streak before it is emitted
        tr = make(min_hits=3)
        box_a = [100, 100, 200, 300]
        for t in range(6):                       # established scene
            tr.update(dets([walk(box_a, t)], [0.9]))
        born = [600, 600, 700, 800]
        out1 = tr.update(dets([walk(box_a, 6), born], [0.9, 0.9]))
        assert len(out1) == 1                    # newborn suppressed (streak 1)
        out2 = tr.update(dets([walk(box_a, 7), walk(born, 1)], [0.9, 0.9]))
        assert len(out2) == 1                    # streak 2
        out3 = tr.update(dets([walk(box_a, 8), walk(born, 2)], [0.9, 0.9]))
        assert len(out3) == 2                    # streak 3 -> visible

    def test_early_stream_grace(self):
        # SORT convention: during the first min_hits frames everything
        # matched is emitted (otherwise streams start blind)
        tr = make(min_hits=3)
        tracks = tr.update(dets([[10, 10, 50, 50]], [0.9]))
        assert len(tracks) == 1

    def test_two_objects_no_swap(self):
        tr = make()
        a = [100, 100, 200, 300]
        b = [800, 400, 900, 600]
        id_map = {}
        for t in range(10):
            tracks = tr.update(dets([walk(a, t), walk(b, t, (-3, 1))], [0.9, 0.85]))
            assert len(tracks) == 2
            for trk in tracks:
                cx = (trk.xyxy[0] + trk.xyxy[2]) / 2
                key = "a" if cx < 500 else "b"
                id_map.setdefault(key, trk.track_id)
                assert id_map[key] == trk.track_id
        assert id_map["a"] != id_map["b"]

    def test_max_age_expiry(self):
        tr = make(max_age=3)
        tr.update(dets([[100, 100, 200, 300]], [0.9]))
        for _ in range(5):
            assert tr.update(dets(np.zeros((0, 4)), [])) == []
        out = tr.update(dets([[100, 100, 200, 300]], [0.9]))
        assert out[0].track_id != 1

    def test_low_conf_ignored_without_byte(self):
        tr = make(use_byte=False)
        assert tr.update(dets([[10, 10, 50, 50]], [0.3])) == []

    def test_byte_stage_recovers_low_conf(self):
        tr = make(use_byte=True)
        box = [100, 100, 200, 300]
        for t in range(5):
            tr.update(dets([walk(box, t)], [0.9]))
        tracks = tr.update(dets([walk(box, 5)], [0.3]))
        assert [t.track_id for t in tracks] == [1]
        # the low det must never be born as a new track
        tracks = tr.update(dets([walk(box, 6)], [0.9]))
        assert [t.track_id for t in tracks] == [1]


class TestObservationCentric:
    def test_ocr_recovers_at_last_observation(self):
        """A fast mover occluded for several frames re-appears at its LAST
        OBSERVED position; the Kalman prediction has travelled far away, so
        the stage-1 IoU gate fails, but OCR (association on last_obs) must
        re-claim the id."""
        tr = make(max_age=20)
        box = [100, 100, 180, 260]
        v = (26.0, 0.0)                          # fast: 26 px/frame, 80px box
        last = None
        for t in range(8):
            last = walk(box, t, v)
            out = tr.update(dets([last], [0.9]))
            assert [o.track_id for o in out] == [1]
        for _ in range(6):                       # occlusion
            assert tr.update(dets(np.zeros((0, 4)), [])) == []
        # prediction is now ~6*26 = 156 px ahead (IoU with last obs ~ 0);
        # object re-appears where it was last seen
        out = tr.update(dets([last], [0.9]))
        assert [o.track_id for o in out] == [1]

    def test_oru_reanchors_velocity(self):
        """After OCR recovery the filter must trust observations, not the
        stale prior: the re-anchored velocity is the secant over the gap
        (zero here), so the next prediction stays near the observation and
        keeps matching in stage 1."""
        tr = make(max_age=20)
        box = [100, 100, 180, 260]
        v = (26.0, 0.0)
        last = None
        for t in range(8):
            last = walk(box, t, v)
            tr.update(dets([last], [0.9]))
        for _ in range(6):
            tr.update(dets(np.zeros((0, 4)), []))
        tr.update(dets([last], [0.9]))           # OCR + ORU re-anchor
        # stationary from now on: with the old velocity (26 px/frame) the
        # prediction would run away again; the re-anchored filter stays
        for _ in range(5):
            out = tr.update(dets([last], [0.9]))
            assert [o.track_id for o in out] == [1]
        got = out[0].xyxy
        assert np.all(np.abs(got - np.asarray(last)) < 20.0)

    def test_ocm_prefers_motion_consistent_match(self):
        """Two detections overlap the prediction equally; OCM's angle bonus
        must pick the one continuing the track's motion direction."""
        tr = make(vdc_weight=0.4)
        box = [100, 300, 180, 380]               # 80x80 moving right
        v = (10.0, 0.0)
        for t in range(8):
            cur = walk(box, t, v)
            out = tr.update(dets([cur], [0.9]))
        tid = out[0].track_id
        pred = walk(box, 8, v)                   # next predicted position
        # candidate A continues rightward (+10 x), candidate B mirrors
        # upward (+10 y offset instead): both have the SAME IoU with pred
        cand_a = [pred[0] + 8, pred[1], pred[2] + 8, pred[3]]
        cand_b = [pred[0], pred[1] + 8, pred[2], pred[3] + 8]
        out = tr.update(dets([cand_b, cand_a], [0.9, 0.9]))
        by_id = {o.track_id: o for o in out}
        got = by_id[tid].xyxy
        # the track must have taken candidate A (motion-consistent)
        assert abs(got[0] - cand_a[0]) < abs(got[0] - cand_b[0])
        assert abs(got[1] - cand_a[1]) < abs(got[1] - cand_b[1])


class TestStopGoScenario:
    def test_ocsort_beats_motion_trackers_on_stopgo(self):
        """The documented headline (docs/RESULTS.md): on re-appearance at
        the last observed position, OC-SORT keeps ids where the Kalman-IoU
        tracker churns them."""
        from tools.compare_trackers import build_stopgo, run_tracker

        frames_bgr, gt = build_stopgo(frames=24, objects=2, gap=5)
        oc = run_tracker("ocsort", dict(
            algorithm="ocsort",
            ocsort=dict(det_thresh=0.5, min_hits=1, max_age=30)),
            frames_bgr, gt)
        bt = run_tracker("bytetrack", dict(
            algorithm="bytetrack",
            bytetrack=dict(match_metric="iou_distance")), frames_bgr, gt)
        assert oc["idf1"] > bt["idf1"]
        assert oc["switches"] <= bt["switches"]
        assert oc["idf1"] > 0.9


class TestFacadeIntegration:
    def test_config_roundtrip(self):
        cfg = load_config(overrides={"tracking": {"algorithm": "ocsort",
                                                  "ocsort": {"min_hits": 2}}})
        assert cfg.tracking.algorithm == "ocsort"
        assert cfg.tracking.ocsort.min_hits == 2

    def test_config_validation(self):
        with pytest.raises(ValueError):
            load_config(overrides={"tracking": {"ocsort": {"min_hits": 0}}})
        with pytest.raises(ValueError):
            load_config(overrides={"tracking": {"ocsort": {"iou_threshold": 1.5}}})

    def test_save_load_state(self, tmp_path):
        tr = make()
        box = [100, 100, 200, 300]
        for t in range(5):
            tr.update(dets([walk(box, t)], [0.9]))
        p = str(tmp_path / "state.npz")
        tr.save_state(p)
        tr2 = make()
        tr2.load_state(p)
        out = tr2.update(dets([walk(box, 5)], [0.9]))
        assert [o.track_id for o in out] == [1]

    def test_reset(self):
        tr = make()
        tr.update(dets([[10, 10, 50, 50]], [0.9]))
        tr.reset()
        out = tr.update(dets([[10, 10, 50, 50]], [0.9]))
        assert [o.track_id for o in out] == [1]

    def test_unknown_algorithm_rejected(self):
        with pytest.raises(ValueError):
            MultiObjectTracker("sortx")


class TestPipelineIntegration:
    def test_fused_chunk_path_runs_ocsort(self):
        """The packed chunk program compiles and tracks with ocsort on the
        CPU mesh (same harness as the bytetrack pipeline tests)."""
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 256},
            "tracking": {"algorithm": "ocsort", "ocsort": {"min_hits": 1,
                                                           "det_thresh": 0.05}},
            "profiling": {"per_stage": False, "warmup_frames": 0,
                          "log_interval": 0},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        pipe = Pipeline(cfg)
        frames = np.stack([moving_boxes_frame(t, 288, 512, n_objects=2)[0]
                           for t in range(4)])
        outs, _ = pipe.submit_chunk_packed(frames)
        tracks = pipe.tracker.tracks_chunk_from_outputs(
            jax.device_get(outs), pipe.detector.class_names)
        assert len(tracks) == 4  # one list per frame (content may be empty
        # with random weights; the contract is shape + no crash)

    def test_multistream_spmd_runs_ocsort(self):
        """The S-stream SPMD program compiles and steps with ocsort state
        sharded over the 8-device mesh."""
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 32,
                          "max_detections": 8, "classes": None},
            "tracking": {"algorithm": "ocsort",
                         "ocsort": {"max_tracks": 16, "min_hits": 1}},
            "profiling": {"per_stage": False},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        msp = MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))
        frames = np.random.default_rng(0).integers(
            0, 255, (8, 160, 160, 3), np.uint8)
        outs, ress = msp.step(frames)
        assert outs.boxes.shape == (8, 16, 4)
        shard_counts = {len(x.sharding.device_set) for x in
                        jax.tree.leaves(msp.state)}
        assert shard_counts == {8}
        assert np.isfinite(jax.device_get(outs).boxes).all()
