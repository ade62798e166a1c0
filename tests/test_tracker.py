"""ByteTrack state-machine tests on synthetic detection sequences
(the unit coverage the reference lacks entirely - SURVEY.md 4)."""

import numpy as np
import pytest

from rtmodt_tpu.config.loader import ByteTrackConfig
from rtmodt_tpu.detection.detector import Detections
from rtmodt_tpu.tracking.tracker import MultiObjectTracker


def dets(boxes, conf, cls=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    conf = np.asarray(conf, np.float32)
    cls = np.zeros(len(boxes), np.int32) if cls is None else np.asarray(cls, np.int32)
    return Detections(boxes, conf, cls)


def walk(box, t, v=(4.0, 2.0)):
    return [box[0] + v[0] * t, box[1] + v[1] * t, box[2] + v[0] * t, box[3] + v[1] * t]


@pytest.fixture(params=["greedy", "lapjv"])
def tracker(request):
    cfg = ByteTrackConfig(assignment=request.param, motion_model="kalman",
                          match_thresh=0.3)
    return MultiObjectTracker("bytetrack", bytetrack=cfg)


class TestByteTrack:
    def test_id_persistence(self, tracker):
        box = [100, 100, 200, 300]
        ids = []
        for t in range(10):
            tracks = tracker.update(dets([walk(box, t)], [0.9]))
            assert len(tracks) == 1
            ids.append(tracks[0].track_id)
        assert len(set(ids)) == 1
        assert ids[0] == 1
        assert tracks[0].age == 10

    def test_two_objects_no_swap(self, tracker):
        a = [100, 100, 200, 300]
        b = [800, 400, 900, 600]
        id_map = {}
        for t in range(10):
            tracks = tracker.update(dets([walk(a, t), walk(b, t, (-3, 1))], [0.9, 0.85]))
            assert len(tracks) == 2
            for tr in tracks:
                cx = (tr.xyxy[0] + tr.xyxy[2]) / 2
                key = "a" if cx < 500 else "b"
                id_map.setdefault(key, tr.track_id)
                assert id_map[key] == tr.track_id
        assert id_map["a"] != id_map["b"]

    def test_low_conf_second_stage_recovers(self, tracker):
        box = [100, 100, 200, 300]
        for t in range(5):
            tracker.update(dets([walk(box, t)], [0.9]))
        # occlusion: detection drops below track_thresh but above low_thresh
        tracks = tracker.update(dets([walk(box, 5)], [0.3]))
        assert len(tracks) == 1
        assert tracks[0].track_id == 1
        # and no new track is spawned from the low det
        tracks = tracker.update(dets([walk(box, 6)], [0.9]))
        assert [t.track_id for t in tracks] == [1]

    def test_low_conf_does_not_spawn(self, tracker):
        tracks = tracker.update(dets([[10, 10, 50, 50]], [0.3]))
        assert tracks == []

    def test_track_buffer_expiry(self):
        cfg = ByteTrackConfig(track_buffer=3, match_thresh=0.3)
        tr = MultiObjectTracker("bytetrack", bytetrack=cfg)
        tr.update(dets([[100, 100, 200, 300]], [0.9]))
        for _ in range(5):
            out = tr.update(dets(np.zeros((0, 4)), []))
            assert out == []
        # after expiry, same box gets a NEW id
        out = tr.update(dets([[100, 100, 200, 300]], [0.9]))
        assert out[0].track_id == 2

    def test_reappear_within_buffer_keeps_id(self, tracker):
        box = [100, 100, 200, 300]
        for t in range(5):
            tracker.update(dets([walk(box, t)], [0.9]))
        for _ in range(3):  # missed frames within buffer
            tracker.update(dets(np.zeros((0, 4)), []))
        tracks = tracker.update(dets([walk(box, 8)], [0.9]))
        assert len(tracks) == 1
        assert tracks[0].track_id == 1

    def test_trail_accumulates_and_caps(self):
        cfg = ByteTrackConfig(match_thresh=0.3)
        tr = MultiObjectTracker("bytetrack", trail_length=5, bytetrack=cfg)
        box = [100, 100, 200, 300]
        for t in range(10):
            tracks = tr.update(dets([walk(box, t)], [0.9]))
        assert len(tracks[0].trail) == 5

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            MultiObjectTracker("sort2000")


class TestQualityKnobs:
    def test_fuse_score_and_gating_track_normally(self):
        cfg = ByteTrackConfig(match_thresh=0.25, fuse_score=True,
                              gate_distance=True)
        tr = MultiObjectTracker("bytetrack", bytetrack=cfg)
        box = [100, 100, 200, 300]
        for t in range(8):
            tracks = tr.update(dets([walk(box, t)], [0.9]))
        assert len(tracks) == 1 and tracks[0].track_id == 1

    def test_gating_rejects_teleporting_match(self):
        """A detection overlapping in IoU terms but wildly inconsistent with
        the Kalman prediction must NOT be matched when gating is on."""
        import numpy as _np

        # pin the reference-compat gate: the scenario calibrates "matchable
        # by IoU" as IoU >= 0.1, independent of the default match metric
        cfg_on = ByteTrackConfig(match_thresh=0.1, match_metric="iou",
                                 gate_distance=True)
        cfg_off = ByteTrackConfig(match_thresh=0.1, match_metric="iou",
                                  gate_distance=False)
        results = {}
        for name, cfg in (("on", cfg_on), ("off", cfg_off)):
            tr = MultiObjectTracker("bytetrack", bytetrack=cfg)
            # establish a confident, fast-moving track (vx = 20 px/frame)
            box = _np.array([100, 100, 200, 300], _np.float32)
            vx = _np.array([20, 0, 20, 0], _np.float32)
            for t in range(12):
                tr.update(dets([box + t * vx], [0.9]))
            # next frame: detection 60 px behind the Kalman prediction -
            # IoU with the prediction is ~0.25 (matchable at thresh 0.1) but
            # ~6 sigma off the motion model (well past the chi2 gate)
            tele = box + 12 * vx - _np.array([60, 0, 60, 0], _np.float32)
            out = tr.update(dets([tele], [0.9]))
            results[name] = [t.track_id for t in out]
        # without gating the stale overlap can re-match id 1; with gating the
        # det must spawn a NEW id (2) because it violates the motion model
        assert results["on"] == [2], results
        assert results["off"] != results["on"]


class TestStateSerialization:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = ByteTrackConfig(match_thresh=0.3)
        tr = MultiObjectTracker("bytetrack", bytetrack=cfg)
        box = [100, 100, 200, 300]
        for t in range(5):
            tr.update(dets([walk(box, t)], [0.9]))
        path = str(tmp_path / "tracker_state.npz")
        tr.save_state(path)

        tr2 = MultiObjectTracker("bytetrack", bytetrack=cfg)
        tr2.load_state(path)
        # resumed tracker continues the SAME id
        out_a = tr.update(dets([walk(box, 5)], [0.9]))
        out_b = tr2.update(dets([walk(box, 5)], [0.9]))
        assert out_a[0].track_id == out_b[0].track_id == 1
        np.testing.assert_allclose(out_a[0].xyxy, out_b[0].xyxy, atol=1e-4)
        assert len(out_b[0].trail) == len(out_a[0].trail)


    def test_save_state_on_fresh_tracker(self, tmp_path):
        """Empty trail map (fresh/reset tracker) must serialize cleanly -
        reshape(-1) used to fail on the size-0 array."""
        tr = MultiObjectTracker("bytetrack", bytetrack=ByteTrackConfig())
        p = str(tmp_path / "fresh.npz")
        tr.save_state(p)
        tr2 = MultiObjectTracker("bytetrack", bytetrack=ByteTrackConfig())
        tr2.load_state(p)
        out = tr2.update(dets([[10, 10, 60, 100]], [0.9]))
        assert out[0].track_id == 1


class TestDeviceHostParity:
    """Device greedy tracker vs host LAPJV tracker on well-separated scenes
    (where greedy and optimal assignment agree) must produce identical ids."""

    def test_parity_on_separated_objects(self, rng):
        cfg_d = ByteTrackConfig(assignment="greedy", motion_model="kalman", match_thresh=0.3)
        cfg_h = ByteTrackConfig(assignment="lapjv", motion_model="kalman", match_thresh=0.3)
        dev = MultiObjectTracker("bytetrack", bytetrack=cfg_d)
        host = MultiObjectTracker("bytetrack", bytetrack=cfg_h)

        origins = [(100, 100), (500, 100), (900, 400), (200, 600)]
        vels = [(4, 2), (-3, 1), (0, -2), (2, 0)]
        for t in range(15):
            boxes, confs = [], []
            for (ox, oy), (vx, vy) in zip(origins, vels):
                boxes.append([ox + vx * t, oy + vy * t, ox + 80 + vx * t, oy + 120 + vy * t])
                confs.append(0.9)
            # drop one object for 2 frames mid-sequence
            if t in (7, 8):
                boxes, confs = boxes[:-1], confs[:-1]
            d = dets(boxes, confs)
            td = {tuple(np.round(x.xyxy, -1)): x.track_id for x in dev.update(d)}
            th = {tuple(np.round(x.xyxy, -1)): x.track_id for x in host.update(d)}
            assert set(td.values()) == set(th.values()), f"frame {t}"

    def test_new_track_thresh_gates_births_on_both_backends(self):
        """Canonical ByteTrack activates a track only when its score clears
        new_track_thresh: an unmatched det in [track_thresh,
        new_track_thresh) is discarded, not born. The field existed in the
        config but was never read."""
        for assignment in ("greedy", "lapjv"):
            cfg = ByteTrackConfig(assignment=assignment, track_thresh=0.5,
                                  new_track_thresh=0.7, match_thresh=0.8)
            tr = MultiObjectTracker("bytetrack", bytetrack=cfg)
            out = tr.update(dets([[10, 10, 60, 100]], [0.6]))     # below gate
            assert out == [], assignment
            out = tr.update(dets([[200, 10, 260, 100]], [0.75]))  # above gate
            assert [t.track_id for t in out] == [1], assignment

    def test_host_gate_matches_device_semantics(self):
        """Default ``match_metric: iou_distance`` accepts IoU >= 1 -
        match_thresh on BOTH backends. A 100 px box shifted 30 px/frame has
        consecutive IoU ~0.32: accepted at the canonical 0.2 floor, but the
        host path used to demand IoU >= match_thresh (0.8) and churn a new
        id every frame."""
        cfg_h = ByteTrackConfig(assignment="lapjv", motion_model="none",
                                match_thresh=0.8)
        host = MultiObjectTracker("bytetrack", bytetrack=cfg_h)
        box = np.array([100, 100, 200, 200], np.float32)
        ids = [host.update(dets([box + 30 * t], [0.9]))[0].track_id
               for t in range(5)]
        assert ids == [1] * 5

    def test_facade_pads_to_buckets_not_exact_counts(self):
        """update() pads detections to power-of-two buckets so varying
        per-frame counts reuse one compiled program instead of re-tracing."""
        tr = MultiObjectTracker("bytetrack",
                                bytetrack=ByteTrackConfig(match_thresh=0.3))
        if not hasattr(tr._step, "_cache_size"):
            pytest.skip("jit cache introspection unavailable")
        for d in (1, 3, 5, 8):
            boxes = [[10 + 60 * i, 10, 50 + 60 * i, 80] for i in range(d)]
            tr.update(dets(boxes, [0.9] * d))
        assert tr._step._cache_size() == 1          # one bucket covers d<=8
        boxes = [[10 + 60 * i, 10, 50 + 60 * i, 80] for i in range(9)]
        tr.update(dets(boxes, [0.9] * 9))
        assert tr._step._cache_size() == 2          # next bucket (16)

    def test_kalman_none_matches_reference_mode(self):
        """motion_model=none: matched boxes are the raw detections."""
        cfg = ByteTrackConfig(assignment="greedy", motion_model="none", match_thresh=0.3)
        tr = MultiObjectTracker("bytetrack", bytetrack=cfg)
        box = np.array([100, 100, 200, 300], np.float32)
        for t in range(3):
            tracks = tr.update(dets([box + 5 * t], [0.9]))
        np.testing.assert_allclose(tracks[0].xyxy, box + 10, atol=1e-4)


class TestDeepSort:
    """DeepSORT state machine on synthetic sequences (the reference only
    declares deepsort config, default.yaml:53-60, and raises on dispatch)."""

    def _update(self, state, boxes, conf, feats, cfg, cls=None):
        import jax.numpy as jnp
        from rtmodt_tpu.tracking.deepsort import deepsort_update

        boxes = jnp.asarray(boxes, jnp.float32).reshape(-1, 4)
        d = boxes.shape[0]
        conf = jnp.asarray(conf, jnp.float32)
        cls = jnp.zeros((d,), jnp.int32) if cls is None else jnp.asarray(cls, jnp.int32)
        valid = jnp.ones((d,), bool)
        feats = jnp.asarray(feats, jnp.float32)
        return deepsort_update(state, boxes, conf, cls, valid, feats, cfg)

    @staticmethod
    def _unit(i, dim=8):
        v = np.zeros(dim, np.float32)
        v[i] = 1.0
        return v

    def _cfg(self, **kw):
        from rtmodt_tpu.config.loader import DeepSortConfig
        kw.setdefault("embed_dim", 8)
        kw.setdefault("max_tracks", 16)
        return DeepSortConfig(**kw)

    def _state(self, cfg):
        from rtmodt_tpu.tracking.deepsort import init_deepsort_state
        return init_deepsort_state(cfg.max_tracks, cfg.embed_dim)

    def test_n_init_confirmation(self):
        """A track is emitted only after n_init consecutive matches."""
        cfg = self._cfg(n_init=3)
        st = self._state(cfg)
        f = self._unit(0)
        vis_counts = []
        for t in range(5):
            st, out = self._update(st, [[10 + t, 10, 90 + t, 200]], [0.9], [f], cfg)
            vis_counts.append(int(np.sum(np.asarray(out.visible))))
        assert vis_counts == [0, 0, 1, 1, 1]

    def test_tentative_miss_deletes(self):
        """An unconfirmed track that misses one frame dies immediately."""
        cfg = self._cfg(n_init=3)
        st = self._state(cfg)
        f = self._unit(0)
        st, _ = self._update(st, [[10, 10, 90, 200]], [0.9], [f], cfg)
        assert int(np.sum(np.asarray(st.active))) == 1
        # empty frame (conf below min_confidence -> ineligible)
        st, _ = self._update(st, [[0, 0, 1, 1]], [0.0], [self._unit(1)], cfg)
        assert int(np.sum(np.asarray(st.active))) == 0

    def test_confirmed_survives_max_age(self):
        """A confirmed track is retained through max_age misses, then dies."""
        cfg = self._cfg(n_init=1, max_age=3)
        st = self._state(cfg)
        f = self._unit(0)
        st, _ = self._update(st, [[10, 10, 90, 200]], [0.9], [f], cfg)
        for _ in range(3):
            st, _ = self._update(st, [[0, 0, 1, 1]], [0.0], [self._unit(1)], cfg)
            assert int(np.sum(np.asarray(st.active))) == 1
        st, _ = self._update(st, [[0, 0, 1, 1]], [0.0], [self._unit(1)], cfg)
        assert int(np.sum(np.asarray(st.active))) == 0

    def test_appearance_resolves_crossing(self):
        """Two objects swap positions; appearance keeps IDs where IoU-only
        association would swap them."""
        cfg = self._cfg(n_init=1, max_dist=0.4, gate_distance=False)
        st = self._state(cfg)
        fa, fb = self._unit(0), self._unit(1)
        a0, b0 = np.array([0, 0, 80, 120], np.float32), np.array([300, 0, 380, 120], np.float32)
        ids = {}
        for t in range(11):
            lam = t / 10.0
            a = a0 * (1 - lam) + b0 * lam       # a moves to b's start
            b = b0 * (1 - lam) + a0 * lam       # b moves to a's start
            st, out = self._update(st, [a, b], [0.9, 0.9], [fa, fb], cfg)
            vis = np.where(np.asarray(out.visible))[0]
            if t == 0:
                boxes = np.asarray(out.boxes)[vis]
                # map slot order to (a, b) by x-position
                order = np.argsort(boxes[:, 0])
                ids["a"], ids["b"] = (int(np.asarray(out.track_id)[vis][order[0]]),
                                      int(np.asarray(out.track_id)[vis][order[1]]))
        # after the full swap, appearance-id a is at b's start (right side)
        boxes = np.asarray(out.boxes)[vis]
        tids = np.asarray(out.track_id)[vis]
        right = int(tids[np.argmax(boxes[:, 0])])
        left = int(tids[np.argmin(boxes[:, 0])])
        assert right == ids["a"] and left == ids["b"]

    def test_min_confidence_filters(self):
        cfg = self._cfg(n_init=1, min_confidence=0.5)
        st = self._state(cfg)
        st, out = self._update(st, [[10, 10, 90, 200]], [0.4], [self._unit(0)], cfg)
        assert int(np.sum(np.asarray(st.active))) == 0

    def test_facade_end_to_end(self):
        """MultiObjectTracker('deepsort') on a frame: stable IDs, trails."""
        tr = MultiObjectTracker("deepsort", deepsort={
            "n_init": 2, "min_confidence": 0.3, "embed_dim": 32})
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (160, 160, 3), np.uint8)
        frame[20:60, 20:50] = [255, 0, 0]
        frame[90:130, 100:130] = [0, 255, 0]
        seen = []
        for t in range(5):
            d = dets([[20 + t, 20, 50 + t, 60], [100, 90 + t, 130, 130 + t]],
                     [0.9, 0.8])
            tracks = tr.update(d, frame=frame)
            seen.append(sorted(x.track_id for x in tracks))
        assert seen[0] == []                    # tentative
        assert all(s == seen[1] for s in seen[1:])
        assert len(seen[1]) == 2
        assert len(tracks[0].trail) == 4

    def test_facade_requires_frame(self):
        tr = MultiObjectTracker("deepsort", deepsort={"embed_dim": 32})
        with pytest.raises(ValueError, match="frame"):
            tr.update(dets([[0, 0, 10, 10]], [0.9]))

    def test_shipped_embedder_weights_picked_up_by_default(self):
        """Empty ``embedder`` config adopts the in-repo trained checkpoint
        (checkpoints/embedder.npz); shape-incompatible configs fall back to
        random init instead of erroring; an explicit bad path still raises."""
        import pathlib

        import numpy as np

        npz = pathlib.Path(__file__).resolve().parents[1] / "checkpoints" / "embedder.npz"
        if not npz.exists():
            pytest.skip("shipped embedder checkpoint absent")
        tr = MultiObjectTracker("deepsort", deepsort={})   # defaults: 128-d
        loaded = dict(np.load(npz))
        proj = np.asarray(tr.embedder_params["params"]["proj"]["kernel"])
        assert proj.shape == loaded["params/proj/kernel"].shape
        np.testing.assert_array_equal(proj, loaded["params/proj/kernel"])

        # incompatible embed_dim -> graceful random init, not an error
        tr32 = MultiObjectTracker("deepsort", deepsort={"embed_dim": 32})
        assert tr32.embedder_params is not None

        # explicit "random" opts out of the shipped-weights fallback
        trr = MultiObjectTracker("deepsort", deepsort={"embedder": "random"})
        proj_r = np.asarray(trr.embedder_params["params"]["proj"]["kernel"])
        assert not np.array_equal(proj_r, loaded["params/proj/kernel"])

        with pytest.raises((ValueError, FileNotFoundError)):
            MultiObjectTracker("deepsort",
                               deepsort={"embedder": "/nonexistent/w.npz"})

    def test_state_roundtrip(self, tmp_path):
        tr = MultiObjectTracker("deepsort", deepsort={"n_init": 1, "embed_dim": 32})
        frame = np.random.default_rng(1).integers(0, 255, (120, 120, 3), np.uint8)
        tr.update(dets([[10, 10, 60, 100]], [0.9]), frame=frame)
        p = str(tmp_path / "ds_state.npz")
        tr.save_state(p)
        tr2 = MultiObjectTracker("deepsort", deepsort={"n_init": 1, "embed_dim": 32})
        tr2.load_state(p)
        a = tr.update(dets([[12, 12, 62, 102]], [0.9]), frame=frame)
        b = tr2.update(dets([[12, 12, 62, 102]], [0.9]), frame=frame)
        assert [x.track_id for x in a] == [x.track_id for x in b]
