"""BoT-SORT tracker tests (tracking/botsort.py - framework extension).

Core state machine on synthetic sequences, the fused motion+appearance
cost's decision behavior, facade integration, and the fused/packed and
multi-stream SPMD pipeline paths on the CPU mesh.
"""

import jax
import numpy as np
import pytest

from rtmodt_tpu.config import load_config
from rtmodt_tpu.config.loader import BotSortConfig
from rtmodt_tpu.tracking.tracker import MultiObjectTracker


def _unit(i, dim=8):
    v = np.zeros(dim, np.float32)
    v[i] = 1.0
    return v


def _cfg(**kw):
    kw.setdefault("embed_dim", 8)
    kw.setdefault("max_tracks", 16)
    return BotSortConfig(**kw)


def _state(cfg):
    from rtmodt_tpu.tracking.botsort import init_botsort_state
    return init_botsort_state(cfg.max_tracks, cfg.embed_dim)


def _update(state, boxes, conf, feats, cfg, cls=None, valid=None):
    """Static-shape contract like the pipelines: detections are padded
    slots with a validity mask, never zero-size arrays."""
    import jax.numpy as jnp

    from rtmodt_tpu.tracking.botsort import botsort_update

    boxes = jnp.asarray(boxes, jnp.float32).reshape(-1, 4)
    d = boxes.shape[0]
    if d == 0:
        boxes = jnp.zeros((1, 4), jnp.float32)
        conf = jnp.zeros((1,), jnp.float32)
        cls = jnp.full((1,), -1, jnp.int32)
        valid = jnp.zeros((1,), bool)
        feats = jnp.zeros((1, cfg.embed_dim), jnp.float32)
        return botsort_update(state, boxes, conf, cls, valid, feats, cfg)
    conf = jnp.asarray(conf, jnp.float32)
    cls = jnp.zeros((d,), jnp.int32) if cls is None else jnp.asarray(cls, jnp.int32)
    valid = jnp.ones((d,), bool) if valid is None else jnp.asarray(valid, bool)
    feats = jnp.asarray(feats, jnp.float32)
    return botsort_update(state, boxes, conf, cls, valid, feats, cfg)


class TestBotSortCore:
    def test_birth_and_id_persistence(self):
        cfg = _cfg()
        st = _state(cfg)
        f = _unit(0)
        ids = []
        for t in range(4):
            st, out = _update(st, [[10 + 3 * t, 10, 90 + 3 * t, 200]],
                              [0.9], [f], cfg)
            vis = np.where(np.asarray(out.visible))[0]
            assert len(vis) == 1          # births visible immediately
            ids.append(int(np.asarray(out.track_id)[vis[0]]))
        assert ids == [1, 1, 1, 1]

    def test_low_conf_second_stage_keeps_track(self):
        """A detection dropping below track_thresh (but above low_thresh)
        still matches in the BYTE second stage - no id churn."""
        cfg = _cfg(track_thresh=0.5, low_thresh=0.1)
        st = _state(cfg)
        f = _unit(0)
        st, out = _update(st, [[100, 100, 200, 300]], [0.9], [f], cfg)
        st, out = _update(st, [[102, 102, 202, 302]], [0.2], [f], cfg)
        vis = np.where(np.asarray(out.visible))[0]
        assert len(vis) == 1
        assert int(np.asarray(out.track_id)[vis[0]]) == 1

    def test_track_buffer_expiry(self):
        cfg = _cfg(track_buffer=2)
        st = _state(cfg)
        f = _unit(0)
        st, _ = _update(st, [[10, 10, 90, 200]], [0.9], [f], cfg)
        empty = np.zeros((0, 4), np.float32)
        for _ in range(3):
            st, out = _update(st, empty, np.zeros(0), np.zeros((0, 8)), cfg)
        assert not np.asarray(st.active).any()
        # a re-detection after expiry is a NEW id
        st, out = _update(st, [[10, 10, 90, 200]], [0.9], [f], cfg)
        vis = np.where(np.asarray(out.visible))[0]
        assert int(np.asarray(out.track_id)[vis[0]]) == 2

    def test_new_track_thresh_gates_births(self):
        cfg = _cfg(track_thresh=0.5, new_track_thresh=0.7)
        st = _state(cfg)
        st, out = _update(st, [[10, 10, 90, 200]], [0.6], [_unit(0)], cfg)
        assert not np.asarray(out.visible).any()   # 0.6 < birth gate 0.7
        st, out = _update(st, [[10, 10, 90, 200]], [0.8], [_unit(0)], cfg)
        assert np.asarray(out.visible).sum() == 1


class TestFusedCost:
    def test_appearance_breaks_motion_tie(self):
        """Two candidate detections both overlap the track; the one with the
        matching appearance wins even though the other has HIGHER IoU -
        min(d_iou, d_emb) prefers the appearance-consistent pair."""
        cfg = _cfg(track_thresh=0.3, new_track_thresh=0.3)
        st = _state(cfg)
        fa, fb = _unit(0), _unit(1)
        st, _ = _update(st, [[100, 100, 200, 300]], [0.9], [fa], cfg)
        # det A: higher IoU, wrong appearance; det B: lower IoU, right one
        det_a = [95, 100, 195, 300]     # IoU ~0.9 with the track
        det_b = [130, 100, 230, 300]    # IoU ~0.54
        st, out = _update(st, [det_a, det_b], [0.9, 0.9], [fb, fa], cfg)
        vis = np.where(np.asarray(out.visible))[0]
        boxes = np.asarray(out.boxes)
        tid = np.asarray(out.track_id)
        kept = {int(tid[i]): boxes[i] for i in vis}
        # track 1 continued on det B (appearance match): its Kalman-updated
        # center moved right, past det A's center
        assert 1 in kept and kept[1][0] > 110
        # det A started a fresh track
        assert 2 in kept

    def test_appearance_ignored_outside_proximity_gate(self):
        """A far-away detection with a PERFECT appearance match must not
        associate: the proximity gate (1 - IoU <= proximity_thresh) forces
        d_emb to 1 and d_iou alone exceeds match_thresh -> new id."""
        cfg = _cfg(proximity_thresh=0.5, match_thresh=0.8)
        st = _state(cfg)
        f = _unit(0)
        st, _ = _update(st, [[10, 10, 60, 110]], [0.9], [f], cfg)
        st, out = _update(st, [[300, 300, 350, 400]], [0.9], [f], cfg)
        vis = np.where(np.asarray(out.visible))[0]
        assert [int(np.asarray(out.track_id)[i]) for i in vis] == [2]

    def test_gallery_ema_updates_on_match(self):
        cfg = _cfg(ema_alpha=0.5)
        st = _state(cfg)
        fa, fb = _unit(0), _unit(1)
        st, _ = _update(st, [[10, 10, 90, 200]], [0.9], [fa], cfg)
        st, _ = _update(st, [[12, 12, 92, 202]], [0.9], [fb], cfg)
        feat = np.asarray(st.feat[0])
        # EMA of two orthogonal unit vectors, renormalized
        assert feat[0] == pytest.approx(feat[1])
        assert feat[0] == pytest.approx(1 / np.sqrt(2), abs=1e-5)


class TestFacadeIntegration:
    def test_config_roundtrip_and_validation(self):
        cfg = load_config(overrides={
            "tracking": {"algorithm": "botsort",
                         "botsort": {"appearance_thresh": 0.3}}})
        assert cfg.tracking.algorithm == "botsort"
        assert cfg.tracking.botsort.appearance_thresh == 0.3
        with pytest.raises(ValueError):
            load_config(overrides={"tracking": {"botsort": {"proximity_thresh": 1.5}}})

    def _make(self):
        return MultiObjectTracker("botsort", botsort={
            "embed_dim": 32, "embedder": "random", "max_tracks": 16})

    @staticmethod
    def _dets(boxes, confs):
        from rtmodt_tpu.detection.detector import Detections
        return Detections(np.asarray(boxes, np.float32).reshape(-1, 4),
                          np.asarray(confs, np.float32),
                          np.zeros(len(confs), np.int32), ["obj"])

    def test_update_requires_frame(self):
        tr = self._make()
        with pytest.raises(ValueError, match="botsort"):
            tr.update(self._dets([[10, 10, 50, 50]], [0.9]))

    def test_update_tracks_and_trails(self):
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
        tr = self._make()
        ids = set()
        for t in range(3):
            out = tr.update(self._dets([[10 + 5 * t, 10, 90 + 5 * t, 200]],
                                       [0.9]), frame)
            assert len(out) == 1
            ids.add(out[0].track_id)
        assert ids == {1}
        assert len(out[0].trail) == 3

    def test_save_load_reset(self, tmp_path):
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
        tr = self._make()
        for t in range(3):
            tr.update(self._dets([[10 + t, 10, 90 + t, 200]], [0.9]), frame)
        p = str(tmp_path / "bs.npz")
        tr.save_state(p)
        tr2 = self._make()
        tr2.load_state(p)
        out = tr2.update(self._dets([[14, 10, 94, 200]], [0.9]), frame)
        assert [o.track_id for o in out] == [1]
        tr2.reset()
        out = tr2.update(self._dets([[14, 10, 94, 200]], [0.9]), frame)
        assert [o.track_id for o in out] == [1]


class TestPipelineIntegration:
    def test_fused_chunk_path_runs_botsort(self):
        """The packed chunk program (ROI crops from Y/U/V planes + embedder
        + botsort scan) compiles and runs on the CPU mesh."""
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 256},
            "tracking": {"algorithm": "botsort",
                         "botsort": {"track_thresh": 0.05,
                                     "new_track_thresh": 0.05,
                                     "embedder": "random"}},
            "profiling": {"per_stage": False, "warmup_frames": 0,
                          "log_interval": 0},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        pipe = Pipeline(cfg)
        assert pipe._is_appearance
        frames = np.stack([moving_boxes_frame(t, 288, 512, n_objects=2)[0]
                           for t in range(4)])
        outs, _ = pipe.submit_chunk_packed(frames)
        tracks = pipe.tracker.tracks_chunk_from_outputs(
            jax.device_get(outs), pipe.detector.class_names)
        assert len(tracks) == 4

    @pytest.mark.parametrize("algo", ["botsort", "deepsort"])
    def test_step_packed_runs_appearance(self, algo):
        """The per-frame packed-I420 path (the low-latency live program)
        embeds ROI crops from the padded planes for BOTH appearance
        trackers - previously it raised NotImplementedError."""
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 256},
            "tracking": {"algorithm": algo,
                         algo: {"embedder": "random", "max_tracks": 16,
                                **({"n_init": 1} if algo == "deepsort"
                                   else {})}},
            "profiling": {"per_stage": False, "warmup_frames": 0,
                          "log_interval": 0},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        pipe = Pipeline(cfg)
        assert pipe._use_packed_transport()
        for t in range(3):
            frame = moving_boxes_frame(t, 288, 512, n_objects=2)[0]
            tracks, events, res = pipe.step_packed(frame, t, t / 30.0)
        assert isinstance(tracks, list)      # contract: runs, no crash
        assert np.isfinite(np.asarray(jax.device_get(res.boxes))).all()

    def test_multistream_spmd_runs_botsort(self):
        """The S-stream SPMD program compiles and steps with botsort state
        (incl. appearance gallery) sharded over the 8-device mesh."""
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline
        from rtmodt_tpu.tracking.deepsort import DeepSortState

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 32,
                          "max_detections": 8, "classes": None},
            "tracking": {"algorithm": "botsort",
                         "botsort": {"max_tracks": 16, "embed_dim": 64,
                                     "embedder": "random"}},
            "profiling": {"per_stage": False},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        pipe = MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))
        assert pipe._is_appearance
        frames = np.random.default_rng(0).integers(
            0, 255, (8, 160, 160, 3), np.uint8)
        outs, _ = pipe.step(frames)
        assert outs.boxes.shape == (8, 16, 4)
        assert isinstance(pipe.state, DeepSortState)
        assert pipe.state.feat.shape == (8, 16, 64)
        shard_counts = {len(x.sharding.device_set) for x in
                        jax.tree.leaves(pipe.state)}
        assert shard_counts == {8}
