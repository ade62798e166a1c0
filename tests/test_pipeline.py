"""End-to-end pipeline smoke tests (synthetic video, random weights, CPU)."""

import os

import numpy as np
import pytest

from rtmodt_tpu.config import load_config


@pytest.fixture(scope="module")
def small_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe")
    cfg = load_config(overrides={
        "detection": {"model": "yolov8n", "input_size": 128, "conf_threshold": 0.01,
                      "nms_candidates": 64, "max_detections": 20, "classes": None},
        "tracking": {"bytetrack": {"max_tracks": 32}},
        "events": {"alert": {"log_path": str(tmp / "events.jsonl")},
                   "zones": [{"name": "z", "polygon": [[10, 10], [100, 10], [100, 100], [10, 100]],
                              "dwell_time_sec": 0.0, "cooldown_sec": 0.0}]},
        "profiling": {"warmup_frames": 0, "log_interval": 0},
        "visualization": {"enabled": True},
    })
    return cfg


class TestPipelineEndToEnd:
    def test_step_per_stage(self, small_cfg):
        from rtmodt_tpu.runtime.pipeline import Pipeline

        pipe = Pipeline(small_cfg)
        frame = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
        for fid in range(3):
            tracks, events, res = pipe.step(frame, fid, timestamp=fid / 30.0)
            assert res.boxes.shape[0] == 20
        pipe.profiler.end_frame()
        s = pipe.profiler.summary()
        for stage in ("preprocess", "inference", "nms", "tracking", "events"):
            assert f"{stage}_mean_ms" in s or pipe.profiler._frame_count == 0

    def test_step_fused(self, small_cfg):
        import dataclasses
        from rtmodt_tpu.runtime.pipeline import Pipeline

        cfg = dataclasses.replace(small_cfg,
                                  profiling=dataclasses.replace(small_cfg.profiling,
                                                                per_stage=False))
        pipe = Pipeline(cfg)
        frame = np.zeros((160, 160, 3), np.uint8)
        for fid in range(3):
            tracks, events, res = pipe.step(frame, fid)
        assert pipe.tracker.state is not None

    def test_run_on_video_file(self, small_cfg, tmp_path):
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "synth.mp4")
        write_synthetic_video(video, frames=12, h=160, w=160, n_objects=2)
        pipe = Pipeline(small_cfg)
        summary = pipe.run(source=video, max_frames=10)
        assert pipe.profiler._frame_count >= 5
        assert "decode_mean_ms" in summary

    def test_run_chunked_on_video_file(self, small_cfg, tmp_path):
        """Throughput mode: every frame gets tracked + event-processed."""
        import dataclasses
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "synth.mp4")
        write_synthetic_video(video, frames=14, h=160, w=160, n_objects=2)
        cfg = dataclasses.replace(
            small_cfg,
            visualization=dataclasses.replace(small_cfg.visualization, enabled=False),
            parallel=dataclasses.replace(small_cfg.parallel, chunk_size=4,
                                         pipeline_depth=1),
        )
        pipe = Pipeline(cfg)
        summary = pipe.run(source=video)
        assert pipe.profiler._frame_count == 14  # 3 chunks + 2-frame remainder
        assert "inference_mean_ms" in summary or pipe.profiler._frame_count > 0

    def test_run_live_packed_transport(self, small_cfg, tmp_path):
        """Live mode (renderer on, fused tracker) with the default packed
        planar transport: frames ship as I420 planes through the
        space-to-depth front instead of raw BGR."""
        import dataclasses
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "synth.mp4")
        write_synthetic_video(video, frames=10, h=160, w=160, n_objects=2)
        cfg = dataclasses.replace(
            small_cfg,
            profiling=dataclasses.replace(small_cfg.profiling, per_stage=False),
        )
        pipe = Pipeline(cfg)
        assert pipe._use_packed_transport()
        summary = pipe.run(source=video, max_frames=8)
        assert pipe.profiler._frame_count >= 5
        assert "inference_mean_ms" in summary

    def test_step_packed_matches_step_shapes(self, small_cfg):
        import dataclasses
        from rtmodt_tpu.runtime.pipeline import Pipeline

        cfg = dataclasses.replace(
            small_cfg,
            profiling=dataclasses.replace(small_cfg.profiling, per_stage=False))
        pipe = Pipeline(cfg)
        frame = np.random.default_rng(1).integers(0, 255, (160, 160, 3), np.uint8)
        tracks, events, res = pipe.step_packed(frame, 0, timestamp=0.0)
        assert res.boxes.shape[0] == cfg.detection.max_detections
        assert isinstance(tracks, list)

    def test_transport_validation(self):
        with pytest.raises(ValueError, match="transport"):
            load_config(overrides={"parallel": {"transport": "pigeon"}})
        with pytest.raises(ValueError, match="x6"):
            load_config(overrides={"parallel": {"transport": "x6"},
                                   "detection": {"quant": "int8"}})
        with pytest.raises(ValueError, match="topk_impl"):
            load_config(overrides={"detection": {"topk_impl": "sloppy"}})


class TestX6Transport:
    """x6 space-to-depth transport (ops/yuv.py::planes_to_x6): host-side
    s2d rearrangement replacing the device-side make_x6 lane shuffle.
    Same link bytes; the chunk program must be numerically identical."""

    def test_planes_to_x6_matches_device_make_x6(self, rng):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.planar_stem import make_x6, pad_planes, pad_x6
        from rtmodt_tpu.ops.yuv import planes_to_x6

        size = 64
        ch, cw = 36, 64      # odd-ish content: real letterbox pads
        y = rng.integers(0, 255, (2, ch, cw), np.uint8)
        u = rng.integers(0, 255, (2, ch // 2, cw // 2), np.uint8)
        v = rng.integers(0, 255, (2, ch // 2, cw // 2), np.uint8)
        pad_top = ((size - ch) // 2 // 2) * 2
        pad_left = 0

        yp, up, vp = pad_planes(jnp.asarray(y), jnp.asarray(u),
                                jnp.asarray(v), size, pad_left, pad_top)
        want = np.asarray(make_x6(yp, up, vp, dtype=jnp.float32))

        x6 = planes_to_x6(y, u, v)
        got = np.asarray(pad_x6(jnp.asarray(x6), size, pad_left,
                                pad_top)).astype(np.float32)
        np.testing.assert_array_equal(got, want)

        # dtype fold (round 5): converting inside the pad select is
        # numerically identical - every uint8 is exact in bf16/f32
        folded = pad_x6(jnp.asarray(x6), size, pad_left, pad_top,
                        dtype=jnp.float32)
        assert folded.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(folded), want)
        folded_bf16 = pad_x6(jnp.asarray(x6), size, pad_left, pad_top,
                             dtype=jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(folded_bf16.astype(jnp.float32)), want)

    def test_x6_chunk_program_matches_i420(self, small_cfg, rng):
        """The x6 chunk program and the planar-I420 chunk program are the
        SAME math on the same bytes: outputs must agree exactly."""
        import dataclasses
        import jax
        from rtmodt_tpu.ops.yuv import pack_chunk, planes_to_x6
        from rtmodt_tpu.runtime.pipeline import Pipeline

        cfg = dataclasses.replace(
            small_cfg,
            profiling=dataclasses.replace(small_cfg.profiling, per_stage=False),
            parallel=dataclasses.replace(small_cfg.parallel, chunk_size=4,
                                         donate_state=False))
        pipe = Pipeline(cfg)
        frames = rng.integers(0, 255, (4, 160, 160, 3), np.uint8)
        planes, _ = pack_chunk(frames, cfg.detection.input_size)

        state0 = jax.tree.map(lambda x: x.copy(), pipe.tracker.state)
        f_i420 = pipe._packed_chunk_for(160, 160, 4)
        st_a, outs_a, ress_a = f_i420(pipe.detector.params, state0,
                                      *[np.asarray(p) for p in planes])

        state0 = jax.tree.map(lambda x: x.copy(), pipe.tracker.state)
        f_x6 = pipe._packed_chunk_x6_for(160, 160, 4)
        st_b, outs_b, ress_b = f_x6(pipe.detector.params, state0,
                                    planes_to_x6(*planes))

        for a, b in zip(jax.tree.leaves((outs_a, ress_a)),
                        jax.tree.leaves((outs_b, ress_b))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # level 2 (x24, the 24-lane stem) is the same arithmetic with a
        # different contraction order - equal to float tolerance (the
        # stem's 96-term sums associate differently than the 54-term x6
        # sums), identical decisions (ids/classes/counts)
        from rtmodt_tpu.ops.yuv import planes_to_x24

        state0 = jax.tree.map(lambda x: x.copy(), pipe.tracker.state)
        f_x24 = pipe._packed_chunk_x6_for(160, 160, 4, level=2)
        st_c, outs_c, ress_c = f_x24(pipe.detector.params, state0,
                                     planes_to_x24(*planes))
        for a, c in zip(jax.tree.leaves((outs_a, ress_a)),
                        jax.tree.leaves((outs_c, ress_c))):
            a, c = np.asarray(a), np.asarray(c)
            if a.dtype.kind in "iub":
                np.testing.assert_array_equal(a, c)
            else:
                np.testing.assert_allclose(a, c, atol=5e-3)

    def test_run_chunked_defaults_to_x6(self, small_cfg, tmp_path):
        """transport=packed auto-selects x6 for motion trackers with quant
        off, and the chunked run completes with every frame tracked."""
        import dataclasses
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "synth.mp4")
        write_synthetic_video(video, frames=10, h=160, w=160, n_objects=2)
        cfg = dataclasses.replace(
            small_cfg,
            visualization=dataclasses.replace(small_cfg.visualization,
                                              enabled=False),
            parallel=dataclasses.replace(small_cfg.parallel, chunk_size=4,
                                         pipeline_depth=1),
        )
        pipe = Pipeline(cfg)
        assert pipe._x6_transport()
        pipe.run(source=video)
        assert pipe.profiler._frame_count == 10

    def test_submit_prepacked_x6_matches_planes(self, small_cfg, rng):
        """submit_packed_yuv accepts the worker-built x6 tensor directly;
        results must equal the planes-tuple path (same bytes, same
        program), and pre-packed x6 on a non-x6 transport is refused."""
        import dataclasses
        import jax
        import pytest as _pytest
        from rtmodt_tpu.ops.yuv import pack_chunk, planes_to_x6
        from rtmodt_tpu.runtime.pipeline import Pipeline

        cfg = dataclasses.replace(
            small_cfg,
            profiling=dataclasses.replace(small_cfg.profiling, per_stage=False),
            parallel=dataclasses.replace(small_cfg.parallel, chunk_size=4,
                                         donate_state=False,
                                         transport="x6"))
        pipe = Pipeline(cfg)
        frames = rng.integers(0, 255, (4, 160, 160, 3), np.uint8)
        planes, _ = pack_chunk(frames, cfg.detection.input_size)

        state0 = jax.tree.map(lambda x: x.copy(), pipe.tracker.state)
        outs_a, ress_a = pipe.submit_packed_yuv(planes, 160, 160)
        outs_a, ress_a = jax.device_get((outs_a, ress_a))

        pipe.tracker.state = state0
        x6 = planes_to_x6(*planes)
        outs_b, ress_b = pipe.submit_packed_yuv(x6, 160, 160)
        for a, b in zip(jax.tree.leaves((outs_a, ress_a)),
                        jax.tree.leaves(jax.device_get((outs_b, ress_b)))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        import dataclasses as _dc
        pipe_i420 = Pipeline(_dc.replace(
            cfg, parallel=_dc.replace(cfg.parallel, transport="i420")))
        with _pytest.raises(ValueError, match="s2d"):
            pipe_i420.submit_packed_yuv(x6, 160, 160)
        # a pinned-x24 pipeline refuses a worker-built x6 tensor
        pipe_x24 = Pipeline(_dc.replace(
            cfg, parallel=_dc.replace(cfg.parallel, transport="x24")))
        with _pytest.raises(ValueError, match="channels"):
            pipe_x24.submit_packed_yuv(x6, 160, 160)

    def test_x6_gmc_chunk_runs(self, small_cfg, rng):
        """GMC-enabled x6 chunk program: half-res luma grids feed the
        phase correlator; program compiles and yields finite outputs."""
        import dataclasses
        import jax
        from rtmodt_tpu.config.loader import GMCConfig
        from rtmodt_tpu.ops.yuv import pack_chunk, planes_to_x6
        from rtmodt_tpu.runtime.pipeline import Pipeline

        tr = dataclasses.replace(small_cfg.tracking,
                                 gmc=GMCConfig(method="phase", grid=32))
        cfg = dataclasses.replace(
            small_cfg, tracking=tr,
            profiling=dataclasses.replace(small_cfg.profiling, per_stage=False),
            parallel=dataclasses.replace(small_cfg.parallel, chunk_size=4,
                                         donate_state=False))
        pipe = Pipeline(cfg)
        frames = rng.integers(0, 255, (4, 160, 160, 3), np.uint8)
        planes, _ = pack_chunk(frames, cfg.detection.input_size)
        f_x6 = pipe._packed_chunk_x6_for(160, 160, 4)
        st, outs, ress, carry = f_x6(
            pipe.detector.params, pipe.tracker.state, planes_to_x6(*planes),
            np.zeros((32, 32), np.float32), np.float32(0.0))
        assert np.isfinite(np.asarray(outs.boxes)).all()

    def test_deepsort_fused_and_per_stage_agree(self, small_cfg):
        """DeepSORT pipeline: the single fused XLA program (letterbox ->
        YOLO -> NMS -> ROI crop -> embed -> associate) and the per-stage
        path produce the same tracks."""
        import dataclasses
        from rtmodt_tpu.config.loader import DeepSortConfig
        from rtmodt_tpu.runtime.pipeline import Pipeline

        tr = dataclasses.replace(
            small_cfg.tracking, algorithm="deepsort",
            deepsort=DeepSortConfig(n_init=1, min_confidence=0.01,
                                    max_tracks=32, embed_dim=32))
        cfg_ps = dataclasses.replace(small_cfg, tracking=tr)
        cfg_f = dataclasses.replace(
            cfg_ps, profiling=dataclasses.replace(small_cfg.profiling,
                                                  per_stage=False))
        frame = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
        outs = []
        for cfg in (cfg_ps, cfg_f):
            pipe = Pipeline(cfg)
            for fid in range(4):
                tracks, _, _ = pipe.step(frame, fid, timestamp=fid / 30.0)
            outs.append(sorted(t.track_id for t in tracks))
        assert outs[0] == outs[1]
        assert len(outs[0]) > 0

    def test_deepsort_chunked_run(self, small_cfg, tmp_path):
        """DeepSORT through the chunked planar path: appearance crops come
        straight from the Y/U/V planes (crop_yuv_rgb); every frame gets
        tracked and event-processed."""
        import dataclasses
        from rtmodt_tpu.config.loader import DeepSortConfig
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "synth_ds.mp4")
        write_synthetic_video(video, frames=12, h=160, w=160, n_objects=2)
        cfg = dataclasses.replace(
            small_cfg,
            tracking=dataclasses.replace(
                small_cfg.tracking, algorithm="deepsort",
                deepsort=DeepSortConfig(n_init=1, min_confidence=0.01,
                                        max_tracks=32, embed_dim=32)),
            visualization=dataclasses.replace(small_cfg.visualization,
                                              enabled=False),
            parallel=dataclasses.replace(small_cfg.parallel, chunk_size=4,
                                         pipeline_depth=1),
            events=dataclasses.replace(
                small_cfg.events,
                alert=dataclasses.replace(small_cfg.events.alert,
                                          log_path=str(tmp_path / "ds_ev.jsonl"))),
        )
        pipe = Pipeline(cfg)
        pipe.run(source=video)
        assert pipe.profiler._frame_count == 12
        assert (tmp_path / "ds_ev.jsonl").exists()   # tracks produced events

    def test_run_chunked_device_masks_event_parity(self, small_cfg, tmp_path):
        """``events.device_masks``: containment computed on device inside the
        chunked path yields the same event stream as the host path."""
        import dataclasses
        import json
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "synth.mp4")
        write_synthetic_video(video, frames=12, h=160, w=160, n_objects=2)

        def run(device_masks, log):
            cfg = dataclasses.replace(
                small_cfg,
                visualization=dataclasses.replace(small_cfg.visualization,
                                                  enabled=False),
                parallel=dataclasses.replace(small_cfg.parallel, chunk_size=4,
                                             pipeline_depth=1),
                events=dataclasses.replace(
                    small_cfg.events, device_masks=device_masks,
                    alert=dataclasses.replace(small_cfg.events.alert,
                                              log_path=str(tmp_path / log))),
            )
            pipe = Pipeline(cfg)
            assert (pipe._mask_fn is not None) == device_masks
            pipe.run(source=video)
            p = tmp_path / log
            if not p.exists():
                return []
            return [json.loads(l) for l in p.read_text().splitlines()]

        host_evts = run(False, "host.jsonl")
        dev_evts = run(True, "dev.jsonl")
        key = lambda es: [(e["zone_name"], e["track_id"], e["frame_id"],
                           e["event_type"]) for e in es]
        assert key(host_evts) == key(dev_evts)

    def test_save_video_matches_input_geometry(self, small_cfg, tmp_path):
        """Reference bug 4 fix: writer adopts the actual frame size."""
        import cv2
        import dataclasses
        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "in.mp4")
        out = str(tmp_path / "out.mp4")
        write_synthetic_video(video, frames=8, h=160, w=240, n_objects=2)
        cfg = dataclasses.replace(
            small_cfg,
            visualization=dataclasses.replace(small_cfg.visualization,
                                              save_video=True, save_path=out))
        Pipeline(cfg).run(source=video, max_frames=6)
        cap = cv2.VideoCapture(out)
        assert cap.isOpened()
        assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 240
        assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 160
        cap.release()


class TestReader:
    def test_video_file_reader(self, tmp_path):
        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "v.mp4")
        write_synthetic_video(video, frames=10, h=120, w=160, fps=30.0)
        with RTSPReader(video) as r:
            seen = 0
            last = 0
            while True:
                frame, fid, ts = r.read_new(last, timeout=2.0)
                if frame is None:
                    break
                assert frame.shape == (120, 160, 3)
                assert fid > last
                last = fid
                seen += 1
            assert seen >= 5  # latest-frame semantics may skip some

    def test_read_nonblocking_before_start(self):
        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader

        r = RTSPReader("nonexistent_dir/nope.mp4")
        frame, fid, ts = r.read()
        assert frame is None

    def test_open_failure_raises(self):
        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader

        with pytest.raises(ConnectionError):
            RTSPReader("nonexistent_dir/nope.mp4").start()


class TestZoneEngine:
    def _track(self, tid, box, cid=0):
        from rtmodt_tpu.tracking.tracker import Track

        return Track(track_id=tid, xyxy=np.asarray(box, np.float32),
                     confidence=0.9, class_id=cid, class_name="person")

    def test_dwell_and_cooldown_stream_clock(self, tmp_path):
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        eng = ZoneEventEngine(
            [{"name": "z1", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 1.0, "cooldown_sec": 5.0}],
            log_path=str(tmp_path / "ev.jsonl"), clock="stream")
        inside = self._track(1, [50, 50, 150, 150])
        # t=0: enters; t=0.5: dwell < 1s -> no event; t=1.0: event
        assert eng.process([inside], 0, timestamp=0.0) == []
        assert eng.process([inside], 1, timestamp=0.5) == []
        evts = eng.process([inside], 2, timestamp=1.0)
        assert len(evts) == 1
        assert evts[0].zone_name == "z1"
        assert evts[0].event_type == "intrusion"
        assert evts[0].frame_id == 2
        # cooldown: no repeat until 5s later
        assert eng.process([inside], 3, timestamp=2.0) == []
        assert len(eng.process([inside], 4, timestamp=6.5)) == 1

    def test_exit_resets_dwell(self, tmp_path):
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        eng = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 1.0, "cooldown_sec": 0.0}],
            log_path=str(tmp_path / "ev.jsonl"), clock="stream")
        inside = self._track(1, [50, 50, 150, 150])
        outside = self._track(1, [500, 500, 600, 600])
        eng.process([inside], 0, timestamp=0.0)
        eng.process([outside], 1, timestamp=0.9)   # leaves -> reset
        assert eng.process([inside], 2, timestamp=1.1) == []  # dwell restarted
        assert len(eng.process([inside], 3, timestamp=2.2)) == 1

    def test_zone_counts_analytics(self, tmp_path):
        """Per-zone analytics: entries count every entry edge (re-entry
        counts again), unique_tracks dedupes ids, current is live
        occupancy (framework extension; the reference only logs alerts)."""
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        eng = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 0.0, "cooldown_sec": 0.0}],
            log_path=str(tmp_path / "ev.jsonl"), clock="stream")
        a_in = self._track(1, [50, 50, 150, 150])
        a_out = self._track(1, [500, 500, 600, 600])
        b_in = self._track(2, [60, 60, 160, 160])
        eng.process([a_in, b_in], 0, timestamp=0.0)
        assert eng.zone_counts() == {"z": {"entries": 2, "unique_tracks": 2,
                                           "current": 2}}
        eng.process([a_out, b_in], 1, timestamp=0.1)   # a exits
        assert eng.zone_counts()["z"]["current"] == 1
        eng.process([a_in, b_in], 2, timestamp=0.2)    # a re-enters
        c = eng.zone_counts()["z"]
        assert c == {"entries": 3, "unique_tracks": 2, "current": 2}

    def test_jsonl_schema(self, tmp_path):
        import json
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        path = tmp_path / "ev.jsonl"
        eng = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 0.0, "cooldown_sec": 0.0}],
            log_path=str(path), clock="stream")
        eng.process([self._track(7, [50, 50, 150, 150], cid=2)], 42, timestamp=1.0)
        rec = json.loads(path.read_text().strip())
        # exact reference schema (zone_engine.py:29-45)
        assert set(rec) == {"timestamp_utc", "event_type", "zone_name", "track_id",
                            "class_id", "class_name", "dwell_time_sec", "bbox_xyxy",
                            "centroid", "frame_id", "metadata"}
        assert rec["track_id"] == 7
        assert rec["class_id"] == 2
        assert rec["frame_id"] == 42

    def test_supplied_inside_mat_matches_host(self, tmp_path):
        """Device-computed containment (ops.polygon on padded polys) fed via
        ``inside_mat`` must reproduce the host path's events exactly."""
        import jax.numpy as jnp
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.ops.polygon import pad_polygons, points_in_polygons

        zones = [{"name": "a", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
                  "dwell_time_sec": 0.5, "cooldown_sec": 1.0},
                 {"name": "b", "polygon": [[300, 300], [500, 300], [400, 500]],
                  "dwell_time_sec": 0.0, "cooldown_sec": 0.0}]
        host_eng = ZoneEventEngine(zones, log_path=str(tmp_path / "h.jsonl"),
                                   clock="stream")
        dev_eng = ZoneEventEngine(zones, log_path=str(tmp_path / "d.jsonl"),
                                  clock="stream")
        polys = jnp.asarray(pad_polygons([z["polygon"] for z in zones], 16))
        rng = np.random.default_rng(3)
        for fid in range(12):
            tracks = [self._track(tid, np.sort(rng.uniform(0, 550, 4)[[0, 2, 1, 3]]))
                      for tid in range(1, 4)]
            ts = fid / 10.0
            h_evts = host_eng.process(tracks, fid, timestamp=ts)
            cents = np.stack([[(t.xyxy[0] + t.xyxy[2]) / 2,
                               (t.xyxy[1] + t.xyxy[3]) / 2] for t in tracks])
            mat = np.asarray(points_in_polygons(jnp.asarray(cents), polys))
            d_evts = dev_eng.process(tracks, fid, timestamp=ts, inside_mat=mat)
            key = lambda es: [(e.zone_name, e.track_id, e.event_type) for e in es]
            assert key(h_evts) == key(d_evts)

    def test_class_filter(self, tmp_path):
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        eng = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 0.0, "cooldown_sec": 0.0, "classes": [0]}],
            log_path=str(tmp_path / "ev.jsonl"), clock="stream")
        car = self._track(1, [50, 50, 150, 150], cid=2)
        person = self._track(2, [50, 50, 150, 150], cid=0)
        evts = eng.process([car, person], 0, timestamp=0.0)
        assert [e.track_id for e in evts] == [2]


class TestCrossingEvents:
    def _track(self, tid, box, trail):
        from rtmodt_tpu.tracking.tracker import Track

        return Track(track_id=tid, xyxy=np.asarray(box, np.float32),
                     confidence=0.9, class_id=0, class_name="person",
                     trail=trail)

    def test_crossing_fires_on_entry_with_direction(self, tmp_path):
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        eng = ZoneEventEngine(
            [{"name": "gate", "polygon": [[100, 0], [200, 0], [200, 100], [100, 100]],
              "trigger": "crossing", "direction": "left_to_right",
              "cooldown_sec": 5.0}],
            log_path=str(tmp_path / "ev.jsonl"), clock="stream")
        # moving rightward, outside then inside
        out_t = self._track(1, [0, 20, 40, 80], [(10, 50), (20, 50)])
        in_t = self._track(1, [100, 20, 140, 80], [(20, 50), (120, 50)])
        assert eng.process([out_t], 0, timestamp=0.0) == []
        evts = eng.process([in_t], 1, timestamp=0.1)
        assert len(evts) == 1
        assert evts[0].event_type == "crossing"
        assert evts[0].metadata["direction"] == "left_to_right"
        # still inside: no repeat
        assert eng.process([in_t], 2, timestamp=0.2) == []

    def test_wrong_direction_no_event(self, tmp_path):
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        eng = ZoneEventEngine(
            [{"name": "gate", "polygon": [[100, 0], [200, 0], [200, 100], [100, 100]],
              "trigger": "crossing", "direction": "left_to_right",
              "cooldown_sec": 0.0}],
            log_path=str(tmp_path / "ev.jsonl"), clock="stream")
        # entering while moving right-to-left
        out_t = self._track(1, [220, 20, 260, 80], [(240, 50), (230, 50)])
        in_t = self._track(1, [140, 20, 180, 80], [(240, 50), (160, 50)])
        eng.process([out_t], 0, timestamp=0.0)
        assert eng.process([in_t], 1, timestamp=0.1) == []


class TestProcessChunkEquivalence:
    """``process_chunk`` (vectorized array path used by the chunked pipeline)
    must emit the same event stream as K sequential per-frame ``process``
    calls over identical track data."""

    def _zones(self):
        return [
            {"name": "area", "polygon": [[100, 100], [400, 100], [400, 400], [100, 400]],
             "dwell_time_sec": 0.4, "cooldown_sec": 1.0},
            {"name": "gate", "polygon": [[500, 0], [700, 0], [700, 300], [500, 300]],
             "trigger": "crossing", "direction": "left_to_right", "cooldown_sec": 0.5},
            {"name": "cars", "polygon": [[0, 450], [760, 450], [760, 760], [0, 760]],
             "dwell_time_sec": 0.0, "cooldown_sec": 0.3, "classes": [2]},
        ]

    def _simulate(self, seed, t_frames=64, s_slots=6):
        """Slot-structured random walks: (tids, cids, boxes, vis) arrays plus
        per-frame Track lists with reference-style trails."""
        from rtmodt_tpu.tracking.tracker import Track

        rng = np.random.default_rng(seed)
        tids = np.zeros((t_frames, s_slots), np.int32)
        cids = np.zeros((t_frames, s_slots), np.int32)
        boxes = np.zeros((t_frames, s_slots, 4), np.float32)
        vis = np.zeros((t_frames, s_slots), bool)
        next_id = 1
        cur_tid = np.zeros(s_slots, np.int32)
        cur_cls = np.zeros(s_slots, np.int32)
        pos = rng.uniform(0, 700, (s_slots, 2))
        vel = rng.uniform(-25, 25, (s_slots, 2))
        alive = np.zeros(s_slots, bool)
        for f in range(t_frames):
            for s in range(s_slots):
                if not alive[s] and rng.random() < 0.15:
                    alive[s] = True
                    cur_tid[s] = next_id
                    next_id += 1
                    cur_cls[s] = int(rng.integers(0, 3))
                    pos[s] = rng.uniform(0, 700, 2)
                    vel[s] = rng.uniform(-25, 25, 2)
                elif alive[s] and rng.random() < 0.05:
                    alive[s] = False
            pos += vel
            pos = np.clip(pos, 0, 760)
            w = 40.0
            for s in range(s_slots):
                if alive[s] and rng.random() > 0.08:  # occasional occlusion
                    vis[f, s] = True
                    tids[f, s] = cur_tid[s]
                    cids[f, s] = cur_cls[s]
                    boxes[f, s] = [pos[s, 0] - w, pos[s, 1] - w,
                                   pos[s, 0] + w, pos[s, 1] + w]

        trails: dict[int, list] = {}
        per_frame_tracks = []
        for f in range(t_frames):
            tracks = []
            for s in np.where(vis[f])[0]:
                tid = int(tids[f, s])
                c = (float((boxes[f, s, 0] + boxes[f, s, 2]) / 2),
                     float((boxes[f, s, 1] + boxes[f, s, 3]) / 2))
                tr = trails.setdefault(tid, [])
                tr.append((int(c[0]), int(c[1])))
                if len(tr) > 30:
                    tr.pop(0)
                tracks.append(Track(track_id=tid, xyxy=boxes[f, s].copy(),
                                    confidence=0.9, class_id=int(cids[f, s]),
                                    class_name="x", trail=list(tr)))
            per_frame_tracks.append(tracks)
        return tids, cids, boxes, vis, per_frame_tracks

    @pytest.mark.parametrize("seed,chunk", [(0, 8), (1, 16), (2, 8), (3, 32)])
    def test_chunked_equals_per_frame(self, tmp_path, seed, chunk):
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        tids, cids, boxes, vis, per_frame = self._simulate(seed)
        t_frames = tids.shape[0]
        ref = ZoneEventEngine(self._zones(), log_path=str(tmp_path / "a.jsonl"),
                              clock="stream")
        vec = ZoneEventEngine(self._zones(), log_path=str(tmp_path / "b.jsonl"),
                              clock="stream")
        ref_events, vec_events = [], []
        for f in range(t_frames):
            ref_events += ref.process(per_frame[f], f, timestamp=f / 10.0)
        for c0 in range(0, t_frames, chunk):
            c1 = min(c0 + chunk, t_frames)
            vec_events += vec.process_chunk(
                tids[c0:c1], cids[c0:c1], boxes[c0:c1], vis[c0:c1],
                list(range(c0, c1)),
                np.arange(c0, c1, dtype=np.float64) / 10.0,
                class_names=["person", "bike", "car"])
        key = lambda es: sorted(
            (e.frame_id, e.zone_name, e.track_id, e.event_type,
             e.dwell_time_sec) for e in es)
        assert len(ref_events) > 0, "simulation produced no events; bad seed"
        assert key(ref_events) == key(vec_events)
        # zone analytics parity: both paths count the same entry edges
        counts = ref.zone_counts()
        assert counts == vec.zone_counts()
        assert sum(c["entries"] for c in counts.values()) > 0

    def test_chunk_with_device_inside(self, tmp_path):
        """Supplying device-computed (K, S, Z) masks reproduces the host path."""
        import jax.numpy as jnp
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.ops.polygon import pad_polygons, points_in_polygons

        tids, cids, boxes, vis, _ = self._simulate(5)
        host = ZoneEventEngine(self._zones(), log_path=str(tmp_path / "h.jsonl"),
                               clock="stream")
        dev = ZoneEventEngine(self._zones(), log_path=str(tmp_path / "d.jsonl"),
                              clock="stream")
        polys = jnp.asarray(pad_polygons([z["polygon"] for z in self._zones()], 16))
        k, s = tids.shape
        cents = ((boxes[..., 0:2] + boxes[..., 2:4]) * 0.5).reshape(-1, 2)
        inside = np.asarray(points_in_polygons(jnp.asarray(cents), polys)
                            ).reshape(k, s, -1)
        ts = np.arange(k, dtype=np.float64) / 10.0
        h_ev = host.process_chunk(tids, cids, boxes, vis, list(range(k)), ts)
        d_ev = dev.process_chunk(tids, cids, boxes, vis, list(range(k)), ts,
                                 inside=inside)
        key = lambda es: sorted((e.frame_id, e.zone_name, e.track_id) for e in es)
        assert key(h_ev) == key(d_ev)

    def test_class_flap_keeps_dwell_like_per_frame_path(self, tmp_path):
        """Per-frame semantics: a class-filtered track is SKIPPED (keeps its
        occupancy entry), not treated as outside. The chunk path used to pop
        the entry when the detector's class flapped for a chunk, restarting
        dwell and firing late."""
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        def build():
            return ZoneEventEngine(
                [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
                  "dwell_time_sec": 1.0, "cooldown_sec": 100.0, "classes": [0]}],
                log_path=str(tmp_path / "ev.jsonl"), clock="stream")

        k = 4
        tids = np.ones((k, 1), np.int32)
        vis = np.ones((k, 1), bool)
        box = np.tile(np.array([50, 50, 150, 150], np.float32), (k, 1, 1))

        def chunk(eng, cls, t0):
            ts = t0 + np.arange(k) / 10.0
            cids = np.full((k, 1), cls, np.int32)
            return eng.process_chunk(tids, cids, box, vis,
                                     list(range(int(t0 * 10), int(t0 * 10) + k)), ts)

        eng = build()
        assert chunk(eng, 0, 0.0) == []     # person, dwell building
        assert chunk(eng, 2, 0.4) == []     # class flaps to car: filtered
        evts = chunk(eng, 0, 0.8)           # back to person
        # entry time survived the flap: dwell = 0.8..1.1 - 0.0 crosses 1.0
        assert len(evts) == 1
        assert abs(evts[0].dwell_time_sec - 1.0) < 0.11

    def test_alert_config_not_mutated_by_engine(self, tmp_path):
        """Engines copy the AlertConfig: per-camera log_path overrides must
        not leak into the caller's shared config object."""
        from rtmodt_tpu.config.loader import AlertConfig
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        shared = AlertConfig(log_path=str(tmp_path / "orig.jsonl"))
        zones = [{"name": "z", "polygon": [[0, 0], [9, 0], [9, 9]]}]
        ZoneEventEngine(zones, log_path=str(tmp_path / "cam0.jsonl"), alert=shared)
        assert shared.log_path == str(tmp_path / "orig.jsonl")

    def test_all_outside_chunk_resets_dwell(self, tmp_path):
        """A track that leaves the zone for a whole chunk (zone empty ->
        the event block is skipped) must still lose its occupancy entry:
        stale entries used to survive and resume dwell with inflated time,
        firing a false immediate alert on re-entry."""
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine

        eng = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 1.0, "cooldown_sec": 100.0}],
            log_path=str(tmp_path / "ev.jsonl"), clock="stream")
        k = 4
        tids = np.ones((k, 1), np.int32)
        cids = np.zeros((k, 1), np.int32)
        vis = np.ones((k, 1), bool)
        inside_box = np.tile(np.array([50, 50, 150, 150], np.float32), (k, 1, 1))
        outside_box = np.tile(np.array([300, 300, 400, 400], np.float32), (k, 1, 1))

        def chunk(boxes, t0):
            ts = t0 + np.arange(k) / 10.0
            return eng.process_chunk(tids, cids, boxes, vis,
                                     list(range(int(t0 * 10), int(t0 * 10) + k)), ts)

        assert chunk(inside_box, 0.0) == []      # dwell 0.3 < 1.0 s
        assert chunk(outside_box, 0.4) == []     # whole chunk outside
        evts = chunk(inside_box, 0.8)            # re-entry at t=0.8
        # dwell restarted at 0.8: frames reach only 1.1-0.8=0.3 s -> no event
        assert evts == []
        evts = chunk(inside_box, 1.2) + chunk(inside_box, 1.6) \
            + chunk(inside_box, 2.0)
        assert len(evts) == 1                    # fires once dwell >= 1.0 s
        assert abs(evts[0].dwell_time_sec - 1.0) < 0.11

    def test_wall_clock_interpolates_within_chunk(self, tmp_path, monkeypatch):
        """With clock='wall', a chunk's K frames get timestamps interpolated
        across the interval since the previous chunk, so dwell can cross its
        threshold mid-chunk with a ~continuous value - not quantized to
        chunk-sized steps (one time.time() for all K would report dwell 4.0 s
        here instead of ~1.0 s)."""
        import rtmodt_tpu.events.zone_engine as ze

        eng = ze.ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 1.0, "cooldown_sec": 100.0}],
            log_path=str(tmp_path / "ev.jsonl"), clock="wall")
        k = 4
        tids = np.ones((k, 1), np.int32)
        cids = np.zeros((k, 1), np.int32)
        boxes = np.tile(np.array([50, 50, 150, 150], np.float32), (k, 1, 1))
        vis = np.ones((k, 1), bool)

        clock = {"now": 100.0}
        monkeypatch.setattr(ze.time, "time", lambda: clock["now"])
        # chunk 1: no previous interval -> all frames stamped at 100.0;
        # the track enters the zone, dwell 0 < 1 s -> no event
        assert eng.process_chunk(tids, cids, boxes, vis, [0, 1, 2, 3]) == []
        # chunk 2 arrives 4 s later: frames interpolate to 101, 102, 103, 104
        clock["now"] = 104.0
        evts = eng.process_chunk(tids, cids, boxes, vis, [4, 5, 6, 7])
        assert len(evts) == 1
        assert abs(evts[0].dwell_time_sec - 1.0) < 1e-6   # fired at ts=101


class TestTrackerQuality:
    def test_idf1_on_synthetic_gt(self, tmp_path):
        """Feed the tracker the GT boxes of a synthetic scene (with jitter)
        and verify MOT metrics are near-perfect - the full quality loop:
        tracker -> MOT txt -> own CLEAR/IDF1 evaluator."""
        from rtmodt_tpu.config.loader import ByteTrackConfig
        from rtmodt_tpu.detection.detector import Detections
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        rng = np.random.default_rng(0)
        tracker = MultiObjectTracker("bytetrack", bytetrack=ByteTrackConfig(
            match_thresh=0.3))
        gt_path = str(tmp_path / "gt.txt")
        pred_path = str(tmp_path / "pred.txt")
        with open(gt_path, "w") as g, open(pred_path, "w") as p:
            for f in range(1, 41):
                _, boxes = moving_boxes_frame(f, 720, 1280, n_objects=4)
                for oi, b in enumerate(boxes):
                    g.write(f"{f},{oi+1},{b[0]:.1f},{b[1]:.1f},"
                            f"{b[2]-b[0]:.1f},{b[3]-b[1]:.1f},1,-1,-1,-1\n")
                jit = boxes + rng.normal(0, 1.0, boxes.shape).astype(np.float32)
                dets = Detections(jit, np.full(len(jit), 0.9, np.float32),
                                  np.zeros(len(jit), np.int32))
                for t in tracker.update(dets):
                    x1, y1, x2, y2 = t.xyxy
                    p.write(f"{f},{t.track_id},{x1:.1f},{y1:.1f},"
                            f"{x2-x1:.1f},{y2-y1:.1f},{t.confidence:.2f},-1,-1,-1\n")
        r = evaluate_tracking(gt_path, pred_path)
        assert r["idf1"] > 0.95, r
        assert r["mota"] > 0.95, r
        assert r["num_switches"] == 0, r

    def test_deepsort_idf1_on_synthetic_gt(self, tmp_path):
        """Same quality loop through the DeepSORT tracker: jittered GT boxes
        + rendered frames (appearance crops) -> near-perfect IDF1/MOTA.
        n_init delays each track's first n_init-1 frames, so MOTA counts
        those as misses - the threshold accounts for it."""
        from rtmodt_tpu.detection.detector import Detections
        from rtmodt_tpu.evaluation.metrics import evaluate_tracking
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        rng = np.random.default_rng(0)
        tracker = MultiObjectTracker("deepsort", deepsort={
            "n_init": 2, "min_confidence": 0.3, "embed_dim": 32,
            "max_iou_distance": 0.7})
        gt_path = str(tmp_path / "gt.txt")
        pred_path = str(tmp_path / "pred.txt")
        with open(gt_path, "w") as g, open(pred_path, "w") as p:
            for f in range(1, 41):
                frame, boxes = moving_boxes_frame(f, 720, 1280, n_objects=4)
                for oi, b in enumerate(boxes):
                    g.write(f"{f},{oi+1},{b[0]:.1f},{b[1]:.1f},"
                            f"{b[2]-b[0]:.1f},{b[3]-b[1]:.1f},1,-1,-1,-1\n")
                jit = boxes + rng.normal(0, 1.0, boxes.shape).astype(np.float32)
                dets = Detections(jit, np.full(len(jit), 0.9, np.float32),
                                  np.zeros(len(jit), np.int32))
                for t in tracker.update(dets, frame=frame):
                    x1, y1, x2, y2 = t.xyxy
                    p.write(f"{f},{t.track_id},{x1:.1f},{y1:.1f},"
                            f"{x2-x1:.1f},{y2-y1:.1f},{t.confidence:.2f},-1,-1,-1\n")
        r = evaluate_tracking(gt_path, pred_path)
        assert r["idf1"] > 0.9, r
        assert r["mota"] > 0.9, r       # n_init=2 costs 1 missed frame/track
        assert r["num_switches"] == 0, r


class TestProfiler:
    def test_stage_stats_and_schema(self, monkeypatch):
        # deterministic fake clock: real sleeps made the decode/inference
        # ordering assertion flaky under scheduler jitter
        import rtmodt_tpu.profiling.latency_profiler as lp_mod
        from rtmodt_tpu.profiling.latency_profiler import LatencyProfiler

        clock = {"t": 0.0}
        monkeypatch.setattr(lp_mod.time, "perf_counter", lambda: clock["t"])

        def advance(dt):
            clock["t"] += dt

        p = LatencyProfiler(warmup_frames=2, log_interval=0)
        for _ in range(10):
            p.tick("decode")
            advance(0.001)
            p.tock("decode")
            p.tick("inference")
            advance(0.002)
            p.tock("inference")
            p.end_frame()
        s = p.summary()
        for key in ("decode_mean_ms", "decode_p95_ms", "decode_p99_ms",
                    "inference_mean_ms", "total_mean_ms", "frame_mean_ms",
                    "fps_mean", "fps_p5"):
            assert key in s, key
        assert s["inference_mean_ms"] >= s["decode_mean_ms"]
        assert s["total_mean_ms"] >= s["inference_mean_ms"]
        assert s["frame_mean_ms"] >= s["total_mean_ms"] * 0.9
        assert p.current_fps > 0

    def test_warmup_exclusion(self):
        from rtmodt_tpu.profiling.latency_profiler import LatencyProfiler

        p = LatencyProfiler(warmup_frames=5, log_interval=0)
        for _ in range(3):
            p.tick("decode")
            p.tock("decode")
            p.end_frame()
        assert p.summary() == {}

    def test_disabled_noop(self):
        from rtmodt_tpu.profiling.latency_profiler import LatencyProfiler

        p = LatencyProfiler(enabled=False)
        p.tick("decode")
        p.tock("decode")
        p.end_frame()
        assert p.summary() == {}


class TestRenderer:
    def test_render_draws(self):
        from rtmodt_tpu.tracking.tracker import Track
        from rtmodt_tpu.visualization.renderer import FrameRenderer

        frame = np.zeros((200, 300, 3), np.uint8)
        t = Track(track_id=3, xyxy=np.array([50, 50, 120, 160], np.float32),
                  confidence=0.88, class_id=0, class_name="person",
                  trail=[(60, 80), (70, 90), (85, 105)])
        zones = [("z", np.array([[10, 10], [100, 10], [100, 100], [10, 100]], np.int32))]
        out = FrameRenderer().render(frame, [t], zones, fps=30.0, latency_ms=5.0)
        assert out is frame
        assert frame.sum() > 0  # something was drawn


class TestMQTTAlertBackend:
    """events.alert.backend=mqtt publishes each event over a real socket
    (stdlib MQTT 3.1.1 framing, rtmodt_tpu/events/mqtt.py - the reference
    declares this backend but never implements it)."""

    @staticmethod
    def _fake_broker(received, ready, stop):
        """Accept one client, send CONNACK, collect PUBLISH payloads."""
        import socket as sk
        srv = sk.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        srv.settimeout(5.0)
        ready["port"] = srv.getsockname()[1]
        ready["evt"].set()
        conn, _ = srv.accept()
        conn.settimeout(5.0)
        buf = b""
        try:
            while not stop.is_set():
                try:
                    data = conn.recv(4096)
                except sk.timeout:
                    continue
                if not data:
                    break
                buf += data
                while len(buf) >= 2:
                    ptype = buf[0] >> 4
                    # decode remaining length
                    rl, mult, i = 0, 1, 1
                    while True:
                        if i >= len(buf):
                            rl = None
                            break
                        byte = buf[i]
                        rl += (byte & 0x7F) * mult
                        mult *= 128
                        i += 1
                        if not byte & 0x80:
                            break
                    if rl is None or len(buf) < i + rl:
                        break
                    body, buf = buf[i:i + rl], buf[i + rl:]
                    if ptype == 1:                      # CONNECT
                        conn.sendall(bytes([0x20, 0x02, 0x00, 0x00]))
                    elif ptype == 3:                    # PUBLISH (QoS 0)
                        tlen = int.from_bytes(body[:2], "big")
                        topic = body[2:2 + tlen].decode()
                        received.append((topic, body[2 + tlen:]))
                    elif ptype == 14:                   # DISCONNECT
                        return
        finally:
            conn.close()
            srv.close()

    def test_events_published_over_mqtt(self, tmp_path):
        import json
        import threading
        import time as _time
        from rtmodt_tpu.config.loader import AlertConfig
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.tracking.tracker import Track

        received, stop = [], threading.Event()
        ready = {"evt": threading.Event()}
        th = threading.Thread(target=self._fake_broker,
                              args=(received, ready, stop), daemon=True)
        th.start()
        assert ready["evt"].wait(5.0)
        alert = AlertConfig(backend="mqtt", log_path=str(tmp_path / "ev.jsonl"),
                            mqtt_host="127.0.0.1", mqtt_port=ready["port"],
                            mqtt_topic="rtmodt/test")
        eng = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 0.0, "cooldown_sec": 0.0}],
            alert=alert, clock="stream")
        t = Track(track_id=5, xyxy=np.asarray([50, 50, 150, 150], np.float32),
                  confidence=0.9, class_id=0, class_name="person")
        evts = eng.process([t], 3, timestamp=1.0)
        assert len(evts) == 1
        deadline = _time.time() + 5.0
        while not received and _time.time() < deadline:
            _time.sleep(0.05)
        stop.set()
        eng._mqtt.close()
        assert received, "broker saw no PUBLISH"
        topic, payload = received[0]
        assert topic == "rtmodt/test"
        rec = json.loads(payload)
        assert rec["track_id"] == 5 and rec["zone_name"] == "z"
        # JSONL audit log still written alongside
        assert (tmp_path / "ev.jsonl").read_text().strip()
