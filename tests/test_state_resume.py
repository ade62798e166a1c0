"""Kill-and-resume pipeline snapshots (VERDICT r2 #8; SURVEY.md 5.4).

The reference loses all tracker/zone state on restart; this framework
snapshots it (runtime/state_store.py) and resumes a file source with track
IDs, dwell timers, cooldowns and per-zone analytics exactly as if the
process had never died.  The equivalence test is the strong form: one
uninterrupted run vs run-to-N / new-pipeline-resume must log IDENTICAL
event streams.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import pytest

from rtmodt_tpu.config import load_config


def _cfg(tmp, log_name="events.jsonl", chunk=4):
    return load_config(overrides={
        "detection": {"model": "yolov8n", "input_size": 128,
                      "conf_threshold": 0.01, "nms_candidates": 64,
                      "max_detections": 20, "classes": None},
        "tracking": {"bytetrack": {"max_tracks": 32}},
        "events": {"alert": {"log_path": str(tmp / log_name)},
                   "zones": [{"name": "z",
                              "polygon": [[10, 10], [150, 10],
                                          [150, 150], [10, 150]],
                              "dwell_time_sec": 0.0, "cooldown_sec": 0.5}]},
        "profiling": {"warmup_frames": 0, "log_interval": 0,
                      "per_stage": False},
        "parallel": {"chunk_size": chunk},
        "visualization": {"enabled": False},
    })


def _events(path):
    """Event identity tuples (wall-clock timestamp_utc excluded)."""
    if not path.exists():
        return []
    with open(path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    return [(r["event_type"], r["zone_name"], r["track_id"], r["frame_id"],
             round(r["dwell_time_sec"], 3)) for r in rows]


class TestSnapshotRoundTrip:
    def test_tracker_and_engine_state_round_trip(self, tmp_path):
        from rtmodt_tpu.detection.detector import Detections
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.runtime.state_store import load_snapshot, save_snapshot
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        tr = MultiObjectTracker("bytetrack", max_tracks=16)
        for t in range(3):
            tr.update(Detections(
                np.array([[10 + 5 * t, 10, 60 + 5 * t, 60],
                          [100, 100, 140, 140]], np.float32),
                np.array([0.9, 0.8], np.float32),
                np.zeros(2, np.int32), ["obj"]))
        eng = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 0.0, "cooldown_sec": 1.0}],
            log_path=str(tmp_path / "ev.jsonl"))
        tracks = tr.update(Detections(
            np.array([[25, 10, 75, 60], [100, 100, 140, 140]], np.float32),
            np.array([0.9, 0.8], np.float32),
            np.zeros(2, np.int32), ["obj"]))
        eng.process(tracks, frame_id=4, timestamp=4 / 30.0)

        snap = str(tmp_path / "state.npz")
        save_snapshot(snap, tr, eng, frames_done=4, last_ts=4 / 30.0)

        tr2 = MultiObjectTracker("bytetrack", max_tracks=16)
        eng2 = ZoneEventEngine(
            [{"name": "z", "polygon": [[0, 0], [200, 0], [200, 200], [0, 200]],
              "dwell_time_sec": 0.0, "cooldown_sec": 1.0}],
            log_path=str(tmp_path / "ev.jsonl"))
        meta = load_snapshot(snap, tr2, eng2)
        assert meta["frames_done"] == 4

        import jax

        a, b = jax.device_get(tr.state), jax.device_get(tr2.state)
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
        assert tr._trail_map == tr2._trail_map
        assert eng2._occupancy == eng._occupancy
        assert eng2._cooldown == eng._cooldown
        assert eng2.zone_counts() == eng.zone_counts()
        # the snapshot recorded where the JSONL stood at save time
        assert meta["events"]["log_offset"] == (
            tmp_path / "ev.jsonl").stat().st_size

        # continuing both produces the same next IDs (next_id persisted)
        d = Detections(np.array([[200, 20, 240, 60]], np.float32),
                       np.array([0.9], np.float32),
                       np.zeros(1, np.int32), ["obj"])
        ids1 = sorted(t.track_id for t in tr.update(d))
        ids2 = sorted(t.track_id for t in tr2.update(d))
        assert ids1 == ids2

    def test_algorithm_mismatch_refused(self, tmp_path):
        from rtmodt_tpu.runtime.state_store import load_snapshot, save_snapshot
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        tr = MultiObjectTracker("bytetrack", max_tracks=8)
        snap = str(tmp_path / "s.npz")
        save_snapshot(snap, tr)
        tr2 = MultiObjectTracker("ocsort", max_tracks=8)
        with pytest.raises(ValueError, match="algorithm"):
            load_snapshot(snap, tr2)

    def test_multistream_snapshot_refused_by_single_loader(self, tmp_path):
        """A multistream snapshot (S-leading batched arrays) must be refused
        by load_snapshot BEFORE touching tracker state - not fail halfway
        through load_state_arrays with an opaque KeyError (ADVICE r3)."""
        from rtmodt_tpu.runtime.state_store import load_snapshot
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        import json as _json

        tr = MultiObjectTracker("bytetrack", max_tracks=8)
        before = {k: np.asarray(v).copy()
                  for k, v in tr.state_arrays().items()}
        snap = str(tmp_path / "ms.npz")
        # minimal multistream-shaped snapshot: kind tag + batched arrays
        meta = {"version": 1, "kind": "multistream",
                "algorithm": "bytetrack", "num_streams": 2}
        np.savez(snap, meta=np.asarray(_json.dumps(meta)),
                 **{f"tracker/{k}": np.stack([v, v])
                    for k, v in before.items()})
        with pytest.raises(ValueError, match="multistream"):
            load_snapshot(snap, tr)
        # and the tracker was not partially mutated by the refused load
        for k, v in tr.state_arrays().items():
            np.testing.assert_array_equal(np.asarray(v), before[k])

    def test_engine_presence_mismatch_warns(self, tmp_path, caplog):
        """Zone state silently dropped on restore (zones toggled between
        runs) must log a warning either way (ADVICE r3)."""
        import logging

        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.runtime.state_store import load_snapshot, save_snapshot
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        # the facade logger doesn't propagate to root; route it through
        # caplog's handler for this test
        caplog.handler.setLevel(logging.WARNING)
        logging.getLogger("rtmodt").addHandler(caplog.handler)
        try:
            self._engine_mismatch_body(tmp_path, caplog)
        finally:
            logging.getLogger("rtmodt").removeHandler(caplog.handler)

    def _engine_mismatch_body(self, tmp_path, caplog):
        import logging

        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.runtime.state_store import load_snapshot, save_snapshot
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        def fresh_engine(name):
            return ZoneEventEngine(
                [{"name": "z", "polygon": [[0, 0], [9, 0], [9, 9], [0, 9]],
                  "dwell_time_sec": 0.0, "cooldown_sec": 1.0}],
                log_path=str(tmp_path / name))

        tr = MultiObjectTracker("bytetrack", max_tracks=8)
        with_zones = str(tmp_path / "wz.npz")
        save_snapshot(with_zones, tr, fresh_engine("a.jsonl"))
        without = str(tmp_path / "nz.npz")
        save_snapshot(without, tr, None)

        with caplog.at_level(logging.WARNING):
            caplog.clear()
            load_snapshot(with_zones, tr, None)     # state discarded
            assert any("discarded" in r.message for r in caplog.records)
            caplog.clear()
            load_snapshot(without, tr, fresh_engine("b.jsonl"))  # cold start
            assert any("cold" in r.message for r in caplog.records)
            caplog.clear()
            load_snapshot(without, tr, None)        # both absent: quiet
            load_snapshot(with_zones, tr, fresh_engine("c.jsonl"))
            assert not any("discarded" in r.message or "cold" in r.message
                           for r in caplog.records)

    def test_atomic_write_never_leaves_partial(self, tmp_path):
        from rtmodt_tpu.runtime.state_store import save_snapshot
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        tr = MultiObjectTracker("bytetrack", max_tracks=8)
        snap = tmp_path / "s.npz"
        save_snapshot(str(snap), tr)
        first = snap.read_bytes()
        save_snapshot(str(snap), tr)          # overwrite via rename
        assert snap.read_bytes()              # still a complete npz
        assert not list(tmp_path.glob("s.npz.tmp.*"))
        assert len(first) > 0


class TestKillAndResumeEquivalence:
    """One uninterrupted chunked run vs run-to-half + fresh-pipeline resume:
    identical event logs (track IDs, frame ids, dwell times) and identical
    zone analytics - the dwell clock rides the file's stream time, so a
    restart cannot shift it."""

    FRAMES = 24
    HALF = 12

    @pytest.fixture(scope="class")
    def video(self, tmp_path_factory):
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
        write_synthetic_video(path, frames=self.FRAMES, h=160, w=160,
                              n_objects=2)
        return path

    def test_resume_equals_uninterrupted(self, video, tmp_path):
        from rtmodt_tpu.runtime.pipeline import Pipeline

        # --- run A: uninterrupted
        cfg_a = _cfg(tmp_path, "a.jsonl")
        pa = Pipeline(cfg_a)
        pa.run(source=video, max_frames=self.FRAMES)
        ev_a = _events(tmp_path / "a.jsonl")
        assert ev_a, "scenario produced no events; test is vacuous"

        # --- run B: first half, snapshot at clean exit...
        snap = str(tmp_path / "state.npz")
        cfg_b = _cfg(tmp_path, "b.jsonl")
        p1 = Pipeline(cfg_b)
        p1.run(source=video, max_frames=self.HALF, state_path=snap)
        mid_events = len(_events(tmp_path / "b.jsonl"))

        # ...then a FRESH pipeline (new process in production; the state
        # lives only in the snapshot) resumes past the consumed frames
        p2 = Pipeline(_cfg(tmp_path, "b.jsonl"))
        skip = p2.load_runtime_state(snap)
        assert skip == self.HALF
        p2.run(source=video, state_path=snap, skip_frames=skip)

        ev_b = _events(tmp_path / "b.jsonl")
        assert len(ev_b) > mid_events or len(ev_a) == mid_events
        assert ev_b == ev_a
        # analytics carried over, not reset: entry counts / distinct ids
        # match the uninterrupted run's
        assert p2.events.zone_counts() == pa.events.zone_counts()
        # the final snapshot reflects the whole file
        meta = json.loads(str(np.load(snap)["meta"]))
        assert meta["frames_done"] == self.FRAMES

    def test_cli_flag_wiring(self, video, tmp_path, monkeypatch):
        """--resume-state through the real CLI entry point (CliRunner)."""
        import sys

        from click.testing import CliRunner

        sys.modules.pop("tools.run_pipeline", None)
        import tools.run_pipeline as rp

        cfg_yaml = tmp_path / "cfg.yaml"
        cfg_yaml.write_text(f"""
system: {{log_dir: {tmp_path}/logs}}
detection: {{model: yolov8n, input_size: 128, conf_threshold: 0.01,
            nms_candidates: 64, max_detections: 20}}
events:
  alert: {{log_path: {tmp_path}/cli.jsonl}}
  zones:
    - {{name: z, polygon: [[10, 10], [150, 10], [150, 150], [10, 150]],
        dwell_time_sec: 0.0, cooldown_sec: 0.5}}
profiling: {{warmup_frames: 0, log_interval: 0, per_stage: false}}
parallel: {{chunk_size: 4}}
visualization: {{enabled: false}}
""")
        snap = tmp_path / "cli_state.npz"
        r = CliRunner().invoke(rp.main, [
            "-c", str(cfg_yaml), "-s", video, "--max-frames", "8",
            "--resume-state", str(snap)])
        assert r.exit_code == 0, r.output
        assert snap.exists()
        meta = json.loads(str(np.load(snap)["meta"]))
        assert meta["frames_done"] == 8
        # second invocation resumes from the snapshot and advances it
        r = CliRunner().invoke(rp.main, [
            "-c", str(cfg_yaml), "-s", video,
            "--resume-state", str(snap)])
        assert r.exit_code == 0, r.output
        meta = json.loads(str(np.load(snap)["meta"]))
        assert meta["frames_done"] == self.FRAMES

def _ms_cfg(tmp, log_name):
    return load_config(overrides={
        "detection": {"model": "yolov8n", "input_size": 128,
                      "conf_threshold": 0.01, "nms_candidates": 64,
                      "max_detections": 20, "classes": None},
        "tracking": {"bytetrack": {"max_tracks": 32}},
        "events": {"alert": {"log_path": str(tmp / log_name)},
                   "zones": [{"name": "z",
                              "polygon": [[10, 10], [150, 10],
                                          [150, 150], [10, 150]],
                              "dwell_time_sec": 0.0, "cooldown_sec": 0.5}]},
        "profiling": {"warmup_frames": 0, "log_interval": 0,
                      "per_stage": False},
        "parallel": {"chunk_size": 4, "num_streams": 2, "pipeline_depth": 2},
        "visualization": {"enabled": False},
    })


def _events_ms(path):
    """Event identity tuples with the stream tag (multi-camera engines all
    append to one JSONL; ``metadata.stream`` disambiguates)."""
    if not path.exists():
        return []
    with open(path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    return sorted(
        (r.get("metadata", {}).get("stream"), r["event_type"], r["zone_name"],
         r["track_id"], r["frame_id"], round(r["dwell_time_sec"], 3))
        for r in rows)


class TestMultiStreamKillAndResume:
    """The multi-camera analog of TestKillAndResumeEquivalence: the batched
    S-leading tracker state, per-stream engine state, and per-stream
    fast-forward counts survive a restart, so an interrupted 2-camera run
    resumed in a fresh pipeline logs the identical per-stream event
    stream."""

    FRAMES = 24
    HALF = 12

    @pytest.fixture(scope="class")
    def videos(self, tmp_path_factory):
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        d = tmp_path_factory.mktemp("msvid")
        a, b = str(d / "a.mp4"), str(d / "b.mp4")
        write_synthetic_video(a, frames=self.FRAMES, h=160, w=160,
                              n_objects=2)
        write_synthetic_video(b, frames=self.FRAMES, h=160, w=160,
                              n_objects=3)
        return [a, b]

    def test_resume_equals_uninterrupted(self, videos, tmp_path):
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        sum_a = MultiStreamPipeline(_ms_cfg(tmp_path, "ma.jsonl")).run(
            videos, max_frames=self.FRAMES)
        ev_a = _events_ms(tmp_path / "ma.jsonl")
        assert ev_a, "scenario produced no events; test is vacuous"

        snap = str(tmp_path / "ms_state.npz")
        MultiStreamPipeline(_ms_cfg(tmp_path, "mb.jsonl")).run(
            videos, max_frames=self.HALF, state_path=snap)
        meta = json.loads(str(np.load(snap)["meta"]))
        assert meta["kind"] == "multistream"
        assert meta["per_stream_frames"] == [self.HALF, self.HALF]

        # a FRESH pipeline (new process in production) resumes: per-stream
        # fast-forward + restored tracker/engine state
        sum_b = MultiStreamPipeline(_ms_cfg(tmp_path, "mb.jsonl")).run(
            videos, state_path=snap)
        assert _events_ms(tmp_path / "mb.jsonl") == ev_a
        assert sum_b["zone_counts"] == sum_a["zone_counts"]
        meta = json.loads(str(np.load(snap)["meta"]))
        assert meta["per_stream_frames"] == [self.FRAMES, self.FRAMES]

    def test_live_sources_do_not_fast_forward(self, videos, tmp_path,
                                              monkeypatch):
        """Resuming a LIVE multi-camera run must not decode-and-drop
        skip_frames (hours of capture for a 24/7 stream) - live sources
        resume from the current frame; only files fast-forward
        (ADVICE r3 high; mirrors the single-stream gate pipeline.py)."""
        import rtmodt_tpu.ingestion.rtsp_reader as rr
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        snap = str(tmp_path / "live_state.npz")
        MultiStreamPipeline(_ms_cfg(tmp_path, "la.jsonl")).run(
            videos, max_frames=self.HALF, state_path=snap)

        class Liveish(rr.RTSPReader):
            """File-backed reader that claims to be a live source.
            max_reconnects=0 so EOF ends the stream instead of entering the
            live reconnect-and-replay loop."""
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                self._is_file = False
                self.max_reconnects = 0

        # multistream.run imports RTSPReader from the ingestion module at
        # call time, so patching the source module is sufficient
        monkeypatch.setattr(rr, "RTSPReader", Liveish)
        sum_b = MultiStreamPipeline(_ms_cfg(tmp_path, "lb.jsonl")).run(
            videos, state_path=snap)
        # no frames were dropped in fast-forward: the "live" resumed run
        # consumed the full clips again from their current (first) frame
        assert sum_b["frames"] == 2 * self.FRAMES

    def test_mismatched_snapshot_refused(self, tmp_path):
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline
        from rtmodt_tpu.runtime.state_store import (
            load_multistream_snapshot, save_multistream_snapshot,
            save_snapshot)
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        msp = MultiStreamPipeline(_ms_cfg(tmp_path, "x.jsonl"))
        snap = str(tmp_path / "ms.npz")
        save_multistream_snapshot(snap, msp, None,
                                  per_stream_frames=[0, 0],
                                  last_meta=[(0, 0.0), (0, 0.0)],
                                  dead=[False, False])

        cfg3 = _ms_cfg(tmp_path, "x.jsonl")
        cfg3 = dataclasses.replace(
            cfg3, parallel=dataclasses.replace(cfg3.parallel, num_streams=4))
        with pytest.raises(ValueError, match="streams"):
            load_multistream_snapshot(snap, MultiStreamPipeline(cfg3), None)

        # a single-stream snapshot must never restore into the batched
        # pipeline (its state pytree has no stream axis)
        tr = MultiObjectTracker("bytetrack", max_tracks=16)
        single = str(tmp_path / "single.npz")
        save_snapshot(single, tr, None)
        with pytest.raises(ValueError, match="single-stream"):
            load_multistream_snapshot(single, msp, None)

    def test_cli_flag_wiring_multicam(self, videos, tmp_path):
        """--resume-state through the real CLI with repeated -s flags."""
        import sys

        from click.testing import CliRunner

        sys.modules.pop("tools.run_pipeline", None)
        import tools.run_pipeline as rp

        cfg_yaml = tmp_path / "ms.yaml"
        cfg_yaml.write_text(f"""
system: {{log_dir: {tmp_path}/logs}}
detection: {{model: yolov8n, input_size: 128, conf_threshold: 0.01,
            nms_candidates: 64, max_detections: 20}}
events:
  alert: {{log_path: {tmp_path}/mscli.jsonl}}
  zones:
    - {{name: z, polygon: [[10, 10], [150, 10], [150, 150], [10, 150]],
        dwell_time_sec: 0.0, cooldown_sec: 0.5}}
profiling: {{warmup_frames: 0, log_interval: 0, per_stage: false}}
parallel: {{chunk_size: 4}}
visualization: {{enabled: false}}
""")
        snap = tmp_path / "mscli_state.npz"
        r = CliRunner().invoke(rp.main, [
            "-c", str(cfg_yaml), "-s", videos[0], "-s", videos[1],
            "--max-frames", "8", "--resume-state", str(snap)])
        assert r.exit_code == 0, r.output
        meta = json.loads(str(np.load(snap)["meta"]))
        assert meta["kind"] == "multistream"
        assert meta["per_stream_frames"] == [8, 8]
        r = CliRunner().invoke(rp.main, [
            "-c", str(cfg_yaml), "-s", videos[0], "-s", videos[1],
            "--resume-state", str(snap)])
        assert r.exit_code == 0, r.output
        meta = json.loads(str(np.load(snap)["meta"]))
        assert meta["per_stream_frames"] == [self.FRAMES, self.FRAMES]
