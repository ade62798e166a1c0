"""Multi-stream SPMD pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax


@pytest.fixture(scope="module")
def ms_pipe():
    from rtmodt_tpu.config import load_config
    from rtmodt_tpu.parallel.mesh import create_mesh
    from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

    cfg = load_config(overrides={
        "detection": {"model": "yolov8n", "input_size": 128, "conf_threshold": 0.01,
                      "nms_candidates": 32, "max_detections": 8, "classes": None},
        "tracking": {"bytetrack": {"max_tracks": 16}},
        "profiling": {"per_stage": False},
        "visualization": {"enabled": False},
        "events": {"enabled": False},
    })
    mesh = create_mesh(8)
    return MultiStreamPipeline(cfg, num_streams=8, mesh=mesh)


class TestMultiStream:
    def test_step_shapes_and_sharding(self, ms_pipe):
        frames = np.random.default_rng(0).integers(
            0, 255, (8, 160, 160, 3), np.uint8)
        outs, ress = ms_pipe.step(frames)
        assert outs.boxes.shape == (8, 16, 4)
        assert ress.boxes.shape == (8, 8, 4)
        # state is stream-sharded over the mesh
        shard_counts = {len(x.sharding.device_set) for x in
                        jax.tree.leaves(ms_pipe.state)}
        assert shard_counts == {8}

    def test_streams_are_independent(self, ms_pipe):
        """Identical content in two streams must produce identical track ids
        (each stream has its own id space and state)."""
        from rtmodt_tpu.parallel.multistream import init_multistream_state

        # fresh state: earlier tests leave per-stream tracks behind
        ms_pipe.state = jax.device_put(
            init_multistream_state(8, ms_pipe.cfg.tracking.bytetrack.max_tracks),
            ms_pipe._stream_shard)
        rng = np.random.default_rng(1)
        base = rng.integers(0, 255, (160, 160, 3), np.uint8)
        frames = np.stack([base] * 8)
        for _ in range(2):
            outs, _ = ms_pipe.step(frames)
        host = jax.device_get(outs)
        ref = host.visible[0]
        for s in range(1, 8):
            np.testing.assert_array_equal(host.visible[s], ref)
            np.testing.assert_array_equal(host.track_id[s], host.track_id[0])

    def test_packed_chunk(self, ms_pipe):
        from rtmodt_tpu.ops.yuv import pack_chunk

        t, s = 3, 8
        raw = np.random.default_rng(3).integers(
            0, 255, (t * s, 160, 160, 3), np.uint8)
        (y, u, v), meta = pack_chunk(raw, 128)
        planes = (y.reshape(t, s, *y.shape[1:]),
                  u.reshape(t, s, *u.shape[1:]),
                  v.reshape(t, s, *v.shape[1:]))
        outs, ress = ms_pipe.submit_chunk_packed(planes, 160, 160)
        assert outs.boxes.shape == (t, s, 16, 4)
        host = jax.device_get(outs)
        assert np.isfinite(host.boxes).all()

    def test_chunk_step(self, ms_pipe):
        frames = np.random.default_rng(2).integers(
            0, 255, (3, 8, 160, 160, 3), np.uint8)
        outs, ress = ms_pipe.step_chunk(frames)
        assert outs.boxes.shape == (3, 8, 16, 4)
        assert bool(np.isfinite(jax.device_get(ress.scores)).all())

    def test_x6_chunk_matches_i420(self, ms_pipe):
        """The x6 sharded chunk program is the SAME math as the planar-I420
        one on the same bytes: detections and track outputs must agree
        exactly across all 8 mesh-sharded streams."""
        from rtmodt_tpu.ops.yuv import pack_chunk, planes_to_x6
        from rtmodt_tpu.parallel.multistream import init_multistream_state

        assert ms_pipe._x6_transport()     # default packed -> auto x6
        t, s = 3, 8
        raw = np.random.default_rng(5).integers(
            0, 255, (t * s, 160, 160, 3), np.uint8)
        (y, u, v), _ = pack_chunk(raw, 128)

        state0 = jax.device_put(
            init_multistream_state(s, ms_pipe.cfg.tracking.bytetrack.max_tracks),
            ms_pipe._stream_shard)
        planes_ts = tuple(p.reshape(t, s, *p.shape[1:]) for p in (y, u, v))

        f_i420 = ms_pipe._packed_chunk_for(160, 160, t)
        st_a, outs_a, ress_a = f_i420(
            ms_pipe.params, jax.tree.map(lambda x: x.copy(), state0),
            *planes_ts)

        x6 = planes_to_x6(y, u, v)
        x6 = x6.reshape(t, s, *x6.shape[1:])
        f_x6 = ms_pipe._packed_chunk_x6_for(160, 160, t)
        st_b, outs_b, ress_b = f_x6(
            ms_pipe.params, jax.tree.map(lambda x: x.copy(), state0), x6)

        for a, b in zip(jax.tree.leaves((st_a, outs_a, ress_a)),
                        jax.tree.leaves((st_b, outs_b, ress_b))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_submit_prepacked_x6(self, ms_pipe):
        """submit_chunk_packed accepts the worker-built (T,S,...,6) x6
        tensor directly (bench's ingest-pool path)."""
        from rtmodt_tpu.ops.yuv import pack_chunk, planes_to_x6

        t, s = 2, 8
        raw = np.random.default_rng(9).integers(
            0, 255, (t * s, 160, 160, 3), np.uint8)
        (y, u, v), _ = pack_chunk(raw, 128)
        x6 = planes_to_x6(y, u, v)
        x6 = x6.reshape(t, s, *x6.shape[1:])
        outs, ress = ms_pipe.submit_chunk_packed(x6, 160, 160)
        assert outs.boxes.shape == (t, s, 16, 4)
        assert np.isfinite(np.asarray(jax.device_get(outs.boxes))).all()


class TestMultiStreamDeepSort:
    """DeepSORT's appearance path inside the SPMD program: per-stream ROI
    crops + embedder + association, state sharded over the mesh."""

    @pytest.fixture(scope="class")
    def ds_pipe(self):
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 32,
                          "max_detections": 8, "classes": None},
            "tracking": {"algorithm": "deepsort",
                         "deepsort": {"max_tracks": 16, "n_init": 1,
                                      "embedder": "random"}},
            "profiling": {"per_stage": False},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        return MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))

    def test_step_runs_appearance_path(self, ds_pipe):
        from rtmodt_tpu.tracking.deepsort import DeepSortState

        assert ds_pipe._is_appearance and ds_pipe.emb_params is not None
        frames = np.random.default_rng(0).integers(
            0, 255, (8, 160, 160, 3), np.uint8)
        outs, ress = ds_pipe.step(frames)
        assert outs.boxes.shape == (8, 16, 4)
        # the carried state is the batched DeepSORT pytree (features field)
        assert isinstance(ds_pipe.state, DeepSortState)
        assert ds_pipe.state.feat.shape == (8, 16, 128)
        shard_counts = {len(x.sharding.device_set) for x in
                        jax.tree.leaves(ds_pipe.state)}
        assert shard_counts == {8}
        assert np.isfinite(jax.device_get(outs).boxes).all()

    def test_packed_chunk_deepsort(self, ds_pipe):
        from rtmodt_tpu.ops.yuv import pack_chunk

        t, s = 3, 8
        raw = np.random.default_rng(3).integers(
            0, 255, (t * s, 160, 160, 3), np.uint8)
        (y, u, v), _meta = pack_chunk(raw, 128)
        planes = (y.reshape(t, s, *y.shape[1:]),
                  u.reshape(t, s, *u.shape[1:]),
                  v.reshape(t, s, *v.shape[1:]))
        outs, ress = ds_pipe.submit_chunk_packed(planes, 160, 160)
        assert outs.boxes.shape == (t, s, 16, 4)
        host = jax.device_get(outs)
        assert np.isfinite(host.boxes).all()
        # matched tracks must carry non-zero appearance features
        feats = jax.device_get(ds_pipe.state.feat)
        assert feats.shape == (s, 16, 128)


class TestMultiStreamGMC:
    """Per-stream camera-motion compensation inside the SPMD program: each
    stream carries its own (prev luma grid, validity), sharded along the
    stream axis, and compensates independently (ops/gmc.py::gmc_step)."""

    def _make_pipe(self, gmc_method="phase"):
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 32,
                          "max_detections": 8, "classes": None},
            "tracking": {"bytetrack": {"max_tracks": 16},
                         "gmc": {"method": gmc_method, "grid": 64}},
            "profiling": {"per_stage": False},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        return MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))

    @staticmethod
    def _scene_frames(t, s, rng):
        """Static textured background per stream + one moving box."""
        bgs = rng.integers(0, 255, (s, 160, 160, 3), np.uint8)
        frames = np.empty((t, s, 160, 160, 3), np.uint8)
        for ti in range(t):
            for si in range(s):
                f = bgs[si].copy()
                x = 10 + 6 * ti + 4 * si
                f[40:70, x:x + 24] = (0, 0, 255)
                frames[ti, si] = f
        return frames

    def test_packed_chunk_updates_sharded_carry(self):
        from rtmodt_tpu.ops.yuv import pack_chunk

        pipe = self._make_pipe()
        grids, valid = pipe._gmc_carry
        assert grids.shape == (8, 64, 64)
        np.testing.assert_array_equal(np.asarray(valid), np.zeros(8))
        t, s = 3, 8
        raw = np.random.default_rng(3).integers(
            0, 255, (t * s, 160, 160, 3), np.uint8)
        (y, u, v), _ = pack_chunk(raw, 128)
        planes = (y.reshape(t, s, *y.shape[1:]),
                  u.reshape(t, s, *u.shape[1:]),
                  v.reshape(t, s, *v.shape[1:]))
        outs, _ = pipe.submit_chunk_packed(planes, 160, 160)
        assert outs.boxes.shape == (t, s, 16, 4)
        grids, valid = pipe._gmc_carry
        np.testing.assert_array_equal(np.asarray(valid), np.ones(8))
        assert float(jax.device_get(jax.numpy.abs(grids)).max()) > 0.0
        # the carry is stream-sharded like the tracker state
        assert len(grids.sharding.device_set) == 8

    def test_step_and_chunk_thread_carry(self):
        pipe = self._make_pipe()
        frames = self._scene_frames(1, 8, np.random.default_rng(0))[0]
        pipe.step(frames)
        assert float(np.asarray(pipe._gmc_carry[1]).min()) == 1.0
        pipe._gmc_reset()
        chunk = self._scene_frames(2, 8, np.random.default_rng(0))
        pipe.step_chunk(chunk)
        assert float(np.asarray(pipe._gmc_carry[1]).min()) == 1.0

    def test_static_scene_parity_with_gmc_off(self):
        """Static textured cameras: the dominant translation is ~0 per
        stream, so packed-chunk outputs must match gmc: none."""
        from rtmodt_tpu.ops.yuv import pack_chunk

        t, s = 4, 8
        frames = self._scene_frames(t, s, np.random.default_rng(7))

        def collect(method):
            pipe = self._make_pipe(method)
            flat = frames.reshape(t * s, 160, 160, 3)
            (y, u, v), _ = pack_chunk(flat, 128)
            planes = (y.reshape(t, s, *y.shape[1:]),
                      u.reshape(t, s, *u.shape[1:]),
                      v.reshape(t, s, *v.shape[1:]))
            outs, _ = pipe.submit_chunk_packed(planes, 160, 160)
            return jax.device_get(outs)

        base, comp = collect("none"), collect("phase")
        np.testing.assert_array_equal(base.track_id, comp.track_id)
        np.testing.assert_allclose(base.boxes, comp.boxes, atol=0.5)


class TestMosaicAnnotator:
    """Multi-camera annotated output: per-stream track rendering tiled
    into one mosaic frame (parallel/multistream.py::MosaicAnnotator)."""

    @staticmethod
    def _fake_host(t, s, k):
        from rtmodt_tpu.tracking.bytetrack import TrackOutputs

        rng = np.random.default_rng(0)
        boxes = rng.uniform(10, 100, (t, s, k, 4)).astype(np.float32)
        boxes[..., 2:] = boxes[..., :2] + 20
        vis = np.zeros((t, s, k), bool)
        vis[:, :, 0] = True                # one visible track per stream
        return TrackOutputs(
            boxes=boxes,
            track_id=np.arange(t * s * k, dtype=np.int32).reshape(t, s, k) % 7,
            class_id=np.zeros((t, s, k), np.int32),
            confidence=np.full((t, s, k), 0.9, np.float32),
            age=np.ones((t, s, k), np.int32),
            tsu=np.zeros((t, s, k), np.int32),
            visible=vis)

    def _annot(self, s):
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.multistream import MosaicAnnotator

        cfg = load_config(overrides={})
        return MosaicAnnotator(cfg.visualization, ["person"], s)

    def test_tracks_for_builds_trails(self):
        annot = self._annot(3)
        host = self._fake_host(2, 3, 4)
        tr0 = annot.tracks_for(host, 0, 1)
        assert len(tr0) == 1 and tr0[0].class_name == "person"
        assert len(tr0[0].trail) == 1
        tr1 = annot.tracks_for(host, 1, 1)
        # same track id across frames extends the per-stream trail
        if tr1[0].track_id == tr0[0].track_id:
            assert len(tr1[0].trail) == 2
        # a different stream has an independent trail map
        assert len(annot.tracks_for(host, 0, 2)[0].trail) == 1

    def test_mosaic_shape_and_dead_tile(self):
        annot = self._annot(3)          # 3 streams -> 2x2 grid, 1 filler
        host = self._fake_host(1, 3, 4)
        frames = [np.full((120, 160, 3), 60, np.uint8), None,
                  np.full((120, 160, 3), 60, np.uint8)]
        grid = annot.mosaic(host, 0, frames, [], fps=42.0)
        assert grid.shape == (240, 320, 3)
        # dead slot (top-right tile) stays black outside its label text
        assert grid[100:120, 160 + 80:320].max() == 0

    def test_zero_trail_length_stays_empty(self):
        """visualization.trail_length == 0 must keep trails empty (the
        sliced del form would silently be a no-op at 0) and the trail
        maps must prune ids unseen past the GC horizon."""
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.multistream import MosaicAnnotator

        cfg = load_config(overrides={"visualization": {"trail_length": 0}})
        annot = MosaicAnnotator(cfg.visualization, ["person"], 1)
        host = self._fake_host(1, 1, 4)
        for _ in range(3):
            tracks = annot.tracks_for(host, 0, 0)
        assert tracks and tracks[0].trail == []
        # GC: an id last seen long ago is dropped from the maps
        annot._trails[0][999] = [(1, 1)]
        annot._trail_seen[0][999] = 1
        annot._frame_count[0] = 1023  # next call hits the 512 gate at 1024,
        annot.tracks_for(host, 0, 0)  # 1024 - 1 > the 600-frame horizon
        assert 999 not in annot._trails[0]

    def test_disabled_visualization_tiles_raw_frames(self):
        """visualization.enabled=false still writes the mosaic (parity with
        the single-stream run, which saves/displays raw frames then) but
        skips all drawing - tiles are bit-identical to the inputs."""
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.multistream import MosaicAnnotator

        cfg = load_config(overrides={"visualization": {"enabled": False}})
        annot = MosaicAnnotator(cfg.visualization, ["person"], 2)
        host = self._fake_host(1, 2, 4)
        f0 = np.full((120, 160, 3), 37, np.uint8)
        f1 = np.full((120, 160, 3), 91, np.uint8)
        grid = annot.mosaic(host, 0, [f0.copy(), f1.copy()], [], fps=10.0)
        assert grid.shape == (120, 320, 3)
        np.testing.assert_array_equal(grid[:, :160], f0)
        np.testing.assert_array_equal(grid[:, 160:], f1)

    def test_run_save_video_writes_mosaic(self, tmp_path):
        """Headless multi-camera --save-video: the run writes a mosaic mp4
        sized (rows*H, cols*W) with one frame per real time step."""
        import cv2

        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        vid = str(tmp_path / "cam.mp4")
        write_synthetic_video(vid, frames=8, h=160, w=160, n_objects=2)
        out = tmp_path / "mosaic.mp4"
        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 32,
                          "max_detections": 8, "classes": None},
            "tracking": {"bytetrack": {"max_tracks": 16}},
            "parallel": {"chunk_size": 4, "pipeline_depth": 1},
            "visualization": {"save_video": True, "save_path": str(out)},
            "events": {"enabled": False},
        })
        pipe = MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))
        summary = pipe.run([vid] * 8)
        assert summary["frames"] == 8 * 8
        cap = cv2.VideoCapture(str(out))
        assert cap.isOpened()
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        cap.release()
        assert (w, h) == (3 * 160, 3 * 160)   # 8 streams -> 3x3 grid
        assert n == 8                          # one mosaic frame per step


class TestMultiStreamRun:
    def test_run_end_to_end_with_events(self, tmp_path):
        """Full multi-camera loop: 8 file streams -> time-aligned packed
        chunks -> one SPMD program -> per-stream zone events."""
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        vid = str(tmp_path / "cam.mp4")
        write_synthetic_video(vid, frames=10, h=160, w=160, n_objects=2)
        log = tmp_path / "events.jsonl"
        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 32,
                          "max_detections": 8, "classes": None},
            "tracking": {"bytetrack": {"max_tracks": 16}},
            "parallel": {"chunk_size": 4, "pipeline_depth": 1},
            "visualization": {"enabled": False},
            "events": {"enabled": True,
                       "zones": [{"name": "z", "dwell_time_sec": 0.0,
                                  "cooldown_sec": 0.0,
                                  "polygon": [[0, 0], [160, 0],
                                              [160, 160], [0, 160]]}],
                       "alert": {"log_path": str(log)}},
        })
        pipe = MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))
        summary = pipe.run([vid] * 8)
        # 10 frames/stream: 2 full chunks of 4 + the 2-frame tail padded
        # with blanks (degraded mode) - every real frame is processed
        assert summary["frames"] == 10 * 8
        assert summary["per_stream_frames"] == [10] * 8
        assert summary["dead_streams"] == list(range(8))
        import json
        events = [json.loads(ln) for ln in log.read_text().splitlines()]
        assert events, "full-frame zone with zero dwell must fire"
        streams_seen = {e["metadata"]["stream"] for e in events}
        assert len(streams_seen) > 1  # per-stream engines, stream-tagged
        # per-stream zone analytics in the summary
        zc = summary["zone_counts"]
        assert len(zc) == 8 and all("z" in c for c in zc)
        assert sum(c["z"]["entries"] for c in zc) > 0

    def test_run_degraded_mixed_length_streams(self, tmp_path):
        """A stream that ends early must NOT stop the others: its slot goes
        blank while the longer streams play out to their own EOF (the static
        SPMD shape is preserved - a camera outage cannot kill the fleet)."""
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        short = str(tmp_path / "short.mp4")
        long_ = str(tmp_path / "long.mp4")
        write_synthetic_video(short, frames=4, h=160, w=160, n_objects=2)
        write_synthetic_video(long_, frames=16, h=160, w=160, n_objects=2)
        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 32,
                          "max_detections": 8, "classes": None},
            "tracking": {"bytetrack": {"max_tracks": 16}},
            "parallel": {"chunk_size": 4, "pipeline_depth": 1},
            "visualization": {"enabled": False},
            "events": {"enabled": False},
        })
        pipe = MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))
        summary = pipe.run([short] + [long_] * 7)
        assert summary["per_stream_frames"][0] == 4
        assert summary["per_stream_frames"][1:] == [16] * 7
        assert summary["frames"] == 4 + 16 * 7
        assert summary["dead_streams"] == list(range(8))

    def test_run_source_count_mismatch(self):
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.parallel.mesh import create_mesh
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128},
            "events": {"enabled": False}})
        pipe = MultiStreamPipeline(cfg, num_streams=8, mesh=create_mesh(8))
        with pytest.raises(ValueError, match="sources"):
            pipe.run(["a.mp4"] * 3)


class TestMeshHelpers:
    def test_create_mesh_and_shard(self):
        from rtmodt_tpu.parallel.mesh import create_mesh, shard_batch, replicate

        mesh = create_mesh(8)
        batch = np.zeros((16, 4), np.float32)
        sharded = shard_batch(batch, mesh)
        assert len(sharded.sharding.device_set) == 8
        repl = replicate({"w": np.ones((3, 3))}, mesh)
        assert len(repl["w"].sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(repl["w"]), 1.0)

    def test_create_mesh_too_many(self):
        from rtmodt_tpu.parallel.mesh import create_mesh

        with pytest.raises(ValueError):
            create_mesh(99)

    def test_hybrid_mesh_single_process(self):
        """Single-process fallback: (1, N) mesh with uniform axis names and a
        batch sharded over both axes lands one shard per device."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import PartitionSpec as P
        from rtmodt_tpu.parallel.mesh import create_hybrid_mesh, global_batch_spec

        mesh = create_hybrid_mesh()
        assert mesh.axis_names == ("host", "data")
        assert mesh.devices.shape == (1, jax.device_count())
        batch = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
        sharded = jax.device_put(batch, global_batch_spec(mesh))
        assert len(sharded.addressable_shards) == jax.device_count()

        @jax.jit
        def total(x):
            return jnp.sum(x)

        assert float(total(sharded)) == float(batch.sum())

    def test_init_distributed_noop_single_host(self):
        """Without a coordinator configured, init is a no-op returning False."""
        import os
        from rtmodt_tpu.parallel.mesh import init_distributed

        assert "JAX_COORDINATOR_ADDRESS" not in os.environ
        assert init_distributed() is False
