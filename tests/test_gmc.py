"""Oracle tests for ops/gmc.py: phase-correlation shift recovery and
tracker-state compensation (the TPU-native BoT-SORT-style GMC extension;
the reference has no camera-motion handling at all).

Textures are BROADBAND (band-limited Fourier noise): phase correlation
whitens the spectrum, so sparse-spectrum scenes (a few sinusoids) are the
one place it degenerates - and also the one place real cameras never
produce.  Circular Fourier shifts give exact sub-pixel oracles; canvas
crops model a real pan (new content enters at the edges).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rtmodt_tpu.ops.gmc import compensate, luma_grid, phase_shift


def _noise_field(g: int, seed: int = 0, smooth: float = 8.0) -> np.ndarray:
    """Smooth broadband scene: low-pass-filtered complex Fourier noise."""
    rng = np.random.default_rng(seed)
    spec = rng.normal(size=(g, g)) + 1j * rng.normal(size=(g, g))
    fy = np.fft.fftfreq(g)[:, None]
    fx = np.fft.fftfreq(g)[None, :]
    spec *= np.exp(-(np.sqrt(fy * fy + fx * fx) * g / smooth) ** 2)
    img = np.real(np.fft.ifft2(spec))
    return 80.0 + 40.0 * img / np.abs(img).max()


def _circular_shift(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Exact (sub-pixel) circular translation via a Fourier phase ramp."""
    g = img.shape[0]
    fy = np.fft.fftfreq(g)[:, None]
    fx = np.fft.fftfreq(g)[None, :]
    return np.real(np.fft.ifft2(np.fft.fft2(img)
                                * np.exp(-2j * np.pi * (fy * dy + fx * dx))))


class TestPhaseShift:
    def test_integer_shift_recovered(self):
        prev = _noise_field(128)
        for dx, dy in [(5, 0), (0, -7), (12, 9), (-15, -3)]:
            cur = _circular_shift(prev, dx, dy)
            shift, conf = phase_shift(jnp.asarray(prev), jnp.asarray(cur))
            assert float(conf) > 1.5
            np.testing.assert_allclose(np.asarray(shift), [dx, dy], atol=0.3)

    def test_subpixel_shift(self):
        prev = _noise_field(128, seed=3)
        for dx, dy in [(2.5, 0.0), (-3.25, 1.75), (0.4, -0.4)]:
            cur = _circular_shift(prev, dx, dy)
            shift, _ = phase_shift(jnp.asarray(prev), jnp.asarray(cur))
            np.testing.assert_allclose(np.asarray(shift), [dx, dy], atol=0.35)

    def test_noncircular_pan_via_canvas_crop(self):
        """A real pan: crops of one big scene - content leaves/enters at
        the edges, the Hann window absorbs it.  Content displacement is
        MINUS the camera motion."""
        g = 128
        big = _noise_field(2 * g, seed=7)
        o = 32
        prev = big[o:o + g, o:o + g]
        for cam_dx, cam_dy in [(8, 0), (-10, 5), (15, 15)]:
            cur = big[o + cam_dy:o + cam_dy + g, o + cam_dx:o + cam_dx + g]
            shift, conf = phase_shift(jnp.asarray(prev), jnp.asarray(cur))
            assert float(conf) > 1.5
            np.testing.assert_allclose(
                np.asarray(shift), [-cam_dx, -cam_dy],
                atol=0.2 + 0.1 * max(abs(cam_dx), abs(cam_dy)))

    def test_identical_frames_zero(self):
        img = jnp.asarray(_noise_field(64, seed=1))
        shift, conf = phase_shift(img, img)
        np.testing.assert_allclose(np.asarray(shift), [0.0, 0.0], atol=1e-3)
        assert float(conf) > 1.5

    def test_flat_frames_gated_to_zero(self):
        a = jnp.full((64, 64), 37.0)
        shift, conf = phase_shift(a, a)
        # no texture -> no usable peak -> the gate must refuse to guess
        assert float(conf) < 1.5
        np.testing.assert_array_equal(np.asarray(shift), [0.0, 0.0])

    def test_uncorrelated_frames_gated(self):
        # a scene cut: two INDEPENDENT scenes must not produce a shift
        g = 128
        big = _noise_field(2 * g, seed=9)
        shift, conf = phase_shift(jnp.asarray(big[:g, :g]),
                                  jnp.asarray(big[g:, g:]))
        assert float(conf) < 1.5
        np.testing.assert_array_equal(np.asarray(shift), [0.0, 0.0])

    def test_excessive_shift_gated(self):
        g = 64
        prev = _noise_field(g, seed=2)
        cur = _circular_shift(prev, 30.0, 0.0)    # 30 px > 64 * 0.25
        shift, _ = phase_shift(jnp.asarray(prev), jnp.asarray(cur),
                               max_shift_frac=0.25)
        np.testing.assert_array_equal(np.asarray(shift), [0.0, 0.0])


class TestLumaGrid:
    def test_shapes_and_channel_mean(self):
        bgr = np.zeros((240, 320, 3), np.uint8)
        bgr[:, :, 0] = 30
        bgr[:, :, 2] = 90
        out = luma_grid(jnp.asarray(bgr), grid=64)
        assert out.shape == (64, 64)
        np.testing.assert_allclose(np.asarray(out), 40.0, atol=1e-3)

    def test_roundtrip_through_resize_still_correlates(self):
        # full pipeline: 480p frames -> 128 grid -> shift in grid units
        h, w, g = 480, 640, 128
        big = _noise_field(1024, seed=5, smooth=24.0)
        dx_src = 24                           # pure horizontal camera pan
        prev = big[100:100 + h, 100:100 + w]
        cur = big[100:100 + h, 100 + dx_src:100 + dx_src + w]
        shift, conf = phase_shift(luma_grid(jnp.asarray(prev), g),
                                  luma_grid(jnp.asarray(cur), g))
        assert float(conf) > 1.5
        dx_grid = -dx_src * g / w             # content moves opposite
        np.testing.assert_allclose(float(shift[0]), dx_grid, atol=0.4)
        np.testing.assert_allclose(float(shift[1]), 0.0, atol=0.4)


def _shake_scene(frames: int = 14, h: int = 160, w: int = 240,
                 amp: float = 20.0, seed: int = 0):
    """Miniature camera-shake scene (tools/compare_trackers.py --scenario
    shake): multi-scale textured world, white-noise camera jumps, two
    slowly-drifting objects.  Returns (frames_bgr, gt_by_frame)."""
    import cv2

    rng = np.random.default_rng(seed)
    m = int(amp) + 20
    ch, cw = h + 2 * m, w + 2 * m
    acc = np.zeros((ch, cw, 3), np.float32)
    for sigma, wgt in ((2, 1.0), (8, 2.0), (24, 4.0)):
        n = rng.integers(0, 255, (ch, cw, 3)).astype(np.float32)
        acc += wgt * (cv2.GaussianBlur(n, (0, 0), sigma) - 127.5)
    acc = (acc - acc.min()) / (acc.max() - acc.min() + 1e-9)
    canvas = (20 + 200 * acc).astype(np.uint8)

    bw, bh = 26, 34
    objs = [(1, m + 50.0, m + 40.0, 0.8, 0.4, (0, 0, 255)),
            (2, m + 150.0, m + 90.0, -0.8, -0.4, (255, 255, 0))]
    frames_bgr, gt = [], {}
    for t in range(frames):
        ox = float(m) if t == 0 else float(m + rng.uniform(-amp, amp))
        oy = float(m) if t == 0 else float(m + rng.uniform(-amp, amp))
        oxi, oyi = int(round(ox)), int(round(oy))
        frame = canvas[oyi:oyi + h, oxi:oxi + w].copy()
        vis = {}
        for oid, wx, wy, vx, vy, color in objs:
            xi = int(round(max(0, min(w - bw, wx + vx * t - oxi))))
            yi = int(round(max(0, min(h - bh, wy + vy * t - oyi))))
            frame[yi:yi + bh, xi:xi + bw] = color
            vis[oid] = np.array([xi, yi, xi + bw, yi + bh], np.float32)
        frames_bgr.append(frame)
        gt[t + 1] = vis
    return frames_bgr, gt


def _run_facade(frames_bgr, gt, **tracker_kwargs):
    from rtmodt_tpu.detection.detector import Detections
    from rtmodt_tpu.evaluation.mot_eval import evaluate_mot
    from rtmodt_tpu.tracking.tracker import MultiObjectTracker

    tr = MultiObjectTracker(**tracker_kwargs)
    pred = {}
    for t, frame in enumerate(frames_bgr):
        vis = gt[t + 1]
        dets = Detections(
            np.stack(list(vis.values())), np.full(len(vis), 0.9, np.float32),
            np.zeros(len(vis), np.int32), ["obj"])
        tracks = tr.update(dets, frame)
        pred[t + 1] = {tk.track_id: np.asarray(tk.xyxy, np.float64)
                       for tk in tracks}
    to_xywh = lambda d: {f: {i: np.array([b[0], b[1], b[2] - b[0],
                                          b[3] - b[1]]) for i, b in v.items()}
                         for f, v in d.items()}
    return evaluate_mot(to_xywh(gt), to_xywh(pred))


class TestFacadeGMC:
    """End-to-end: the façade estimates camera motion from the frames it is
    already given and compensates the track state before association."""

    def test_shake_scene_gmc_restores_identity(self):
        frames_bgr, gt = _shake_scene()
        base = _run_facade(frames_bgr, gt, algorithm="bytetrack",
                           bytetrack=dict(match_metric="iou_distance"))
        comp = _run_facade(frames_bgr, gt, algorithm="bytetrack",
                           bytetrack=dict(match_metric="iou_distance"),
                           gmc=dict(method="phase", grid=64))
        # without compensation the white-noise jumps break the IoU gate
        assert base["idf1"] < 0.7
        assert comp["idf1"] > 0.95
        assert comp["num_switches"] == 0

    def test_static_camera_is_unharmed(self):
        # same scene WITHOUT camera motion: GMC must be a no-op
        frames_bgr, gt = _shake_scene(amp=0.0)
        base = _run_facade(frames_bgr, gt, algorithm="bytetrack")
        comp = _run_facade(frames_bgr, gt, algorithm="bytetrack",
                           gmc=dict(method="phase", grid=64))
        assert comp["idf1"] >= base["idf1"] - 1e-9
        assert comp["idf1"] > 0.95

    def test_reset_clears_gmc_history(self):
        from rtmodt_tpu.detection.detector import Detections
        from rtmodt_tpu.tracking.tracker import MultiObjectTracker

        frames_bgr, gt = _shake_scene(frames=3)
        tr = MultiObjectTracker(algorithm="bytetrack",
                                gmc=dict(method="phase", grid=64))
        vis = gt[1]
        dets = Detections(np.stack(list(vis.values())),
                          np.full(len(vis), 0.9, np.float32),
                          np.zeros(len(vis), np.int32), ["obj"])
        tr.update(dets, frames_bgr[0])
        assert tr._gmc_prev is not None
        tr.reset()
        assert tr._gmc_prev is None


class TestPipelineGMC:
    """The fused/packed/chunked pipeline programs thread the GMC carry
    (prev luma grid + validity) and compensate INSIDE the jitted step."""

    @pytest.fixture(scope="class")
    def gmc_cfg(self, tmp_path_factory):
        from rtmodt_tpu.config import load_config

        tmp = tmp_path_factory.mktemp("gmc_pipe")
        return load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128,
                          "conf_threshold": 0.01, "nms_candidates": 64,
                          "max_detections": 20, "classes": None},
            "tracking": {"bytetrack": {"max_tracks": 32},
                         "gmc": {"method": "phase", "grid": 64}},
            "events": {"alert": {"log_path": str(tmp / "events.jsonl")}},
            "profiling": {"warmup_frames": 0, "log_interval": 0},
            "visualization": {"enabled": False},
        })

    def test_fused_step_updates_carry(self, gmc_cfg):
        import dataclasses

        from rtmodt_tpu.runtime.pipeline import Pipeline

        cfg = dataclasses.replace(
            gmc_cfg, profiling=dataclasses.replace(gmc_cfg.profiling,
                                                   per_stage=False),
            parallel=dataclasses.replace(gmc_cfg.parallel, transport="bgr"))
        pipe = Pipeline(cfg)
        assert float(pipe._gmc_carry[1]) == 0.0
        frame = np.random.default_rng(0).integers(0, 255, (160, 160, 3),
                                                  np.uint8)
        pipe.step(frame, 0)
        grid, valid = pipe._gmc_carry
        assert float(valid) == 1.0
        assert grid.shape == (64, 64)
        assert float(jnp.abs(grid).max()) > 0.0

    def test_per_stage_mode_applies_gmc(self, gmc_cfg):
        from rtmodt_tpu.runtime.pipeline import Pipeline

        pipe = Pipeline(gmc_cfg)     # profiling.per_stage default (true)
        if not pipe._per_stage:
            pytest.skip("default config no longer per-stage")
        rng = np.random.default_rng(1)
        for fid in range(2):
            pipe.step(rng.integers(0, 255, (160, 160, 3), np.uint8), fid)
        assert float(pipe._gmc_carry[1]) == 1.0

    def test_packed_step_and_chunked_run(self, gmc_cfg, tmp_path):
        import dataclasses

        from rtmodt_tpu.runtime.pipeline import Pipeline
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        video = str(tmp_path / "synth.mp4")
        write_synthetic_video(video, frames=10, h=160, w=160, n_objects=2)
        cfg = dataclasses.replace(
            gmc_cfg,
            profiling=dataclasses.replace(gmc_cfg.profiling, per_stage=False),
            parallel=dataclasses.replace(gmc_cfg.parallel, chunk_size=4,
                                         pipeline_depth=1))
        pipe = Pipeline(cfg)
        pipe.run(source=video)
        assert pipe.profiler._frame_count == 10
        assert float(pipe._gmc_carry[1]) == 1.0

    def test_gmc_transport_ab_x6_vs_i420(self, gmc_cfg):
        """GMC-on A/B between the i420 and x6 transports on a PANNING
        textured scene (ADVICE round 4): both now feed luma_grid the same
        half-res luma (i420 pools 2x2 via ops/gmc.py::half_res_luma; x6
        averages the four Y parity channels), so the carried grids must be
        bit-equal and the compensated track boxes must agree to sub-pixel
        tolerance (the detection convs themselves may fuse differently
        between the two programs)."""
        import dataclasses

        import jax

        from rtmodt_tpu.runtime.pipeline import Pipeline

        rng = np.random.default_rng(3)
        canvas = rng.integers(0, 255, (220, 220, 3), np.uint8)
        frames = []
        for t in range(8):
            ox = 4 * t            # camera pans right over the canvas
            f = canvas[20:180, ox:ox + 160].copy()
            f[60:90, 70:100] = (255, 0, 0)   # one object, scene-fixed
            frames.append(f)
        frames = np.stack(frames)

        def collect(transport):
            cfg = dataclasses.replace(
                gmc_cfg,
                profiling=dataclasses.replace(gmc_cfg.profiling,
                                              per_stage=False),
                parallel=dataclasses.replace(gmc_cfg.parallel,
                                             transport=transport))
            pipe = Pipeline(cfg)
            outs, _ = pipe.submit_chunk_packed(frames)
            return jax.device_get(outs), jax.device_get(pipe._gmc_carry)

        (out_i, carry_i), (out_x, carry_x) = (collect("i420"),
                                              collect("x6"))
        np.testing.assert_array_equal(np.asarray(carry_i[0]),
                                      np.asarray(carry_x[0]))
        assert float(carry_i[1]) == float(carry_x[1]) == 1.0
        np.testing.assert_array_equal(out_i.track_id, out_x.track_id)
        np.testing.assert_allclose(out_i.boxes, out_x.boxes, atol=0.75)

        # x24 (double s2d): grids still bit-equal (the 16 Y parities mean
        # to the same half-res luma), boxes to sub-pixel tolerance
        out_x24, carry_x24 = collect("x24")
        np.testing.assert_array_equal(np.asarray(carry_i[0]),
                                      np.asarray(carry_x24[0]))
        np.testing.assert_array_equal(out_i.track_id, out_x24.track_id)
        np.testing.assert_allclose(out_i.boxes, out_x24.boxes, atol=0.75)

    def test_static_camera_gmc_output_parity(self, gmc_cfg):
        """Static camera over a TEXTURED background: the dominant scene
        translation is zero, so the chunked program's outputs must match
        gmc: none.  (A textureless background with coherently-moving
        objects is different: there the objects ARE the dominant content
        and a nonzero estimate is correct behavior.)"""
        import dataclasses

        import jax

        from rtmodt_tpu.runtime.pipeline import Pipeline

        rng = np.random.default_rng(0)
        bg = rng.integers(0, 255, (160, 160, 3), np.uint8)
        frames = []
        for t in range(8):
            f = bg.copy()
            x = 20 + 6 * t
            f[40:70, x:x + 24] = (0, 0, 255)
            frames.append(f)
        frames = np.stack(frames)

        def collect(cfg):
            pipe = Pipeline(cfg)
            outs, _ = pipe.submit_chunk_packed(frames)
            return jax.device_get(outs)

        base_cfg = dataclasses.replace(
            gmc_cfg,
            tracking=dataclasses.replace(
                gmc_cfg.tracking,
                gmc=dataclasses.replace(gmc_cfg.tracking.gmc, method="none")),
            profiling=dataclasses.replace(gmc_cfg.profiling, per_stage=False))
        on_cfg = dataclasses.replace(
            gmc_cfg,
            profiling=dataclasses.replace(gmc_cfg.profiling, per_stage=False))
        base, comp = collect(base_cfg), collect(on_cfg)
        np.testing.assert_array_equal(base.track_id, comp.track_id)
        np.testing.assert_allclose(base.boxes, comp.boxes, atol=0.5)


class TestCompensate:
    def test_bytetrack_state_fields(self):
        from rtmodt_tpu.tracking.bytetrack import init_track_state

        st = init_track_state(8)
        st = st._replace(
            boxes=jnp.arange(32, dtype=jnp.float32).reshape(8, 4),
            kf_mean=jnp.ones((8, 8), jnp.float32),
            kf_cov=jnp.full(st.kf_cov.shape, 2.0),
        )
        out = compensate(st, jnp.asarray([3.0, -2.0]))
        np.testing.assert_allclose(
            np.asarray(out.boxes - st.boxes),
            np.tile([3.0, -2.0, 3.0, -2.0], (8, 1)))
        np.testing.assert_allclose(np.asarray(out.kf_mean[:, 0]), 4.0)
        np.testing.assert_allclose(np.asarray(out.kf_mean[:, 1]), -1.0)
        # aspect/height/velocities and the covariance are translation-invariant
        np.testing.assert_allclose(np.asarray(out.kf_mean[:, 2:]), 1.0)
        np.testing.assert_array_equal(np.asarray(out.kf_cov),
                                      np.asarray(st.kf_cov))
        assert out.track_id.dtype == st.track_id.dtype

    def test_ocsort_observation_fields(self):
        from rtmodt_tpu.tracking.ocsort import init_ocsort_state

        st = init_ocsort_state(4, delta_t=2)
        st = st._replace(
            last_obs=jnp.ones((4, 4), jnp.float32),
            obs_ring=jnp.ones((4, 3, 4), jnp.float32),
        )
        out = compensate(st, jnp.asarray([1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(out.last_obs),
                                   np.tile([2.0, 3.0, 2.0, 3.0], (4, 1)))
        np.testing.assert_allclose(np.asarray(out.obs_ring[:, 1]),
                                   np.tile([2.0, 3.0, 2.0, 3.0], (4, 1)))
        # unit observation velocity is direction-only: untouched
        np.testing.assert_array_equal(np.asarray(out.velocity),
                                      np.asarray(st.velocity))

    def test_batched_stream_axis(self):
        import jax

        from rtmodt_tpu.tracking.bytetrack import init_track_state

        st = jax.tree.map(lambda x: jnp.stack([x, x]), init_track_state(4))
        out = compensate(st, jnp.asarray([5.0, 0.0]))
        assert out.boxes.shape == (2, 4, 4)
        np.testing.assert_allclose(np.asarray(out.boxes[..., 0]), 5.0)

    def test_zero_shift_is_identity(self):
        from rtmodt_tpu.tracking.deepsort import init_deepsort_state

        st = init_deepsort_state(4, 16)
        out = compensate(st, jnp.zeros((2,)))
        for a, b in zip(out, st):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
