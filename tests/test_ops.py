"""Unit tests for the core JAX ops against independent NumPy/OpenCV oracles."""

import numpy as np
import pytest

from tests.conftest import random_boxes


def _np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + ab[None, :] - inter + 1e-7)


class TestIoU:
    def test_matches_numpy(self, rng):
        from rtmodt_tpu.ops import pairwise_iou

        a = random_boxes(rng, 17)
        b = random_boxes(rng, 9)
        got = np.asarray(pairwise_iou(a, b))
        np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-5)

    def test_identity(self, rng):
        from rtmodt_tpu.ops import pairwise_iou

        a = random_boxes(rng, 5)
        np.testing.assert_allclose(np.diag(np.asarray(pairwise_iou(a, a))), 1.0, atol=1e-5)


class TestNMS:
    def _np_greedy_nms(self, boxes, scores, iou_thresh):
        order = np.argsort(-scores)
        keep = []
        while len(order):
            i = order[0]
            keep.append(i)
            if len(order) == 1:
                break
            ious = _np_iou(boxes[i : i + 1], boxes[order[1:]])[0]
            order = order[1:][ious <= iou_thresh]
        return keep

    def test_agnostic_matches_oracle(self, rng):
        from rtmodt_tpu.ops import batched_nms_fixed

        n = 60
        boxes = random_boxes(rng, n, w=640, h=640)
        scores1 = rng.uniform(0.01, 1.0, n).astype(np.float32)
        class_scores = np.zeros((n, 3), np.float32)
        class_scores[np.arange(n), rng.integers(0, 3, n)] = scores1

        res = batched_nms_fixed(boxes, class_scores, conf_thresh=0.1, iou_thresh=0.5,
                                max_det=50, num_candidates=64, agnostic=True)
        got = {tuple(np.round(b, 2)) for b, v in zip(np.asarray(res.boxes), np.asarray(res.valid)) if v}

        m = scores1 >= 0.1
        keep = self._np_greedy_nms(boxes[m], scores1[m], 0.5)
        want = {tuple(np.round(b, 2)) for b in boxes[m][keep][:50]}
        assert got == want

    def test_fixpoint_matches_sequential_randomized(self, rng):
        """Parallel fixpoint NMS == sequential greedy on dense random scenes
        (high overlap -> deep suppression chains)."""
        from rtmodt_tpu.ops import batched_nms_fixed

        for trial in range(10):
            n = 80
            boxes = random_boxes(rng, n, w=300, h=300, min_size=40, max_size=150)
            scores1 = rng.uniform(0.05, 1.0, n).astype(np.float32)
            cs = np.zeros((n, 1), np.float32)
            cs[:, 0] = scores1
            res = batched_nms_fixed(boxes, cs, 0.05, 0.5, max_det=n,
                                    num_candidates=n, agnostic=True)
            got = {tuple(np.round(b, 2)) for b, v in
                   zip(np.asarray(res.boxes), np.asarray(res.valid)) if v}
            keep = self._np_greedy_nms(boxes, scores1, 0.5)
            want = {tuple(np.round(b, 2)) for b in boxes[keep]}
            assert got == want, f"trial {trial}"

    def test_class_aware_matches_per_class_oracle_randomized(self, rng):
        """Class-aware NMS == independent per-class greedy NMS."""
        from rtmodt_tpu.ops import batched_nms_fixed

        for trial in range(5):
            n, nc = 60, 4
            boxes = random_boxes(rng, n, w=300, h=300, min_size=40, max_size=150)
            cls_ids = rng.integers(0, nc, n)
            scores1 = rng.uniform(0.05, 1.0, n).astype(np.float32)
            cs = np.zeros((n, nc), np.float32)
            cs[np.arange(n), cls_ids] = scores1
            res = batched_nms_fixed(boxes, cs, 0.05, 0.5, max_det=n,
                                    num_candidates=n)
            got = {(tuple(np.round(b, 2)), int(c)) for b, c, v in
                   zip(np.asarray(res.boxes), np.asarray(res.classes),
                       np.asarray(res.valid)) if v}
            want = set()
            for c in range(nc):
                m = cls_ids == c
                if not m.any():
                    continue
                keep = self._np_greedy_nms(boxes[m], scores1[m], 0.5)
                want |= {(tuple(np.round(b, 2)), c) for b in boxes[m][keep]}
            assert got == want, f"trial {trial}"

    def test_class_aware_keeps_overlapping_other_class(self):
        from rtmodt_tpu.ops import batched_nms_fixed

        boxes = np.array([[0, 0, 100, 100], [1, 1, 101, 101]], np.float32)
        cs = np.zeros((2, 2), np.float32)
        cs[0, 0] = 0.9
        cs[1, 1] = 0.8  # overlapping box, different class
        res = batched_nms_fixed(boxes, cs, 0.25, 0.45, max_det=10, num_candidates=2)
        assert int(res.count) == 2
        res = batched_nms_fixed(boxes, cs, 0.25, 0.45, max_det=10, num_candidates=2,
                                agnostic=True)
        assert int(res.count) == 1

    def test_class_mask_filters(self):
        import jax.numpy as jnp
        from rtmodt_tpu.ops import batched_nms_fixed

        boxes = np.array([[0, 0, 10, 10], [50, 50, 80, 80]], np.float32)
        cs = np.zeros((2, 4), np.float32)
        cs[0, 2] = 0.9
        cs[1, 3] = 0.9
        mask = jnp.asarray(np.array([False, False, True, False]))
        res = batched_nms_fixed(boxes, cs, 0.25, 0.45, max_det=5, num_candidates=2,
                                class_mask=mask)
        assert int(res.count) == 1
        assert int(res.classes[0]) == 2

    def test_empty_frame(self):
        from rtmodt_tpu.ops import batched_nms_fixed

        boxes = np.zeros((100, 4), np.float32)
        cs = np.zeros((100, 5), np.float32)
        res = batched_nms_fixed(boxes, cs, 0.25, 0.45, max_det=10, num_candidates=30)
        assert int(res.count) == 0
        assert not bool(np.asarray(res.valid).any())


class TestPolygon:
    def test_matches_opencv(self, rng):
        import cv2
        from rtmodt_tpu.ops import points_in_polygons, pad_polygons

        polys = [
            [[100, 100], [500, 100], [500, 400], [100, 400]],
            [[600, 50], [900, 300], [700, 500], [550, 350], [500, 120]],
            [[0, 0], [50, 0], [25, 80]],
        ]
        padded = pad_polygons(polys, max_vertices=8)
        pts = rng.uniform(0, 1000, (200, 2)).astype(np.float32)
        got = np.asarray(points_in_polygons(pts, padded))
        for zi, poly in enumerate(polys):
            contour = np.asarray(poly, np.float32).reshape(-1, 1, 2)
            for pi, p in enumerate(pts):
                want = cv2.pointPolygonTest(contour, (float(p[0]), float(p[1])), False) >= 0
                # skip exact-boundary points (tie-breaking differs harmlessly)
                d = cv2.pointPolygonTest(contour, (float(p[0]), float(p[1])), True)
                if abs(d) < 1e-3:
                    continue
                assert got[pi, zi] == want, (pi, zi, p)

    def test_padding_is_identity(self, rng):
        from rtmodt_tpu.ops import points_in_polygons, pad_polygons

        poly = [[100, 100], [500, 100], [500, 400], [100, 400]]
        pts = rng.uniform(0, 600, (100, 2)).astype(np.float32)
        a = np.asarray(points_in_polygons(pts, pad_polygons([poly], 4)))
        b = np.asarray(points_in_polygons(pts, pad_polygons([poly], 16)))
        np.testing.assert_array_equal(a, b)


class TestYUVTransport:
    def test_device_decode_matches_cv2(self, rng):
        import cv2
        import jax.numpy as jnp
        from rtmodt_tpu.ops.yuv import pack_i420, i420_to_rgb, content_dims

        frame = cv2.GaussianBlur(
            rng.integers(0, 255, (180, 320, 3), np.uint8), (15, 15), 5)
        yuv, meta = pack_i420(frame, 160)
        ch, cw = content_dims(180, 320, 160)
        ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR_I420)[..., ::-1].astype(np.float32) / 255
        got = np.asarray(i420_to_rgb(jnp.asarray(yuv), ch, cw, dtype=jnp.float32))
        assert np.abs(got - ref).mean() < 0.02  # chroma-interp differences only

    def test_planar_equals_packed(self, rng):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.yuv import (pack_i420, pack_i420_planar,
                                        letterbox_from_i420, planar_letterbox)

        frame = rng.integers(0, 255, (180, 320, 3), np.uint8)
        yuv, meta = pack_i420(frame, 160)
        (y, u, v), meta2 = pack_i420_planar(frame, 160)
        assert meta == meta2
        a = np.asarray(letterbox_from_i420(
            jnp.asarray(yuv), meta.new_h, meta.new_w, 160,
            meta.pad_left, meta.pad_top, dtype=jnp.float32))
        b = np.asarray(planar_letterbox(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), 160,
            meta.pad_left, meta.pad_top, dtype=jnp.float32))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_geometry_matches_letterbox(self):
        from rtmodt_tpu.ops.letterbox import letterbox_meta
        from rtmodt_tpu.ops.yuv import pack_i420

        frame = np.zeros((720, 1280, 3), np.uint8)
        _, meta = pack_i420(frame, 640)
        ref = letterbox_meta(720, 1280, 640)
        assert meta.scale == ref.scale
        assert meta.pad_top == ref.pad_top
        assert (meta.new_h, meta.new_w) == (ref.new_h, ref.new_w)


class TestAssignment:
    def test_greedy_simple(self):
        from rtmodt_tpu.ops import greedy_assign

        sim = np.array([[0.9, 0.1], [0.8, 0.7]], np.float32)
        res = greedy_assign(sim, 0.5)
        assert list(np.asarray(res.row_to_col)) == [0, 1]

    def test_greedy_takes_global_max_first(self):
        from rtmodt_tpu.ops import greedy_assign

        # row0's best is col0 (0.6) but row1-col0 is 0.9: greedy gives col0 to row1
        sim = np.array([[0.6, 0.0], [0.9, 0.0]], np.float32)
        res = greedy_assign(sim, 0.5)
        assert list(np.asarray(res.row_to_col)) == [-1, 0]

    def test_threshold_inclusive(self):
        from rtmodt_tpu.ops import greedy_assign

        sim = np.array([[0.8]], np.float32)
        assert int(greedy_assign(sim, 0.8).row_to_col[0]) == 0
        assert int(greedy_assign(sim, 0.80001).row_to_col[0]) == -1

    def test_nan_row_does_not_disable_other_matches(self):
        """jnp.max over a matrix containing NaN is NaN, which would end the
        match loop with ZERO matches for everyone - one poisoned row must
        only disqualify itself."""
        from rtmodt_tpu.ops import greedy_assign

        sim = np.array([[0.9, 0.1], [np.nan, np.nan]], np.float32)
        res = greedy_assign(sim, 0.2)
        assert list(np.asarray(res.row_to_col)) == [0, -1]

    def test_validity_masks(self):
        from rtmodt_tpu.ops import greedy_assign
        import jax.numpy as jnp

        sim = np.full((3, 3), 0.9, np.float32)
        res = greedy_assign(sim, 0.5,
                            row_valid=jnp.asarray([True, False, True]),
                            col_valid=jnp.asarray([False, True, True]))
        r2c = np.asarray(res.row_to_col)
        assert r2c[1] == -1
        assert set(r2c[[0, 2]]) == {1, 2}

    def test_matches_sequential_greedy_randomized(self, rng):
        """The parallel mutual-best implementation must EXACTLY reproduce
        sequential global-max greedy on random (distinct-valued) matrices."""
        from rtmodt_tpu.ops import greedy_assign

        for trial in range(30):
            r, c = rng.integers(1, 15, 2)
            sim = rng.random((r, c)).astype(np.float32)
            thresh = float(rng.random() * 0.8)
            got = np.asarray(greedy_assign(sim, thresh).row_to_col)
            # sequential oracle
            want = np.full(r, -1, np.int64)
            s = sim.copy()
            for _ in range(min(r, c)):
                if s.max() < thresh:
                    break
                i, j = np.unravel_index(np.argmax(s), s.shape)
                want[i] = j
                s[i, :] = -1e9
                s[:, j] = -1e9
            np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

    def test_masked_matches_sequential_greedy_randomized(self, rng):
        """Parallel mutual-best with row/col validity masks == sequential
        greedy restricted to the valid submatrix."""
        import jax.numpy as jnp
        from rtmodt_tpu.ops import greedy_assign

        for trial in range(20):
            r, c = rng.integers(2, 12, 2)
            sim = rng.random((r, c)).astype(np.float32)
            rv = rng.random(r) > 0.3
            cv = rng.random(c) > 0.3
            thresh = float(rng.random() * 0.6)
            got = np.asarray(greedy_assign(
                sim, thresh, row_valid=jnp.asarray(rv),
                col_valid=jnp.asarray(cv)).row_to_col)
            want = np.full(r, -1, np.int64)
            s = np.where(rv[:, None] & cv[None, :], sim, -1e9)
            for _ in range(min(r, c)):
                if s.max() < thresh:
                    break
                i, j = np.unravel_index(np.argmax(s), s.shape)
                want[i] = j
                s[i, :] = -1e9
                s[:, j] = -1e9
            np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

    def test_lapjv_vs_greedy_quality(self, rng):
        """Optimal JV total similarity must be >= greedy total similarity."""
        from rtmodt_tpu.ops import greedy_assign
        from rtmodt_tpu.native import lapjv

        for _ in range(20):
            sim = rng.random((8, 6)).astype(np.float32)
            g = np.asarray(greedy_assign(sim, 0.3).row_to_col)
            o = lapjv(1.0 - sim.astype(np.float64), cost_limit=0.7)
            g_tot = sum(sim[i, j] for i, j in enumerate(g) if j >= 0)
            o_tot = sum(sim[i, j] for i, j in enumerate(o) if j >= 0)
            assert o_tot >= g_tot - 1e-6


class TestKalman:
    def test_zero_height_box_does_not_poison_state(self):
        """An edge-clipped box with h=0 gives innovation covariance s=0;
        without the epsilon floor the gain is 0/0 = NaN and the track state
        is permanently poisoned (which then NaNs the similarity matrix and
        kills association for the whole frame)."""
        import jax.numpy as jnp
        from rtmodt_tpu.ops import kalman as kf
        from rtmodt_tpu.ops.iou import xyxy_to_cxcyah

        degenerate = jnp.asarray([[10.0, 20.0, 50.0, 20.0]])   # h = 0
        st = kf.initiate(xyxy_to_cxcyah(degenerate))
        st = kf.predict(st)
        st = kf.update(st, xyxy_to_cxcyah(degenerate))
        assert bool(jnp.isfinite(st.mean).all())
        d = kf.gating_distance(st, xyxy_to_cxcyah(degenerate)[None])
        assert bool(jnp.isfinite(d).all())

    def test_device_matches_host(self, rng):
        import jax.numpy as jnp
        from rtmodt_tpu.ops import kalman as kf
        from rtmodt_tpu.tracking.host_kalman import HostKalman

        hk = HostKalman()
        box = np.array([100, 100, 180, 260], np.float64)
        hm, hc = hk.initiate(box)
        meas = np.asarray(kf.initiate(jnp.asarray(hk._to_meas(box))[None]).mean)[0]
        np.testing.assert_allclose(meas, hm, atol=1e-4)

        dm = kf.KalmanState(
            jnp.asarray(hm, jnp.float32)[None],
            kf.pack_cov(jnp.asarray(hc, jnp.float32))[None])
        for step in range(5):
            hm, hc = hk.predict(hm, hc)
            dm = kf.predict(dm)
            new_box = box + (step + 1) * np.array([5, 3, 5, 3])
            hm, hc = hk.update(hm, hc, new_box)
            dm = kf.update(dm, jnp.asarray(hk._to_meas(new_box), jnp.float32)[None])
        np.testing.assert_allclose(np.asarray(dm.mean)[0], hm, rtol=1e-3, atol=1e-2)
        # the host filter runs dense 8x8; the device filter's packed blocks
        # must match its (block-diagonal) covariance exactly
        np.testing.assert_allclose(np.asarray(kf.unpack_cov(dm.cov))[0], hc,
                                   rtol=1e-2, atol=1e-2)

    def test_constant_velocity_convergence(self):
        """Tracking a constant-velocity box: predictions converge to truth."""
        import jax.numpy as jnp
        from rtmodt_tpu.ops import kalman as kf
        from rtmodt_tpu.ops.iou import xyxy_to_cxcyah, cxcyah_to_xyxy

        v = np.array([10.0, 5.0, 10.0, 5.0])
        box = np.array([100, 100, 150, 200], np.float32)
        st = kf.initiate(xyxy_to_cxcyah(jnp.asarray(box))[None])
        for t in range(1, 20):
            st = kf.predict(st)
            st = kf.update(st, xyxy_to_cxcyah(jnp.asarray(box + t * v, jnp.float32))[None])
        st = kf.predict(st)
        pred = np.asarray(cxcyah_to_xyxy(st.mean[:, :4]))[0]
        np.testing.assert_allclose(pred, box + 20 * v, atol=2.0)


class TestLetterbox:
    @pytest.mark.parametrize("hw", [(720, 1280), (1080, 1920), (640, 640), (480, 640)])
    def test_geometry(self, hw):
        from rtmodt_tpu.ops.letterbox import letterbox_meta

        h, w = hw
        m = letterbox_meta(h, w, 640)
        assert m.new_w <= 640 and m.new_h <= 640
        assert max(m.new_w, m.new_h) == 640
        assert abs((m.new_w / m.new_h) - (w / h)) < 0.01

    def test_roundtrip_boxes(self, rng):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.letterbox import letterbox, unletterbox_boxes, letterbox_meta

        frame = (rng.random((720, 1280, 3)) * 255).astype(np.uint8)
        img, meta = letterbox(jnp.asarray(frame), 640)
        assert img.shape == (640, 640, 3)
        # a box in source coords, mapped to model coords then back
        src = np.array([[100, 50, 400, 300]], np.float32)
        model_coords = src * meta.scale + np.array([meta.pad_left, meta.pad_top] * 2)
        back = np.asarray(unletterbox_boxes(jnp.asarray(model_coords), meta))
        np.testing.assert_allclose(back, src, atol=0.5)

    def test_packed_unletterbox_is_per_axis_exact(self):
        """The packed geometry even-rounds each content dim independently
        (1100x621 @640: new_h 361 -> 360 while new_w stays 640), so its
        inverse must divide each axis by its REALIZED scale - the isotropic
        inverse skews x coordinates by several source pixels."""
        import jax.numpy as jnp
        from rtmodt_tpu.ops.yuv import packed_meta, unletterbox_boxes_packed

        meta = packed_meta(621, 1100, 640)
        assert (meta.new_h, meta.new_w) == (360, 640)
        # source box -> model coords via the REAL per-axis scales -> back
        src = np.array([[100.0, 50.0, 1050.0, 600.0]], np.float32)
        sx, sy = meta.new_w / meta.src_w, meta.new_h / meta.src_h
        model = src * np.array([sx, sy, sx, sy], np.float32) + np.array(
            [meta.pad_left, meta.pad_top] * 2, np.float32)
        back = np.asarray(unletterbox_boxes_packed(jnp.asarray(model), meta))
        np.testing.assert_allclose(back, src, atol=1e-3)
        # the isotropic inverse is measurably off on the x axis here
        from rtmodt_tpu.ops.letterbox import unletterbox_boxes
        iso = np.asarray(unletterbox_boxes(jnp.asarray(model), meta))
        assert abs(iso[0, 2] - src[0, 2]) > 2.0

    def test_pad_value(self):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.letterbox import letterbox

        frame = np.zeros((360, 1280, 3), np.uint8)
        img, meta = letterbox(jnp.asarray(frame), 640)
        assert meta.pad_top > 0
        np.testing.assert_allclose(float(img[0, 320, 0]), 114 / 255, atol=1e-2)


class TestRoiCrop:
    def test_matches_cv2_resize_of_tight_crop(self):
        """Integer-aligned box: device crop+resize == cv2.resize (bilinear)
        of the numpy crop."""
        import cv2
        import jax.numpy as jnp
        from rtmodt_tpu.ops.roi import crop_and_resize

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (120, 160, 3), np.uint8)
        box = np.array([[16, 24, 80, 104]], np.float32)     # w=64 h=80
        got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(box),
                                         (40, 32)))[0]
        want = cv2.resize(img[24:104, 16:80].astype(np.float32), (32, 40),
                          interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(got, want, atol=1.0)

    def test_static_shape_and_degenerate_box(self):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.roi import crop_and_resize

        img = jnp.zeros((64, 64, 3), jnp.uint8)
        boxes = jnp.asarray([[10, 10, 30, 30], [0, 0, 0, 0], [-5, -5, 500, 500]],
                            jnp.float32)
        out = crop_and_resize(img, boxes, (16, 8))
        assert out.shape == (3, 16, 8, 3)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestEmbedder:
    def test_shape_norm_determinism(self):
        import jax.numpy as jnp
        from rtmodt_tpu.models.embedder import AppearanceEmbedder, init_embedder

        model, params = init_embedder((64, 32), embed_dim=64)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 255, (5, 64, 32, 3)), jnp.float32)
        e = model.apply(params, x)
        assert e.shape == (5, 64)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1),
                                   1.0, atol=1e-4)
        # deterministic init: same params on re-init
        _, params2 = init_embedder((64, 32), embed_dim=64)
        e2 = model.apply(params2, x)
        np.testing.assert_allclose(np.asarray(e), np.asarray(e2), atol=1e-6)

    def test_distinct_patches_separate(self):
        """Uniform-color patches must be far apart in embedding space
        relative to same-color pairs (random-init discriminability)."""
        import jax.numpy as jnp
        from rtmodt_tpu.models.embedder import init_embedder

        model, params = init_embedder((64, 32), embed_dim=64)
        red = jnp.full((1, 64, 32, 3), 255.0).at[..., 1:].set(0.0)
        green = jnp.full((1, 64, 32, 3), 255.0).at[..., ::2].set(0.0)
        er = np.asarray(model.apply(params, red))[0]
        eg = np.asarray(model.apply(params, green))[0]
        assert float(er @ eg) < 0.95


class TestNmsFromLogits:
    def test_bit_identical_to_decode_then_fixed(self):
        """Decode-after-topk (logit-space selection + candidate-only DFL
        decode) must reproduce decode_predictions + batched_nms_fixed
        exactly - sigmoid/softmax monotonicity makes the paths equivalent."""
        import jax.numpy as jnp
        from rtmodt_tpu.models.yolov8 import decode_predictions
        from rtmodt_tpu.ops.nms import batched_nms_fixed, batched_nms_from_logits

        rng = np.random.default_rng(0)
        A, C, R = 2100, 80, 16
        bd = jnp.asarray(rng.normal(0, 2, (1, A, 4 * R)), jnp.float32)
        cl = jnp.asarray(rng.normal(-4, 2, (1, A, C)), jnp.float32)
        mask = np.zeros(C, bool)
        mask[[0, 1, 2, 3, 5, 7]] = True
        boxes, scores = decode_predictions(bd, cl, 320)
        for cm, agnostic in ((jnp.asarray(mask), False), (None, True), (None, False)):
            r1 = batched_nms_fixed(boxes[0], scores[0], 0.35, 0.45, 50, 150,
                                   cm, agnostic)
            r2 = batched_nms_from_logits(bd[0], cl[0], 320, 0.35, 0.45, 50, 150,
                                         cm, agnostic)
            assert int(r1.count) == int(r2.count)
            n = int(r1.count)
            np.testing.assert_array_equal(np.asarray(r1.classes[:n]),
                                          np.asarray(r2.classes[:n]))
            np.testing.assert_allclose(np.asarray(r1.boxes[:n]),
                                       np.asarray(r2.boxes[:n]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(r1.scores[:n]),
                                       np.asarray(r2.scores[:n]), atol=1e-6)

    def test_empty_when_all_below_threshold(self):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.nms import batched_nms_from_logits

        bd = jnp.zeros((2100, 64), jnp.float32)
        cl = jnp.full((2100, 80), -20.0, jnp.float32)   # sigmoid ~ 2e-9
        r = batched_nms_from_logits(bd, cl, 320, 0.35, 0.45, 50, 150, None, False)
        assert int(r.count) == 0
        assert not bool(np.any(np.asarray(r.valid)))

    def test_approx_topk_identical_on_cpu(self):
        """topk='approx' routes candidate selection through
        jax.lax.approx_max_k (the TPU PartialReduce custom call).  On CPU
        the op falls back to the exact sort, so the full NMS result must be
        bit-identical to topk='exact' - this pins the plumbing; the
        recall/quality trade on real TPU is measured by tools/bench_dense.py
        and the dense tables in docs/RESULTS.md."""
        import jax.numpy as jnp
        from rtmodt_tpu.ops.nms import batched_nms_from_logits

        rng = np.random.default_rng(7)
        A, C, R = 8400, 80, 16
        bd = jnp.asarray(rng.normal(0, 2, (A, 4 * R)), jnp.float32)
        cl = jnp.asarray(rng.normal(-4, 2, (A, C)), jnp.float32)
        r_exact = batched_nms_from_logits(bd, cl, 640, 0.25, 0.45, 100, 300,
                                          None, False, topk="exact")
        r_approx = batched_nms_from_logits(bd, cl, 640, 0.25, 0.45, 100, 300,
                                           None, False, topk="approx")
        for a, b in zip(r_exact, r_approx):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCropYuvRgb:
    def test_matches_cv2_oracle_within_chroma_loss(self):
        """Per-ROI I420->RGB crops vs cv2 crop+resize of the original RGB:
        error bounded by 4:2:0 chroma subsampling loss."""
        import cv2
        import jax.numpy as jnp
        from rtmodt_tpu.ops.roi import crop_yuv_rgb

        rng = np.random.default_rng(0)
        bgr = cv2.GaussianBlur(
            rng.integers(0, 255, (120, 160, 3), np.uint8), (7, 7), 3)
        h, w = 120, 160
        yuv = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
        y = yuv[:h]
        u = yuv[h:h + h // 4].reshape(h // 2, w // 2)
        v = yuv[h + h // 4:].reshape(h // 2, w // 2)
        box = np.array([[16, 24, 80, 104]], np.float32)
        got = np.asarray(crop_yuv_rgb(
            jnp.asarray(y, jnp.float32), jnp.asarray(u, jnp.float32),
            jnp.asarray(v, jnp.float32), jnp.asarray(box), (40, 32)))[0]
        want = cv2.resize(
            cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)[24:104, 16:80].astype(np.float32),
            (32, 40), interpolation=cv2.INTER_LINEAR)
        err = np.abs(got - want)
        assert err.mean() < 5.0 and np.percentile(err, 99) < 20.0
        assert got.min() >= 0.0 and got.max() <= 255.0
