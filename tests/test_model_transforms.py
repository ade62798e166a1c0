"""Model-transform exactness tests: planar stem and BN fusion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_model():
    from rtmodt_tpu.models.yolov8 import build_model

    model = build_model("yolov8n", num_classes=8, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 160, 160, 3)), train=False)
    # make BN stats non-trivial so fusion is actually exercised
    def perturb(tree, rng):
        flat = {}
        import flax.traverse_util as tu

        for k, v in tu.flatten_dict(tree).items():
            if k[-1] == "mean":
                flat[k] = v + rng.normal(0, 0.5, v.shape).astype(v.dtype)
            elif k[-1] == "var":
                flat[k] = v * rng.uniform(0.5, 2.0, v.shape).astype(v.dtype)
            else:
                flat[k] = v
        return tu.unflatten_dict(flat)

    rng = np.random.default_rng(0)
    variables = {"params": variables["params"],
                 "batch_stats": perturb(variables["batch_stats"], rng)}
    return model, jax.tree.map(jnp.asarray, variables)


class TestBNFusion:
    def test_exact_with_nontrivial_stats(self, tiny_model):
        from rtmodt_tpu.models.weights import fuse_bn
        from rtmodt_tpu.models.yolov8 import build_model

        model, variables = tiny_model
        fused_model = build_model("yolov8n", num_classes=8,
                                  dtype=jnp.float32, fused=True)
        fused_vars = jax.tree.map(jnp.asarray, fuse_bn(jax.device_get(variables)))
        x = jnp.asarray(np.random.default_rng(2).random((2, 160, 160, 3), np.float32))
        a = model.apply(variables, x, train=False)
        b = fused_model.apply(fused_vars, x, train=False)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   rtol=1e-4, atol=1e-4)


class TestPlanarStem:
    def test_matches_standard_path(self, tiny_model):
        import cv2
        from rtmodt_tpu.ops.planar_stem import pad_planes, planar_stem_apply
        from rtmodt_tpu.ops.yuv import pack_i420_planar, planar_letterbox
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        model, variables = tiny_model
        S = 160
        frame = cv2.GaussianBlur(moving_boxes_frame(3, 180, 320, 4)[0], (7, 7), 2)
        (y, u, v), meta = pack_i420_planar(frame, S)

        img = planar_letterbox(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                               S, meta.pad_left, meta.pad_top, dtype=jnp.float32)
        out_std = model.apply(variables, img[None], train=False)

        yp, up, vp = pad_planes(jnp.asarray(y)[None], jnp.asarray(u)[None],
                                jnp.asarray(v)[None], S, meta.pad_left, meta.pad_top)
        feats = planar_stem_apply(variables["params"]["stem"],
                                  variables["batch_stats"]["stem"],
                                  yp, up, vp, dtype=jnp.float32)
        out_pl = model.apply(variables, feats, train=False, skip_stem=True)
        np.testing.assert_allclose(np.asarray(out_std[0]), np.asarray(out_pl[0]),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_std[1]), np.asarray(out_pl[1]),
                                   atol=2e-3)

    def test_fused_stem_variant(self, tiny_model):
        import cv2
        from rtmodt_tpu.models.weights import fuse_bn
        from rtmodt_tpu.models.yolov8 import build_model
        from rtmodt_tpu.ops.planar_stem import pad_planes, planar_stem_apply
        from rtmodt_tpu.ops.yuv import pack_i420_planar, planar_letterbox
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        model, variables = tiny_model
        fused_model = build_model("yolov8n", num_classes=8,
                                  dtype=jnp.float32, fused=True)
        fv = jax.tree.map(jnp.asarray, fuse_bn(jax.device_get(variables)))
        S = 160
        frame = cv2.GaussianBlur(moving_boxes_frame(5, 180, 320, 4)[0], (7, 7), 2)
        (y, u, v), meta = pack_i420_planar(frame, S)
        img = planar_letterbox(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                               S, meta.pad_left, meta.pad_top, dtype=jnp.float32)
        out_std = fused_model.apply(fv, img[None], train=False)
        yp, up, vp = pad_planes(jnp.asarray(y)[None], jnp.asarray(u)[None],
                                jnp.asarray(v)[None], S, meta.pad_left, meta.pad_top)
        feats = planar_stem_apply(fv["params"]["stem"], None, yp, up, vp,
                                  dtype=jnp.float32)
        out_pl = fused_model.apply(fv, feats, train=False, skip_stem=True)
        np.testing.assert_allclose(np.asarray(out_std[0]), np.asarray(out_pl[0]),
                                   atol=2e-3)


class TestS2DFront:
    """ops/s2d_front: stem..down2 in space-to-depth layout must match the
    planar-stem + standard-blocks path exactly (same math, rearranged
    kernels) - fused and unfused, single- and multi-bottleneck variants."""

    @pytest.mark.parametrize("variant", ["yolov8n", "yolov8m"])
    @pytest.mark.parametrize("fused", [False, True])
    def test_matches_planar_path(self, rng, variant, fused):
        from rtmodt_tpu.models.weights import fuse_bn
        from rtmodt_tpu.models.yolov8 import build_model
        from rtmodt_tpu.ops.planar_stem import planar_stem_apply
        from rtmodt_tpu.ops.s2d_front import s2d_front_apply

        S = 128
        base = build_model(variant, num_classes=8, dtype=jnp.float32)
        vs = base.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, S, S, 3), jnp.float32), train=False)
        if fused:
            model = build_model(variant, num_classes=8, dtype=jnp.float32,
                                fused=True)
            vs = fuse_bn(vs)
            stem_stats = None
        else:
            model = base
            stem_stats = vs["batch_stats"]["stem"]

        y = jnp.asarray(rng.integers(0, 256, (2, S, S), np.uint8))
        u = jnp.asarray(rng.integers(0, 256, (2, S // 2, S // 2), np.uint8))
        v = jnp.asarray(rng.integers(0, 256, (2, S // 2, S // 2), np.uint8))

        feats = planar_stem_apply(vs["params"]["stem"], stem_stats, y, u, v,
                                  dtype=jnp.float32)
        ref = model.apply(vs, feats, train=False, skip_stem=True)
        f8 = s2d_front_apply(vs, y, u, v, dtype=jnp.float32)
        got = model.apply(vs, f8, train=False, skip_front=True)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)


class TestX24Front:
    """The double-s2d entry (ops/s2d_front.py::s2d_front_apply_x24 over
    ops/yuv.py::planes_to_x24 + pad_x24) is the same arithmetic as the x6
    entry with rearranged kernels - outputs must match exactly, including
    under letterbox padding with pads divisible by 4."""

    @pytest.mark.parametrize("content", [(128, 128), (72, 128)])
    def test_x24_matches_x6(self, rng, content):
        from rtmodt_tpu.models.yolov8 import build_model
        from rtmodt_tpu.ops.planar_stem import pad_x24, pad_x6
        from rtmodt_tpu.ops.s2d_front import (precompute_front,
                                              s2d_front_apply_x24,
                                              s2d_front_apply_x6)
        from rtmodt_tpu.ops.yuv import planes_to_x24, planes_to_x6

        S = 128
        ch, cw = content
        pad_top, pad_left = (S - ch) // 2, (S - cw) // 2
        assert pad_top % 4 == 0 and pad_left % 4 == 0
        base = build_model("yolov8n", num_classes=8, dtype=jnp.float32)
        vs = base.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, S, S, 3), jnp.float32), train=False)
        pk = precompute_front(vs)

        y = rng.integers(0, 256, (2, ch, cw), np.uint8)
        u = rng.integers(0, 256, (2, ch // 2, cw // 2), np.uint8)
        v = rng.integers(0, 256, (2, ch // 2, cw // 2), np.uint8)

        x6p = pad_x6(jnp.asarray(planes_to_x6(y, u, v)), S, pad_left,
                     pad_top, dtype=jnp.float32)
        x24p = pad_x24(jnp.asarray(planes_to_x24(y, u, v)), S, pad_left,
                       pad_top, dtype=jnp.float32)
        want = np.asarray(s2d_front_apply_x6(pk, x6p, dtype=jnp.float32))
        got = np.asarray(s2d_front_apply_x24(pk, x24p, dtype=jnp.float32))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestNativeFramePack:
    def test_roundtrip_with_device_decode(self, rng):
        """native pack -> device decode must reconstruct the resized frame
        (its constants are exact inverses)."""
        import cv2
        import pytest as _p
        from rtmodt_tpu.native import pack_i420_chunk_native
        from rtmodt_tpu.ops.yuv import content_dims, planar_letterbox

        frames = np.stack([cv2.GaussianBlur(
            rng.integers(0, 255, (180, 320, 3), np.uint8), (15, 15), 5)
            for _ in range(2)])
        ch, cw = content_dims(180, 320, 160)
        res = pack_i420_chunk_native(frames, ch, cw)
        if res is None:
            _p.skip("native packer unavailable")
        y, u, v = res
        rgb = np.asarray(planar_letterbox(
            jnp.asarray(y[0]), jnp.asarray(u[0]), jnp.asarray(v[0]),
            160, 0, 0, dtype=jnp.float32))[:ch, :cw]
        ref = cv2.resize(frames[0], (cw, ch))[..., ::-1].astype(np.float32) / 255
        assert np.abs(rgb - ref).mean() < 0.03

    @staticmethod
    def _spec_yuv(box_bgr):
        """Float-reference I420 from per-output-pixel BGR (the packer spec:
        luma per pixel, chroma from the 2x2 average, exact inverse of the
        device decode constants in ops/yuv.py)."""
        b, g, r = box_bgr[..., 0], box_bgr[..., 1], box_bgr[..., 2]
        lum = 0.299 * r + 0.587 * g + 0.114 * b
        yref = np.clip(lum + 0.5, 0, 255).astype(np.uint8)

        def q(p):
            return (p[:, 0::2, 0::2] + p[:, 0::2, 1::2]
                    + p[:, 1::2, 0::2] + p[:, 1::2, 1::2]) / 4

        b4, g4, r4 = q(b), q(g), q(r)
        lum4 = 0.299 * r4 + 0.587 * g4 + 0.114 * b4
        uref = np.clip((b4 - lum4) / 1.773 + 128.5, 0, 255).astype(np.uint8)
        vref = np.clip((r4 - lum4) / 1.403 + 128.5, 0, 255).astype(np.uint8)
        return yref, uref, vref

    def test_2x_matches_float_spec(self, rng):
        """720p-geometry (exact 2x): bilinear degenerates to the 2x2 box
        average; the AVX-512 fixed-point path must stay within 1 LSB."""
        import pytest as _p
        from rtmodt_tpu.native import pack_i420_chunk_native

        frames = rng.integers(0, 256, (2, 720, 1280, 3), np.uint8)
        res = pack_i420_chunk_native(frames, 360, 640)
        if res is None:
            _p.skip("native packer unavailable")
        y, u, v = res
        f = frames.astype(np.float64)
        box = (f[:, 0::2, 0::2] + f[:, 0::2, 1::2]
               + f[:, 1::2, 0::2] + f[:, 1::2, 1::2]) / 4
        yref, uref, vref = self._spec_yuv(box)
        assert np.abs(y.astype(int) - yref.astype(int)).max() <= 1
        assert np.abs(u.astype(int) - uref.astype(int)).max() <= 1
        assert np.abs(v.astype(int) - vref.astype(int)).max() <= 1

    def test_3x_matches_float_spec(self, rng):
        """1080p-geometry (exact 3x): bilinear at odd integer scale lands on
        source pixel centers; the gather path must match point sampling."""
        import pytest as _p
        from rtmodt_tpu.native import pack_i420_chunk_native

        frames = rng.integers(0, 256, (2, 1080, 1920, 3), np.uint8)
        res = pack_i420_chunk_native(frames, 360, 640)
        if res is None:
            _p.skip("native packer unavailable")
        y, u, v = res
        pt = frames.astype(np.float64)[:, 1::3, 1::3]
        yref, uref, vref = self._spec_yuv(pt)
        assert np.abs(y.astype(int) - yref.astype(int)).max() <= 1
        assert np.abs(u.astype(int) - uref.astype(int)).max() <= 1
        assert np.abs(v.astype(int) - vref.astype(int)).max() <= 1

    def test_pack_chunk_dispatch(self, rng):
        """pack_chunk routes integer-factor geometries to the native packer
        and everything else to cv2, with identical meta either way."""
        from rtmodt_tpu.native import native_pack_wins

        assert native_pack_wins(720, 1280, 360, 640)        # 2x AVX
        assert native_pack_wins(1080, 1920, 360, 640)       # 3x gather
        assert not native_pack_wins(719, 1280, 360, 640)    # non-integer
        assert not native_pack_wins(720, 1280, 360, 644)    # mismatched s

        from rtmodt_tpu.ops.yuv import pack_chunk, pack_i420_planar

        frames = rng.integers(0, 256, (2, 720, 1280, 3), np.uint8)
        (y, u, v), meta = pack_chunk(frames, 640)
        assert y.shape == (2, 360, 640) and u.shape == (2, 180, 320)
        assert (meta.new_h, meta.new_w) == (360, 640)
        # single-frame planar path goes through the same dispatch
        (y1, u1, v1), meta1 = pack_i420_planar(frames[0], 640)
        np.testing.assert_array_equal(y1, y[0])
        assert meta1 == meta
