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
