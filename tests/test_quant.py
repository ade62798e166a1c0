"""INT8 post-training quantization tests (the reference's TRT INT8 analog,
TECHNICAL_DESIGN_DOCUMENT.md:1104; implemented in rtmodt_tpu/quant/ptq.py)."""

import numpy as np
import pytest

from rtmodt_tpu.config.loader import DetectionConfig
from rtmodt_tpu.detection.detector import Detector


def _cfg(**kw):
    kw.setdefault("model", "yolov8n")
    kw.setdefault("input_size", 128)
    kw.setdefault("conf_threshold", 0.01)
    kw.setdefault("nms_candidates", 64)
    kw.setdefault("max_detections", 20)
    kw.setdefault("classes", None)
    return DetectionConfig(**kw)


class TestWeightQuantization:
    def test_per_channel_roundtrip_error(self):
        """Reconstructed weights are within half a quantization step."""
        import jax
        from rtmodt_tpu.quant.ptq import collect_act_scales, quantize_convs

        det = Detector(_cfg(), warmup=False)
        scales = collect_act_scales(
            det.model, det.params, det._synthetic_calib_batches())
        qtree = quantize_convs(det.params, scales)
        assert len(qtree) > 20
        assert "stem" not in qtree                       # first layer stays fp
        params = jax.device_get(det.params)["params"]

        def find(path):
            node = params
            for p in path.split("/"):
                node = node[p]
            return np.asarray(node["conv"]["kernel"], np.float32)

        for path, q in list(qtree.items())[:5]:
            w = find(path)
            rec = np.asarray(q.qkernel, np.float32) * np.asarray(q.wscale)
            step = np.asarray(q.wscale)[None, None, None, :]
            assert np.all(np.abs(w - rec) <= step * 0.5 + 1e-7), path
            assert np.asarray(q.qkernel).dtype == np.int8

    def test_quant_requires_fuse_bn(self):
        from rtmodt_tpu.config import load_config

        with pytest.raises(ValueError, match="fuse_bn"):
            load_config(overrides={"detection": {"quant": "int8", "fuse_bn": False}})

    def test_bad_quant_value(self):
        from rtmodt_tpu.config import load_config

        with pytest.raises(ValueError, match="quant"):
            load_config(overrides={"detection": {"quant": "int4"}})


class TestQuantizedInference:
    def test_outputs_close_to_fp(self):
        """int8 forward stays close to the fp forward across ALL anchors -
        the acceptance analog of the reference's 'mAP 0.78 -> 0.76 under
        INT8' tolerance.  (Post-NMS box lists are not compared positionally:
        with random weights the score landscape is nearly flat, so NMS
        ordering is not a stable observable.)"""
        import jax
        import jax.numpy as jnp
        from rtmodt_tpu.models.yolov8 import decode_predictions

        det_fp = Detector(_cfg(), warmup=False)
        det_q = Detector(_cfg(quant="int8"), warmup=False)
        img = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3)),
                          jnp.bfloat16)
        outs = {}
        for name, det in (("fp", det_fp), ("q", det_q)):
            bd, cl = det.model.apply(det.params, img, train=False)
            boxes, scores = decode_predictions(bd, cl, 128)
            outs[name] = (np.asarray(boxes[0]), np.asarray(scores[0]))
        b_err = np.abs(outs["q"][0] - outs["fp"][0]).max()
        s_err = np.abs(outs["q"][1] - outs["fp"][1]).max()
        assert b_err < 8.0, b_err        # decoded boxes within a few pixels
        assert s_err < 0.05, s_err       # sigmoid scores within 5 points

    def test_calibrate_on_real_frames(self):
        det = Detector(_cfg(quant="int8"), warmup=False)
        frames = [np.random.default_rng(i).integers(0, 255, (160, 160, 3), np.uint8)
                  for i in range(2)]
        det.calibrate(frames)
        res = det.detect(frames[0])
        assert len(res) >= 0                             # runs end-to-end

    def test_calibrate_rejects_fp_mode(self):
        det = Detector(_cfg(), warmup=False)
        with pytest.raises(ValueError, match="int8"):
            det.calibrate([np.zeros((64, 64, 3), np.uint8)])

    def test_pipeline_runs_quantized(self):
        """Full fused pipeline step with detection.quant=int8."""
        from rtmodt_tpu.config import load_config
        from rtmodt_tpu.runtime.pipeline import Pipeline

        cfg = load_config(overrides={
            "detection": {"model": "yolov8n", "input_size": 128, "quant": "int8",
                          "conf_threshold": 0.01, "nms_candidates": 64,
                          "max_detections": 20, "classes": None, "calib_frames": 1},
            "tracking": {"bytetrack": {"max_tracks": 32}},
            "events": {"enabled": False},
            "profiling": {"warmup_frames": 0, "log_interval": 0, "per_stage": False},
            "visualization": {"enabled": False},
        })
        pipe = Pipeline(cfg)
        frame = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
        for fid in range(3):
            tracks, events, res = pipe.step(frame, fid)
        assert res.boxes.shape[0] == 20

        # packed paths must take the module branch of apply_front (int8's
        # interceptor wraps ConvBN modules, which the s2d front bypasses)
        tracks, events, res = pipe.step_packed(frame, 3)
        assert res.boxes.shape[0] == 20
        from rtmodt_tpu.ops.yuv import pack_chunk
        planes, _ = pack_chunk(np.stack([frame] * 2), 128)
        outs, ress = pipe.submit_packed_yuv(planes, 160, 160)
        assert np.asarray(ress.boxes).shape == (2, 20, 4)


class TestQAT:
    """Quantization-aware fine-tuning (quant/qat.py): BN-fold -> frozen
    activation scales -> STE fake-quant training -> PTQ deployment with the
    SAME scales."""

    def _fused_setup(self, size=64, nc=4, seed=0):
        import jax
        import jax.numpy as jnp
        from rtmodt_tpu.models.yolov8 import build_model

        model = build_model("yolov8n", num_classes=nc, dtype=jnp.float32,
                            fused=True)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = model.init(jax.random.PRNGKey(seed),
                                   jnp.zeros((1, size, size, 3), jnp.float32),
                                   train=False)
        return model, variables["params"]

    def _batch(self, size=64, seed=0):
        import numpy as np
        from rtmodt_tpu.training.train_step import Batch

        rng = np.random.default_rng(seed)
        img = rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
        img[:, 16:40, 16:40] = 1.0                       # a bright square
        boxes = np.tile(np.array([[16, 16, 40, 40]], np.float32), (2, 1, 1))
        labels = np.zeros((2, 1), np.int32)
        mask = np.ones((2, 1), bool)
        return Batch(img, boxes, labels, mask)

    def test_fake_quant_forward_close_to_fp(self):
        import numpy as np
        from rtmodt_tpu.quant.ptq import collect_act_scales
        from rtmodt_tpu.quant.qat import FakeQuantModel

        model, params = self._fused_setup()
        x = self._batch().images
        scales = collect_act_scales(model, {"params": params}, [x])
        fq = FakeQuantModel(model, scales)
        bd_fp, cl_fp = model.apply({"params": params}, x, train=False)
        bd_q, cl_q = fq.apply({"params": params}, x, train=False)
        assert np.isfinite(np.asarray(bd_q)).all()
        # random init, 8-bit grid: logits track the fp model closely
        assert np.abs(np.asarray(cl_q) - np.asarray(cl_fp)).mean() < 0.5

    def test_qat_gradients_flow_through_ste(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from rtmodt_tpu.quant.ptq import collect_act_scales
        from rtmodt_tpu.quant.qat import FakeQuantModel

        model, params = self._fused_setup()
        x = self._batch().images
        scales = collect_act_scales(model, {"params": params}, [x])
        fq = FakeQuantModel(model, scales)

        def loss(p):
            bd, cl = fq.apply({"params": p}, x, train=True)
            return jnp.sum(cl ** 2)

        grads = jax.grad(loss)(params)
        # STE must pass gradients into a QUANTIZED conv kernel (down1 is
        # quantized; stem is skipped and must also still receive grads)
        g_down1 = np.asarray(grads["down1"]["conv"]["kernel"])
        g_stem = np.asarray(grads["stem"]["conv"]["kernel"])
        assert np.abs(g_down1).max() > 0
        assert np.abs(g_stem).max() > 0

    def test_qat_finetune_reduces_loss_and_deploys(self):
        import numpy as np
        import jax.numpy as jnp
        from rtmodt_tpu.quant.ptq import quantize_convs, QuantizedModel
        from rtmodt_tpu.quant.qat import (FakeQuantModel, make_qat_step,
                                          qat_finetune)
        import optax

        model, params = self._fused_setup()
        batch = self._batch()
        batches = [batch] * 12
        new_params, scales = qat_finetune(
            model, params, batches, input_size=64, lr=1e-3, log_every=0)

        # loss under fake-quant decreased vs the starting params
        # (the step donates its inputs - feed it copies)
        import jax
        fq = FakeQuantModel(model, scales)
        tx = optax.adamw(1e-3)
        step = make_qat_step(fq, tx, 64)
        copy = lambda t: jax.tree.map(jnp.array, t)
        p0 = copy(params)
        p1 = copy(new_params)
        _, _, m0 = step(p0, tx.init(p0), batch)
        _, _, m1 = step(p1, tx.init(p1), batch)
        assert float(m1["loss"]) < float(m0["loss"])

        # deployment: same scales -> int8 program agrees with the fake-quant
        # numbers it was trained for (bf16 requant tolerance)
        qtree = quantize_convs({"params": new_params}, scales)
        qm = QuantizedModel(model, qtree)
        x = batch.images
        bd_t, cl_t = fq.apply({"params": new_params}, x, train=False)
        bd_d, cl_d = qm.apply({"params": new_params}, x, train=False)
        assert np.abs(np.asarray(cl_d, np.float32)
                      - np.asarray(cl_t, np.float32)).mean() < 0.5
        assert np.isfinite(np.asarray(bd_d, np.float32)).all()

    def test_qat_checkpoint_deploys_through_detector(self, tmp_path):
        """qat_final.npz (BN-fused tree) + frozen scales load through the
        Detector config surface: weights= + quant=int8 + quant_scales=."""
        import numpy as np
        from rtmodt_tpu.models.weights import save_npz
        from rtmodt_tpu.quant.qat import qat_finetune

        model, params = self._fused_setup(size=64, nc=4)
        new_params, scales = qat_finetune(
            model, params, [self._batch()] * 3, input_size=64, lr=1e-4,
            log_every=0)
        wpath = tmp_path / "qat_final.npz"
        spath = tmp_path / "qat_act_scales.npz"
        save_npz({"params": new_params}, str(wpath))
        np.savez(spath, **{k.replace("/", "|"): np.float32(v)
                           for k, v in scales.items()})

        det = Detector(_cfg(model="yolov8n", num_classes=4, input_size=64,
                            weights=str(wpath), quant="int8",
                            quant_scales=str(spath)), warmup=False)
        assert det._ckpt_fused
        res = det.detect(np.random.default_rng(0).integers(
            0, 255, (80, 80, 3), np.uint8))
        assert len(res) >= 0

    def test_fused_checkpoint_requires_fuse_bn(self, tmp_path):
        import pytest
        from rtmodt_tpu.models.weights import save_npz

        model, params = self._fused_setup(size=64, nc=4)
        wpath = tmp_path / "fused.npz"
        save_npz({"params": params}, str(wpath))
        with pytest.raises(ValueError, match="fuse_bn"):
            Detector(_cfg(model="yolov8n", num_classes=4, input_size=64,
                          weights=str(wpath), fuse_bn=False), warmup=False)
