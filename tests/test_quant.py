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
