"""Detector-layer tests: Detections contract, weight conversion, detect API."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


class TestDetections:
    def test_len_and_filter(self):
        from rtmodt_tpu.detection.detector import Detections

        d = Detections(
            np.array([[0, 0, 10, 10], [5, 5, 20, 20], [1, 1, 2, 2]], np.float32),
            np.array([0.9, 0.8, 0.7], np.float32),
            np.array([0, 2, 5], np.int32),
        )
        assert len(d) == 3
        f = d.filter_classes([0, 5])
        assert len(f) == 2
        assert list(f.class_id) == [0, 5]

    def test_empty_contract(self):
        from rtmodt_tpu.detection.detector import Detections

        e = Detections.empty()
        assert len(e) == 0
        assert e.xyxy.shape == (0, 4)
        assert e.confidence.shape == (0,)
        assert e.class_id.dtype == np.int32


def _fake_ultralytics_state(model, input_size=64):
    """Build a torch-style state dict (numpy values) matching ultralytics
    naming, derived by INVERTING the converter's layer map against our flax
    shapes - so conversion is validated without real ultralytics weights."""
    from flax import traverse_util
    from rtmodt_tpu.models.weights import _LAYER_MAP

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, input_size, input_size, 3)), train=False))
    params = traverse_util.flatten_dict(variables["params"])
    stats = traverse_util.flatten_dict(variables["batch_stats"])
    inv = {v: k for k, v in _LAYER_MAP.items()}
    rng = np.random.default_rng(0)
    state = {}

    def put_convbn(flax_path, torch_prefix):
        k = params[flax_path + ("conv", "kernel")].shape      # (kh, kw, I, O)
        fan_in = k[0] * k[1] * k[2]
        state[f"{torch_prefix}.conv.weight"] = (
            rng.standard_normal((k[3], k[2], k[0], k[1])) / np.sqrt(fan_in)
        ).astype(np.float32)
        c = k[3]
        for tname in ("weight", "bias", "running_mean"):
            state[f"{torch_prefix}.bn.{tname}"] = rng.standard_normal(c).astype(np.float32)
        state[f"{torch_prefix}.bn.running_var"] = (
            np.abs(rng.standard_normal(c)) + 0.5).astype(np.float32)

    flax_modules = sorted({p[0] for p in params})
    for mod in flax_modules:
        if mod == "head":
            continue
        idx = inv[mod]
        sub = {p for p in params if p[0] == mod}
        if (mod, "conv", "kernel") in sub:
            put_convbn((mod,), f"model.{idx}")
        else:
            put_convbn((mod, "cv1"), f"model.{idx}.cv1")
            put_convbn((mod, "cv2"), f"model.{idx}.cv2")
            i = 0
            while (mod, f"m{i}", "cv1", "conv", "kernel") in params:
                put_convbn((mod, f"m{i}", "cv1"), f"model.{idx}.m.{i}.cv1")
                put_convbn((mod, f"m{i}", "cv2"), f"model.{idx}.m.{i}.cv2")
                i += 1
    for lvl in range(3):
        for branch, ours in (("cv2", "box"), ("cv3", "cls")):
            for j in range(2):
                put_convbn(("head", f"{ours}{lvl}_{j}"), f"model.22.{branch}.{lvl}.{j}")
            k = params[("head", f"{ours}{lvl}_2", "kernel")].shape
            state[f"model.22.{branch}.{lvl}.2.weight"] = rng.standard_normal(
                (k[3], k[2], k[0], k[1])).astype(np.float32)
            state[f"model.22.{branch}.{lvl}.2.bias"] = rng.standard_normal(k[3]).astype(np.float32)
    del stats
    return state


class TestWeightConversion:
    def test_roundtrip_shapes_and_values(self):
        from flax import traverse_util
        from rtmodt_tpu.models.weights import convert_ultralytics_state_dict
        from rtmodt_tpu.models.yolov8 import build_model

        model = build_model("yolov8n", num_classes=80)
        state = _fake_ultralytics_state(model)
        variables = convert_ultralytics_state_dict(state)

        # tree matches the model exactly
        ref = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))
        ref_flat = traverse_util.flatten_dict(ref, sep="/")
        got_flat = traverse_util.flatten_dict(variables, sep="/")
        assert set(ref_flat) == set(got_flat)
        for k in ref_flat:
            assert tuple(got_flat[k].shape) == tuple(ref_flat[k].shape), k

        # value mapping: stem conv kernel is the OIHW->HWIO transpose
        w_torch = state["model.0.conv.weight"]
        w_flax = np.asarray(variables["params"]["stem"]["conv"]["kernel"])
        np.testing.assert_array_equal(w_flax, np.transpose(w_torch, (2, 3, 1, 0)))
        # bn running stats land in batch_stats
        np.testing.assert_array_equal(
            np.asarray(variables["batch_stats"]["stem"]["bn"]["mean"]),
            state["model.0.bn.running_mean"])

    def test_converted_weights_run(self):
        from rtmodt_tpu.models.weights import convert_ultralytics_state_dict
        from rtmodt_tpu.models.yolov8 import build_model

        model = build_model("yolov8n", num_classes=80, dtype=jnp.float32)
        variables = convert_ultralytics_state_dict(_fake_ultralytics_state(model))
        variables = jax.tree.map(jnp.asarray, variables)
        box, cls = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
        assert np.isfinite(np.asarray(box)).all()

    def test_npz_roundtrip(self, tmp_path):
        from rtmodt_tpu.models import weights as W
        from rtmodt_tpu.models.yolov8 import build_model

        model = build_model("yolov8n", num_classes=4, dtype=jnp.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        path = str(tmp_path / "w.npz")
        W.save_npz(v, path)
        loaded = W.load_params(path, model, input_size=64)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(loaded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestDetectorAPI:
    @pytest.fixture(scope="class")
    def detector(self):
        from rtmodt_tpu.config.loader import DetectionConfig
        from rtmodt_tpu.detection.detector import Detector

        return Detector(DetectionConfig(
            model="yolov8n", input_size=64, conf_threshold=0.01,
            nms_candidates=16, max_detections=8, classes=None), warmup=False)

    def test_detect_returns_detections(self, detector):
        frame = np.random.default_rng(0).integers(0, 255, (100, 160, 3), np.uint8)
        d = detector.detect(frame)
        assert d.xyxy.dtype == np.float32
        assert d.class_id.dtype == np.int32
        assert len(d.xyxy) == len(d.confidence) == len(d.class_id)
        # boxes are in source-frame coordinates
        if len(d):
            assert (d.xyxy[:, [0, 2]] <= 160 + 1e-3).all()
            assert (d.xyxy[:, [1, 3]] <= 100 + 1e-3).all()

    def test_multiple_resolutions_compile_separately(self, detector):
        a = detector.detect(np.zeros((64, 64, 3), np.uint8))
        b = detector.detect(np.zeros((96, 64, 3), np.uint8))
        assert {(64, 64), (96, 64)} <= set(detector._jitted)
        del a, b
