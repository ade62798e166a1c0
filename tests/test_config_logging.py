"""Config-system and logging-facade tests."""

import os

import pytest


class TestConfig:
    def test_default_loads_and_validates(self):
        from rtmodt_tpu.config import load_config

        cfg = load_config()
        assert cfg.detection.model == "yolov8s"
        assert cfg.detection.input_size == 640
        assert cfg.tracking.bytetrack.track_thresh == 0.5
        assert len(cfg.events.zones) == 2
        assert cfg.events.zones[0].trigger == "intrusion"
        assert cfg.events.zones[1].direction == "left_to_right"

    def test_overrides_merge(self):
        from rtmodt_tpu.config import load_config

        cfg = load_config(overrides={"detection": {"model": "yolov8n"},
                                     "ingestion": {"source": "rtsp://cam/1"}})
        assert cfg.detection.model == "yolov8n"
        assert cfg.ingestion.source == "rtsp://cam/1"
        assert cfg.detection.input_size == 640  # untouched defaults survive

    def test_unknown_key_rejected(self):
        from rtmodt_tpu.config import load_config

        with pytest.raises(KeyError, match="unknown config key"):
            load_config(overrides={"detection": {"modle": "typo"}})

    def test_value_validation(self):
        from rtmodt_tpu.config import load_config

        with pytest.raises(ValueError, match="conf_threshold"):
            load_config(overrides={"detection": {"conf_threshold": 3.0}})
        with pytest.raises(ValueError, match="multiple of 32"):
            load_config(overrides={"detection": {"input_size": 633}})
        with pytest.raises(ValueError, match="polygon"):
            load_config(overrides={"events": {"zones": [
                {"name": "bad", "polygon": [[0, 0], [1, 1]]}]}})

    def test_bad_tracker_options(self):
        from rtmodt_tpu.config import load_config

        with pytest.raises(ValueError, match="motion_model"):
            load_config(overrides={"tracking": {"bytetrack": {"motion_model": "magic"}}})

    def test_x6_transport_rejected_for_appearance_trackers(self):
        """Pinned transport=x6 with an appearance tracker must fail at
        load, not crash at trace time: the x6 space-to-depth layout does
        not carry the Y/U/V planes the ROI embedding crops need (ADVICE
        round 4).  packed (auto) stays valid - it degrades to planes."""
        from rtmodt_tpu.config import load_config

        for algo in ("deepsort", "botsort"):
            with pytest.raises(ValueError, match="appearance"):
                load_config(overrides={
                    "parallel": {"transport": "x6"},
                    "tracking": {"algorithm": algo}})
        cfg = load_config(overrides={
            "parallel": {"transport": "packed"},
            "tracking": {"algorithm": "botsort"}})
        assert cfg.parallel.transport == "packed"

    def test_classes_range_validated(self):
        """Out-of-range class ids fail at load with the field named -
        negative ids used to silently wrap (classes: [-1] kept class 79)
        and ids >= num_classes crashed later with a bare IndexError."""
        from rtmodt_tpu.config import load_config

        with pytest.raises(ValueError, match="detection.classes"):
            load_config(overrides={"detection": {"classes": [-1]}})
        with pytest.raises(ValueError, match="detection.classes"):
            load_config(overrides={"detection": {"classes": [0, 80]}})
        cfg = load_config(overrides={"detection": {"classes": [0, 79]}})
        assert cfg.detection.classes == [0, 79]

    def test_reference_key_aliases(self, tmp_path):
        """A config written with the REFERENCE's key names loads unmodified
        (its default.yaml surface: confidence_threshold, model_path,
        max_reconnect_attempts, {width,height} resolution, show_fps...)."""
        import yaml

        from rtmodt_tpu.config import load_config

        ref_style = {
            "detection": {"confidence_threshold": 0.4,
                          "nms_iou_threshold": 0.6,
                          "model_path": "models/yolov8s.engine",
                          "fallback_model": "models/yolov8s.pt"},
            "ingestion": {"max_reconnect_attempts": 7,
                          "drop_stale_frames": True,
                          "resolution": {"width": 1280, "height": 720}},
            "profiling": {"gpu_sync": True, "log_interval_frames": 50},
            "system": {"num_workers": 4},
            "visualization": {"show_fps": False, "show_ids": False,
                              "codec": "XVID", "window_name": "ref"},
        }
        p = tmp_path / "ref.yaml"
        p.write_text(yaml.safe_dump(ref_style))
        cfg = load_config(str(p))
        assert cfg.detection.conf_threshold == 0.4
        assert cfg.detection.iou_threshold == 0.6
        assert cfg.detection.weights == "models/yolov8s.engine"
        assert cfg.detection.fallback_weights == "models/yolov8s.pt"
        assert cfg.ingestion.max_reconnects == 7
        assert cfg.ingestion.resolution == [1280, 720]
        assert cfg.profiling.log_interval == 50
        assert cfg.visualization.show_hud is False
        assert cfg.visualization.show_labels is False
        assert cfg.visualization.codec == "XVID"
        assert cfg.visualization.window_name == "ref"

    def test_empty_sections_load(self, tmp_path):
        """A bare section header ('ingestion:' with no keys) parses as None
        and must still load with defaults (regression: the alias layer
        crashed on None sections)."""
        from rtmodt_tpu.config import load_config

        p = tmp_path / "empty.yaml"
        p.write_text("ingestion:\ndetection:\nvisualization:\n")
        cfg = load_config(str(p))
        assert cfg.detection.input_size == 640

    def test_alert_backend_validation(self):
        from rtmodt_tpu.config import load_config

        with pytest.raises(ValueError, match="mqtt_host"):
            load_config(overrides={"events": {"alert": {"backend": "mqtt"}}})
        with pytest.raises(ValueError, match="webhook_url"):
            load_config(overrides={"events": {"alert": {"backend": "webhook"}}})
        with pytest.raises(ValueError, match="backend"):
            load_config(overrides={"events": {"alert": {"backend": "carrier_pigeon"}}})

    def test_reference_default_yaml_loads(self):
        """The reference repo's own config/default.yaml parses end-to-end
        through the alias layer (migration: reuse existing configs as-is)."""
        import pytest as _p

        ref = "/root/reference/config/default.yaml"
        if not os.path.exists(ref):
            _p.skip("reference checkout not present")
        from rtmodt_tpu.config import load_config

        cfg = load_config(ref)
        assert cfg.detection.conf_threshold == 0.35
        assert len(cfg.events.zones) >= 1


class TestLogging:
    def test_file_sink_and_remove(self, tmp_path):
        from rtmodt_tpu.utils.logging import logger

        path = str(tmp_path / "t.log")
        hid = logger.add(path, level="INFO")
        logger.info("hello {}", "world")
        logger.remove(hid)
        with open(path) as f:
            content = f.read()
        assert "hello world" in content

    def test_declarative_yaml(self, tmp_path):
        import yaml
        from rtmodt_tpu.utils.logging import configure_from_yaml, logger

        log_file = tmp_path / "out.log"
        spec = {"console": {"enabled": False},
                "file": {"enabled": True, "path": str(log_file),
                         "level": "DEBUG", "rotation": "1 MB"},
                "jsonl": {"enabled": False}}
        p = tmp_path / "logging.yaml"
        p.write_text(yaml.safe_dump(spec))
        configure_from_yaml(str(p))
        logger.debug("declarative sink works")
        assert "declarative sink works" in log_file.read_text()
        # restore default console sink for other tests
        logger.remove()
        import sys
        logger.add(sys.stderr, level="INFO")

    def test_rotation_parse(self):
        from rtmodt_tpu.utils.logging import _parse_rotation

        assert _parse_rotation("10 MB") == 10 * 1024**2
        assert _parse_rotation("512KB") == 512 * 1024
        assert _parse_rotation(None) == 0
