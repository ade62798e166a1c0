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
