"""Stream failure-recovery tests (SURVEY.md 5.3): reconnect backoff,
give-up behavior, and counter reset - with a scripted fake VideoCapture."""

import time

import numpy as np
import pytest


class FakeCapture:
    """Scripted cv2.VideoCapture double: yields `good` frames, then fails
    `fail_grabs` times (simulating a dropped stream), then recovers."""

    # class-level script shared across reconnect-constructed instances
    script = {"opens": [], "instances": 0}

    def __init__(self, source, *a):
        FakeCapture.script["instances"] += 1
        self._open = FakeCapture.script["opens"].pop(0) if FakeCapture.script["opens"] else True
        self._grabs = 0

    def isOpened(self):
        return self._open

    def set(self, *a):
        return True

    def get(self, prop):
        return 30.0

    def grab(self):
        self._grabs += 1
        return self._grabs <= 3  # stream dies after 3 frames

    def retrieve(self):
        return True, np.zeros((48, 64, 3), np.uint8)

    def release(self):
        self._open = False


@pytest.fixture()
def fake_cv2(monkeypatch):
    import cv2

    FakeCapture.script = {"opens": [], "instances": 0}
    monkeypatch.setattr(cv2, "VideoCapture", FakeCapture)
    return FakeCapture


class TestReconnect:
    def test_reconnects_after_stream_loss(self, fake_cv2):
        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader

        # first open OK; after stream death, next reopen also OK
        fake_cv2.script["opens"] = [True, True, True]
        r = RTSPReader("rtsp://cam/1", reconnect_delay_sec=0.01, max_reconnects=5)
        with r:
            deadline = time.time() + 5.0
            seen = 0
            last = 0
            while time.time() < deadline and seen < 5:
                frame, fid, ts = r.read_new(last, timeout=0.5)
                if frame is not None:
                    last = fid
                    seen += 1
        # stream died after 3 grabs -> must have reconnected to reach >3 frames
        assert seen >= 4
        assert fake_cv2.script["instances"] >= 2

    def test_gives_up_after_max_reconnects(self, fake_cv2):
        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader

        # first open OK, every reconnect fails
        fake_cv2.script["opens"] = [True] + [False] * 20
        r = RTSPReader("rtsp://cam/1", reconnect_delay_sec=0.01, max_reconnects=2)
        with r:
            deadline = time.time() + 5.0
            while not r.is_eof and time.time() < deadline:
                time.sleep(0.05)
        assert r.is_eof  # reader gave up instead of spinning forever

    def test_open_failure_raises_immediately(self, fake_cv2):
        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader

        fake_cv2.script["opens"] = [False]
        with pytest.raises(ConnectionError):
            RTSPReader("rtsp://cam/1").start()
