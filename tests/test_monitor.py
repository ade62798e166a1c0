"""LiveMonitor - headless MJPEG live view of a running pipeline.

The reference's only live view is a local cv2 window
(``tools/run_pipeline.py:119-166`` ``--display``); the monitor serves the
same annotated frames over HTTP for headless TPU hosts."""

import threading
import time
import urllib.request

import numpy as np
import pytest


@pytest.fixture()
def monitor():
    from rtmodt_tpu.serving.monitor import LiveMonitor

    m = LiveMonitor(port=0, host="127.0.0.1", max_fps=1000.0)
    yield m
    m.close()


def _frame(val: int) -> np.ndarray:
    f = np.full((48, 64, 3), val, np.uint8)
    f[:8, :8] = 255 - val            # corner marker: frames differ
    return f


def _publish_until(monitor, stop: threading.Event):
    i = 0
    while not stop.is_set():
        monitor.publish(_frame(i % 200))
        i += 1
        time.sleep(0.005)


class TestLiveMonitor:
    def test_single_frame_endpoint(self, monitor):
        # no frame yet -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"http://127.0.0.1:{monitor.port}/frame", timeout=5)
        assert e.value.code == 404
        # a poll-only client (no /stream connection holding a viewer slot)
        # gets the latest published frame - publish stores unconditionally
        monitor.publish(_frame(3))
        with urllib.request.urlopen(
                f"http://127.0.0.1:{monitor.port}/frame", timeout=5) as r:
            body = r.read()
        assert r.headers["Content-Type"] == "image/jpeg"
        import cv2

        img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
        assert img is not None and img.shape == (48, 64, 3)

    def test_index_page(self, monitor):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{monitor.port}/", timeout=5) as r:
            body = r.read().decode()
        assert "/stream" in body

    def test_stream_yields_distinct_frames(self, monitor):
        stop = threading.Event()
        pub = threading.Thread(target=_publish_until, args=(monitor, stop),
                               daemon=True)
        pub.start()
        try:
            req = urllib.request.urlopen(
                f"http://127.0.0.1:{monitor.port}/stream", timeout=10)
            assert req.status == 200
            assert req.headers["Content-Type"].startswith(
                "multipart/x-mixed-replace")
            # read until two JPEG parts arrive
            buf = b""
            deadline = time.monotonic() + 10.0
            while buf.count(b"\xff\xd8\xff") < 2:
                assert time.monotonic() < deadline, "stream produced <2 frames"
                chunk = req.read1(65536)
                assert chunk, "stream ended early"
                buf += chunk
            req.close()
        finally:
            stop.set()
            pub.join(timeout=5)
        import cv2

        parts = [p for p in buf.split(b"--rtmodtlive") if b"image/jpeg" in p]
        imgs = []
        for p in parts[:2]:
            head, body = p.split(b"\r\n\r\n", 1)
            n = int(head.split(b"Content-Length: ")[1].split(b"\r\n")[0])
            img = cv2.imdecode(np.frombuffer(body[:n], np.uint8),
                               cv2.IMREAD_COLOR)
            assert img is not None and img.shape == (48, 64, 3)
            imgs.append(img)
        # latest-wins buffer: consecutive parts show different frames
        assert not np.array_equal(imgs[0], imgs[1])

    def test_publish_without_viewers_stores_latest_only(self, monitor):
        """Headless publish stores (one copy) but never JPEG-encodes: the
        encode cache stays empty until a viewer actually requests."""
        for i in range(10):
            monitor.publish(_frame(i))
        assert monitor._seq == 10
        assert monitor._frame is not None and monitor._jpeg is None

    def test_close_unblocks_viewer(self, monitor):
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{monitor.port}/stream", timeout=10)
        t0 = time.monotonic()
        threading.Timer(0.3, monitor.close).start()
        data = req.read()              # must not hang: close ends the stream
        assert time.monotonic() - t0 < 8.0
        assert data.endswith(b"--rtmodtlive--\r\n")


class TestConfigValidation:
    def test_mjpeg_port_validated(self):
        from rtmodt_tpu.config import load_config

        cfg = load_config(overrides={"visualization": {"mjpeg_port": 0}})
        assert cfg.visualization.mjpeg_port == 0
        with pytest.raises(ValueError, match="mjpeg_port"):
            load_config(overrides={"visualization": {"mjpeg_port": 70000}})
        with pytest.raises(ValueError, match="mjpeg_port"):
            load_config(overrides={"visualization": {"mjpeg_port": "x"}})
