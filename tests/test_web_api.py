"""Web API tests - superset of reference ``tests/test_web_api.py`` cases,
with the detector MOCKED (the reference's tests download and run the real
model; SURVEY.md 4 calls that out as the gap to close)."""

import io

import numpy as np
import pytest


def _jpeg_bytes(w=100, h=100, color=0):
    import cv2

    img = np.full((h, w, 3), color, np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


class FakeDetector:
    """Deterministic detector double: one fixed box per image."""

    class_names = ["person", "bicycle", "car"]

    def detect(self, img):
        from rtmodt_tpu.detection.detector import Detections

        h, w = img.shape[:2]
        return Detections(
            np.array([[w * 0.1, h * 0.1, w * 0.5, h * 0.6]], np.float32),
            np.array([0.87], np.float32),
            np.array([0], np.int32),
            self.class_names,
        )


@pytest.fixture()
def client(tmp_path, monkeypatch):
    import rtmodt_tpu.serving.server as srv
    from rtmodt_tpu.serving.wsgi import TestClient

    # isolate static/samples into a temp dir
    web_dir = tmp_path / "web"
    (web_dir / "static" / "samples").mkdir(parents=True)
    (web_dir / "index.html").write_text("<html><body>RTMODT-TPU demo</body></html>")
    (web_dir / "static" / "app.js").write_text("// app")
    monkeypatch.setattr(srv, "WEB_DIR", web_dir)
    monkeypatch.setattr(srv, "STATIC_DIR", web_dir / "static")
    monkeypatch.setattr(srv, "SAMPLES_DIR", web_dir / "static" / "samples")
    srv._singleton.set(FakeDetector())
    return TestClient(srv.create_app())


class TestRealSocketServer:
    def test_serves_over_tcp(self, client):
        """The stdlib WSGI server must actually serve over a real socket
        (TestClient bypasses it)."""
        import json
        import threading
        import urllib.request
        from wsgiref.simple_server import make_server

        import rtmodt_tpu.serving.server as srv
        from rtmodt_tpu.serving.wsgi import _QuietHandler, _ThreadingWSGIServer

        app = srv.create_app()
        httpd = make_server("127.0.0.1", 0, app,
                            server_class=_ThreadingWSGIServer,
                            handler_class=_QuietHandler)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/samples", timeout=5) as r:
                assert r.status == 200
                assert json.loads(r.read()) == {"samples": []}
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=5) as r:
                assert "RTMODT" in r.read().decode()
        finally:
            httpd.shutdown()


class TestHealthAndStatic:
    def test_index(self, client):
        r = client.get("/")
        assert r.status_code == 200
        assert "RTMODT" in r.text

    def test_static_file(self, client):
        r = client.get("/static/app.js")
        assert r.status_code == 200
        assert "app" in r.text

    def test_static_missing_404(self, client):
        assert client.get("/static/nope.js").status_code == 404

    def test_health(self, client):
        r = client.get("/api/health")
        assert r.status_code == 200
        assert r.json()["status"] == "ok"

    def test_samples_empty_list(self, client):
        r = client.get("/api/samples")
        assert r.status_code == 200
        assert r.json() == {"samples": []}


class TestDetectionAPI:
    def _check_schema(self, data):
        # exact reference response contract (web/server.py:109-115)
        assert set(data) == {"detections", "tracks", "inference_ms",
                             "num_objects", "image_size"}
        assert data["tracks"] == []
        assert data["num_objects"] == len(data["detections"])
        for d in data["detections"]:
            assert set(d) == {"bbox", "confidence", "class_id", "class_name"}
            assert len(d["bbox"]) == 4

    def test_upload_image(self, client):
        r = client.post("/api/detect/image",
                        files={"file": ("t.jpg", _jpeg_bytes(), "image/jpeg")})
        assert r.status_code == 200
        data = r.json()
        self._check_schema(data)
        assert data["image_size"] == [100, 100]
        assert data["detections"][0]["class_name"] == "person"

    def test_upload_bad_image_400(self, client):
        r = client.post("/api/detect/image",
                        files={"file": ("t.jpg", b"not an image", "image/jpeg")})
        assert r.status_code == 400

    def test_upload_missing_field_400(self, client):
        r = client.post("/api/detect/image",
                        files={"other": ("t.jpg", _jpeg_bytes(), "image/jpeg")})
        assert r.status_code == 400

    def test_frame_base64_with_data_url_prefix(self, client):
        import base64

        payload = {"image": "data:image/jpeg;base64," +
                   base64.b64encode(_jpeg_bytes(64, 48)).decode()}
        r = client.post("/api/detect/frame", json_body=payload)
        assert r.status_code == 200
        data = r.json()
        self._check_schema(data)
        assert data["image_size"] == [64, 48]

    def test_frame_bad_base64_400(self, client):
        r = client.post("/api/detect/frame", json_body={"image": "!!!notb64!!!"})
        assert r.status_code == 400

    def test_frame_bad_json_400(self, client):
        from rtmodt_tpu.serving.wsgi import TestClient

        r = client._call("POST", "/api/detect/frame", b"{invalid", "application/json")
        assert r.status_code == 400

    def test_sample_detection(self, client, tmp_path):
        import rtmodt_tpu.serving.server as srv

        (srv.SAMPLES_DIR / "street_scene.jpg").write_bytes(_jpeg_bytes(120, 80))
        r = client.get("/api/samples")
        assert r.json()["samples"][0] == {
            "name": "Street Scene",
            "filename": "street_scene.jpg",
            "url": "/static/samples/street_scene.jpg",
        }
        r = client.get("/api/detect/sample/street_scene.jpg")
        assert r.status_code == 200
        self._check_schema(r.json())

    def test_sample_missing_404(self, client):
        r = client.get("/api/detect/sample/ghost.jpg")
        assert r.status_code == 404

    def test_method_not_allowed(self, client):
        assert client.post("/api/samples").status_code == 405

    def test_session_tracking_populates_tracks(self, client):
        """With a session_id, repeated frames yield persistent-ID tracks -
        a real extension over the reference (its tracks are always [])."""
        import base64

        payload = {"image": base64.b64encode(_jpeg_bytes(100, 100)).decode(),
                   "session_id": "test-sess-1"}
        ids = []
        for _ in range(3):
            r = client.post("/api/detect/frame", json_body=payload)
            assert r.status_code == 200
            data = r.json()
            assert len(data["tracks"]) == 1
            t = data["tracks"][0]
            assert set(t) == {"track_id", "bbox", "confidence", "class_id",
                              "class_name", "age", "trail"}
            ids.append(t["track_id"])
        assert len(set(ids)) == 1          # ID persists across requests
        assert data["tracks"][0]["age"] == 3

    def test_session_algorithm_selection(self, client):
        """The frame payload's ``algorithm`` picks the session tracker;
        switching algorithms restarts the session (fresh ids); bad values
        are a 400 (tracker choice on the demo surface - the reference has
        no tracker there at all)."""
        import base64

        img = base64.b64encode(_jpeg_bytes(100, 100)).decode()
        payload = {"image": img, "session_id": "algo-sess",
                   "algorithm": "ocsort"}
        ages = []
        for _ in range(3):
            r = client.post("/api/detect/frame", json_body=payload)
            assert r.status_code == 200
            tracks = r.json()["tracks"]
            if tracks:
                ages.append(tracks[0]["age"])
        assert ages and ages[-1] >= 2        # same ocsort session advanced
        # switching algorithm restarts the session: age resets
        r = client.post("/api/detect/frame",
                        json_body={**payload, "algorithm": "bytetrack"})
        assert r.status_code == 200
        assert r.json()["tracks"][0]["age"] == 1
        r = client.post("/api/detect/frame",
                        json_body={**payload, "algorithm": "sortx"})
        assert r.status_code == 400

    def test_omitted_algorithm_keeps_session(self, client):
        """A frame WITHOUT the algorithm field must not reset an existing
        non-default session (omission means 'keep', not 'bytetrack')."""
        import base64

        img = base64.b64encode(_jpeg_bytes(100, 100)).decode()
        sid = "keep-sess"
        for _ in range(3):
            r = client.post("/api/detect/frame",
                            json_body={"image": img, "session_id": sid,
                                       "algorithm": "ocsort"})
            assert r.status_code == 200
        # omit the field: the ocsort session (and its ages) must survive
        r = client.post("/api/detect/frame",
                        json_body={"image": img, "session_id": sid})
        assert r.status_code == 200
        assert r.json()["tracks"][0]["age"] == 4

    def test_session_zones_fire_live_alerts(self, client):
        """Webcam frames with a session_id + zones get wall-clock intrusion
        alerts per frame; cooldown suppresses repeats; clearing zones stops
        alerts; zone changes take effect mid-session."""
        import base64

        img = base64.b64encode(_jpeg_bytes(100, 100)).decode()
        zones = [{"name": "gate", "polygon": [[0, 0], [100, 0], [100, 100], [0, 100]],
                  "cooldown_sec": 3600}]
        payload = {"image": img, "session_id": "zone-sess", "zones": zones}
        r = client.post("/api/detect/frame", json_body=payload)
        assert r.status_code == 200
        data = r.json()
        assert data["zones"][0]["name"] == "gate"
        assert len(data["events"]) == 1
        assert data["events"][0]["event_type"] == "intrusion"
        # same zones again: engine persists, cooldown suppresses a repeat
        r = client.post("/api/detect/frame", json_body=payload)
        assert r.json()["events"] == []
        # zones removed: alerts stop, response reverts to the base schema
        r = client.post("/api/detect/frame",
                        json_body={"image": img, "session_id": "zone-sess"})
        data = r.json()
        assert "events" not in data and "zones" not in data
        assert len(data["tracks"]) == 1    # tracker state survived

    def test_session_zone_validation(self, client):
        import base64

        img = base64.b64encode(_jpeg_bytes()).decode()
        r = client.post("/api/detect/frame",
                        json_body={"image": img, "zones": [{"polygon": [[0, 0]]}]})
        assert r.status_code == 400        # zones without session_id
        r = client.post("/api/detect/frame",
                        json_body={"image": img, "session_id": "s",
                                   "zones": [{"polygon": [[0, 0]]}]})
        assert r.status_code == 400        # bad polygon
        poly = [[0, 0], [100, 0], [100, 100], [0, 100]]
        for bad in ({"polygon": poly, "dwell_time_sec": None},
                    {"polygon": poly, "dwell_time_sec": "abc"},
                    {"polygon": poly, "cooldown_sec": float("nan")},
                    {"polygon": [[float("inf"), 0], [9, 0], [9, 9]]}):
            r = client.post("/api/detect/frame",
                            json_body={"image": img, "session_id": "s",
                                       "zones": [bad]})
            assert r.status_code == 400, bad   # 400, never a 500 traceback

    def test_invalid_zones_do_not_clobber_live_engine(self, client):
        """A rejected zones payload must leave the session's previous engine
        (and its cooldown state) intact, and keep failing on retry rather
        than matching a stored signature."""
        import base64

        img = base64.b64encode(_jpeg_bytes(100, 100)).decode()
        zones = [{"name": "gate", "polygon": [[0, 0], [100, 0], [100, 100], [0, 100]],
                  "cooldown_sec": 3600}]
        sid = "clobber-sess"
        r = client.post("/api/detect/frame",
                        json_body={"image": img, "session_id": sid, "zones": zones})
        assert len(r.json()["events"]) == 1          # armed + fired
        bad = {"image": img, "session_id": sid,
               "zones": [{"polygon": [[0, 0]]}]}
        assert client.post("/api/detect/frame", json_body=bad).status_code == 400
        assert client.post("/api/detect/frame", json_body=bad).status_code == 400
        # original zones again: the surviving engine is still in cooldown -
        # a clobbered engine would have been rebuilt and fired a second time
        r = client.post("/api/detect/frame",
                        json_body={"image": img, "session_id": sid, "zones": zones})
        assert r.status_code == 200
        assert r.json()["events"] == []

    def test_no_session_keeps_reference_contract(self, client):
        import base64

        payload = {"image": base64.b64encode(_jpeg_bytes()).decode()}
        r = client.post("/api/detect/frame", json_body=payload)
        assert r.json()["tracks"] == []


class TestMultipartParser:
    def test_binary_content_with_trailing_crlf_preserved(self):
        """Payload bytes ending in CR/LF must survive parsing byte-exact -
        a naive strip() truncated binary uploads ending in 0x0A/0x0D."""
        from rtmodt_tpu.serving.wsgi import Request

        payload = b"\x00\x01binary\r\n\r\n\n\r\n"       # hostile tail
        body = (b"--B\r\n"
                b'Content-Disposition: form-data; name="file"; filename="x.bin"\r\n'
                b"Content-Type: application/octet-stream\r\n\r\n"
                + payload + b"\r\n--B--\r\n")
        req = Request({"REQUEST_METHOD": "POST", "PATH_INFO": "/x",
                       "CONTENT_TYPE": "multipart/form-data; boundary=B",
                       "CONTENT_LENGTH": str(len(body)),
                       "wsgi.input": io.BytesIO(body)})
        files = req.files()
        assert files["file"] == ("x.bin", payload)

    def test_filename_before_name_header_order(self):
        """Clients may emit filename= before name= - the field key must
        still be the name parameter, not the filename."""
        from rtmodt_tpu.serving.wsgi import Request

        body = (b"--B\r\n"
                b'Content-Disposition: form-data; filename="a.mp4"; name="file"\r\n'
                b"\r\ncontent\r\n--B--\r\n")
        req = Request({"REQUEST_METHOD": "POST", "PATH_INFO": "/x",
                       "CONTENT_TYPE": "multipart/form-data; boundary=B",
                       "CONTENT_LENGTH": str(len(body)),
                       "wsgi.input": io.BytesIO(body)})
        assert req.files() == {"file": ("a.mp4", b"content")}

    def test_cors_preflight_options(self, client):
        r = client._call("OPTIONS", "/api/detect/frame")
        assert r.status_code == 204
        assert "POST" in r.headers.get("Access-Control-Allow-Methods", "")


class TestVideoTracking:
    """POST /api/track/video - server-side detect+track over a clip (the
    reference SPA only grabs one frame from uploaded videos)."""

    def _mp4_bytes(self, tmp_path, frames=8):
        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        p = tmp_path / "clip.mp4"
        write_synthetic_video(str(p), frames=frames, h=96, w=96, n_objects=1)
        return p.read_bytes()

    def test_track_video_persistent_ids(self, client, tmp_path):
        content = self._mp4_bytes(tmp_path)
        r = client.post("/api/track/video",
                        files={"file": ("clip.mp4", content, "video/mp4")})
        assert r.status_code == 200
        data = r.json()
        assert data["num_frames"] == 8
        assert data["num_tracks"] == 1      # FakeDetector: one steady box
        ids = {t["track_id"] for f in data["frames"] for t in f["tracks"]}
        assert len(ids) == 1                # persistent ID across the clip
        assert data["frames"][0]["frame_id"] == 1
        assert data["image_size"] == [96, 96]
        assert data["processing_fps"] > 0

    def test_track_video_algorithm_param(self, client, tmp_path):
        """?algorithm= runs the clip through the chosen tracker; bad values
        are a 400 before any decode work."""
        content = self._mp4_bytes(tmp_path)
        r = client.post("/api/track/video?algorithm=botsort",
                        files={"file": ("clip.mp4", content, "video/mp4")})
        assert r.status_code == 200
        data = r.json()
        assert data["num_frames"] == 8
        ids = {t["track_id"] for f in data["frames"] for t in f["tracks"]}
        assert len(ids) == 1                # persistent ID under botsort too
        r = client.post("/api/track/video?algorithm=nope",
                        files={"file": ("clip.mp4", content, "video/mp4")})
        assert r.status_code == 400

    def test_track_video_stride_and_cap(self, client, tmp_path):
        content = self._mp4_bytes(tmp_path, frames=10)
        r = client.post("/api/track/video?max_frames=3&stride=2",
                        files={"file": ("clip.mp4", content, "video/mp4")})
        assert r.status_code == 200
        data = r.json()
        assert data["num_frames"] == 3
        assert [f["frame_id"] for f in data["frames"]] == [1, 3, 5]
        # max_frames clamps below to 1 - never a bogus "could not decode"
        r = client.post("/api/track/video?max_frames=0",
                        files={"file": ("clip.mp4", content, "video/mp4")})
        assert r.status_code == 200
        assert r.json()["num_frames"] == 1

    def test_track_video_bad_payload_400(self, client):
        r = client.post("/api/track/video",
                        files={"file": ("x.mp4", b"not a video", "video/mp4")})
        assert r.status_code == 400
        r = client.post("/api/track/video", json_body={"nope": 1})
        assert r.status_code == 400

    def test_track_video_with_zones_fires_events(self, client, tmp_path):
        """A ``zones`` multipart field runs the zone-event engine over the
        clip on stream time (ref zone_engine.py:64-157 semantics; JSONL
        schema keys per zone_engine.py:29-45)."""
        import json

        content = self._mp4_bytes(tmp_path)
        zones = [{"name": "lobby", "polygon": [[0, 0], [96, 0], [96, 96], [0, 96]]}]
        r = client.post("/api/track/video",
                        files={"file": ("clip.mp4", content, "video/mp4"),
                               "zones": ("", json.dumps(zones).encode(), "")})
        assert r.status_code == 200
        data = r.json()
        assert data["zones"] == [{"name": "lobby",
                                  "polygon": [[0, 0], [96, 0], [96, 96], [0, 96]]}]
        # FakeDetector's steady box sits inside the whole-frame zone; dwell
        # defaults to 0 (fire on entry) and cooldown 2 s > clip length, so
        # exactly one intrusion event fires for the one persistent track
        assert len(data["events"]) == 1
        ev = data["events"][0]
        for key in ("timestamp_utc", "event_type", "zone_name", "track_id",
                    "class_id", "class_name", "dwell_time_sec", "bbox_xyxy",
                    "centroid", "frame_id", "metadata"):
            assert key in ev
        assert ev["zone_name"] == "lobby"
        assert ev["event_type"] == "intrusion"
        assert ev["frame_id"] >= 1 and ev["track_id"] == 1
        # zone analytics ride along: one persistent track entered once
        assert data["zone_counts"] == {
            "lobby": {"entries": 1, "unique_tracks": 1, "current": 1}}

    def test_track_video_zone_misses_outside_polygon(self, client, tmp_path):
        """A zone that excludes the detector's centroid fires nothing."""
        import json

        content = self._mp4_bytes(tmp_path)
        zones = [{"name": "corner", "polygon": [[80, 80], [95, 80], [95, 95], [80, 95]]}]
        r = client.post("/api/track/video",
                        files={"file": ("clip.mp4", content, "video/mp4"),
                               "zones": ("", json.dumps(zones).encode(), "")})
        assert r.status_code == 200
        assert r.json()["events"] == []

    def test_track_video_zones_validation_400(self, client, tmp_path):
        import json

        content = self._mp4_bytes(tmp_path)
        bad = [
            b"not json",
            json.dumps([]).encode(),
            json.dumps([{"polygon": [[0, 0], [1, 1]]}]).encode(),      # 2 pts
            json.dumps([{"polygon": "nope"}]).encode(),
            json.dumps([{"polygon": [[0, 0], [9, 0], [9, 9]],
                         "trigger": "teleport"}]).encode(),
            json.dumps([{"polygon": [[0, 0], [9, 0], [9, 9]]}] * 9).encode(),
            json.dumps([{"name": "gate", "polygon": [[0, 0], [9, 0], [9, 9]]},
                        {"name": "gate",                     # duplicate name
                         "polygon": [[20, 20], [29, 20], [29, 29]]}]).encode(),
        ]
        for payload in bad:
            r = client.post("/api/track/video",
                            files={"file": ("clip.mp4", content, "video/mp4"),
                                   "zones": ("", payload, "")})
            assert r.status_code == 400, payload


class TestMjpegStreaming:
    """GET /api/stream/demo and POST /api/stream/video - long-lived
    multipart/x-mixed-replace MJPEG streams (serving extension; the
    reference SPA polls single frames, web/static/app.js)."""

    BOUNDARY = b"--rtmodtframe"

    def _parts(self, content: bytes) -> list[bytes]:
        """Split an MJPEG body into JPEG payloads, asserting framing."""
        assert content.endswith(self.BOUNDARY + b"--\r\n")
        payloads = []
        for piece in content.split(self.BOUNDARY)[1:]:
            if piece.startswith(b"--"):
                continue
            head, body = piece.split(b"\r\n\r\n", 1)
            assert b"Content-Type: image/jpeg" in head
            n = int(head.split(b"Content-Length: ")[1].split(b"\r\n")[0])
            payloads.append(body[:n])
            assert body[n:] == b"\r\n"
        return payloads

    def test_stream_demo_parts(self, client):
        import cv2
        import numpy as np

        r = client.get("/api/stream/demo?seconds=0.1&fps=30&objects=3")
        assert r.status_code == 200
        assert r.headers["Content-Type"] == \
            "multipart/x-mixed-replace; boundary=rtmodtframe"
        assert "Content-Length" not in r.headers
        parts = self._parts(r.content)
        assert len(parts) == 3                       # int(0.1 s * 30 fps)
        for jpg in parts:
            img = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
            assert img is not None and img.shape == (480, 640, 3)

    def test_stream_demo_bad_params_400(self, client):
        assert client.get("/api/stream/demo?algorithm=nope").status_code == 400
        assert client.get("/api/stream/demo?fps=abc").status_code == 400

    def test_stream_demo_nonfinite_params_400(self, client):
        # NaN survives min/max clamping; must be rejected before the 200
        # status line is committed (mid-stream aborts can't change it)
        for bad in ("nan", "inf", "-inf"):
            assert client.get(
                f"/api/stream/demo?seconds={bad}").status_code == 400
            assert client.get(
                f"/api/stream/demo?objects={bad}").status_code == 400

    def test_stream_video_annotated(self, client, tmp_path):
        import cv2
        import numpy as np

        from rtmodt_tpu.utils.synthetic import write_synthetic_video

        p = tmp_path / "clip.mp4"
        write_synthetic_video(str(p), frames=8, h=96, w=96, n_objects=1)
        r = client.post("/api/stream/video?max_frames=5&stride=2",
                        files={"file": ("clip.mp4", p.read_bytes(), "video/mp4")})
        assert r.status_code == 200
        assert r.headers["Content-Type"].startswith("multipart/x-mixed-replace")
        parts = self._parts(r.content)
        assert len(parts) == 4                       # frames 1,3,5,7 of 8
        for jpg in parts:
            img = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
            assert img is not None and img.shape == (96, 96, 3)
        # annotation actually drew on the frame: FakeDetector's box region
        # differs from the raw synthetic frame
        assert len(parts[0]) != len(parts[1]) or parts[0] != parts[1]

    def test_stream_video_bad_payload_400(self, client):
        r = client.post("/api/stream/video",
                        files={"file": ("x.mp4", b"not a video", "video/mp4")})
        assert r.status_code == 400          # validated BEFORE streaming
        r = client.post("/api/stream/video")
        assert r.status_code == 400
