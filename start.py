#!/usr/bin/env python
"""One-click launcher: verify imports, prepare samples, start the web UI.

Parity with reference ``start.py:27-134``: checks that the core modules
import, ensures the sample gallery exists (>= 3 images), frees the port if a
stale server holds it, and launches the web server on ``$PORT``
(default 8000; containers set 7860).
"""

from __future__ import annotations

import importlib
import os
import signal
import subprocess
import sys

CORE_MODULES = [
    "rtmodt_tpu.detection.detector",
    "rtmodt_tpu.tracking.tracker",
    "rtmodt_tpu.events.zone_engine",
    "rtmodt_tpu.ingestion.rtsp_reader",
    "rtmodt_tpu.visualization.renderer",
    "rtmodt_tpu.profiling.latency_profiler",
    "rtmodt_tpu.serving.server",
]


def check_imports() -> bool:
    ok = True
    for mod in CORE_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as e:
            print(f"[start] FAILED import {mod}: {e}")
            ok = False
    return ok


def ensure_samples() -> None:
    samples = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "web", "static", "samples")
    n = len([f for f in os.listdir(samples)]) if os.path.isdir(samples) else 0
    if n < 3:
        print("[start] populating sample gallery...")
        subprocess.run([sys.executable, "tools/download_samples.py"], check=False)


def free_port(port: int) -> None:
    """Kill a stale listener on the port (POSIX; reference does this for
    Windows via netstat/taskkill, start.py:27-43)."""
    try:
        out = subprocess.run(["fuser", f"{port}/tcp"], capture_output=True,
                             text=True, timeout=5)
        for pid in out.stdout.split():
            if pid.strip().isdigit() and int(pid) != os.getpid():
                print(f"[start] freeing port {port} (pid {pid})")
                os.kill(int(pid), signal.SIGTERM)
    except (FileNotFoundError, subprocess.TimeoutExpired, ProcessLookupError):
        pass


def main() -> None:
    print("=" * 60)
    print(" RTMODT-TPU - Real-Time Multi-Object Detection & Tracking")
    print("=" * 60)
    if not check_imports():
        print("[start] import check failed; fix the environment first")
        sys.exit(1)
    ensure_samples()
    port = int(os.environ.get("PORT", "8000"))
    free_port(port)
    print(f"[start] launching web UI on 0.0.0.0:{port}")
    from rtmodt_tpu.serving.server import app
    from rtmodt_tpu.serving.wsgi import run_server

    run_server(app, "0.0.0.0", port)


if __name__ == "__main__":
    main()
