"""Build the native C++ components with g++ (no external build deps)."""

from __future__ import annotations

import os
import subprocess

from rtmodt_tpu.utils.logging import logger

_DIR = os.path.dirname(os.path.abspath(__file__))

_TARGETS = {
    "liblapjv.so": ["lapjv.cpp"],
    "libframepack.so": ["framepack.cpp"],
}


def build_all(force: bool = False) -> None:
    for out, sources in _TARGETS.items():
        out_path = os.path.join(_DIR, out)
        src_paths = [os.path.join(_DIR, s) for s in sources]
        if not force and os.path.exists(out_path) and all(
            os.path.getmtime(out_path) >= os.path.getmtime(s) for s in src_paths
        ):
            continue
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               *src_paths, "-o", out_path]
        logger.info("building native: " + " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)


if __name__ == "__main__":
    build_all(force=True)
