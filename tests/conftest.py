"""Test harness config: force JAX onto a virtual 8-device CPU platform.

This is the standard JAX trick for exercising pjit/shard_map sharding logic
without real TPU hardware (SURVEY.md 4).  NOTE: in this environment the
remote-TPU (axon) plugin overrides the ``JAX_PLATFORMS`` env var, so the
platform must ALSO be pinned via ``jax.config`` before first backend use -
otherwise every test compiles through the TPU tunnel.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the AOT program cache (runtime/aot_cache.py) adds an export/serialize pass
# on miss; tests exercise it explicitly in test_aot_cache.py and keep every
# other program on the plain jit path for determinism and speed
os.environ.setdefault("RTMODT_AOT_CACHE_DISABLE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run against the TPU tunnel"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_boxes(rng, n, w=1280, h=720, min_size=10, max_size=200):
    x1 = rng.uniform(0, w - max_size, n)
    y1 = rng.uniform(0, h - max_size, n)
    bw = rng.uniform(min_size, max_size, n)
    bh = rng.uniform(min_size, max_size, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], axis=1).astype(np.float32)
