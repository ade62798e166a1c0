"""AOT program cache (runtime/aot_cache.py): store/hit round trip, fallback."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtmodt_tpu.ops.nms import NMSResult
from rtmodt_tpu.runtime import aot_cache


@pytest.fixture
def aot_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("RTMODT_AOT_CACHE", str(tmp_path))
    monkeypatch.delenv("RTMODT_AOT_CACHE_DISABLE", raising=False)
    return tmp_path


def _build():
    @jax.jit
    def fn(x, y):
        return NMSResult(boxes=x * 2.0, scores=y + 1.0,
                         classes=jnp.zeros_like(y, jnp.int32),
                         valid=y > 0.5, count=jnp.sum(y > 0.5))

    return fn


def _args():
    return (jnp.ones((4, 4), jnp.float32), jnp.full((4,), 0.75, jnp.float32))


def test_store_then_hit(aot_dir):
    key = ("test_prog", 4)
    fn1 = aot_cache.aot_cached(key, _build, _args)
    out1 = fn1(*_args())
    blobs = list(aot_dir.glob("*.jaxexport"))
    assert len(blobs) == 1 and blobs[0].stat().st_size > 0

    fn2 = aot_cache.aot_cached(key, lambda: pytest.fail("must not rebuild"),
                               _args)
    out2 = fn2(*_args())
    assert isinstance(out2, NMSResult)
    for a, b in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distinct_keys_distinct_blobs(aot_dir):
    aot_cache.aot_cached(("p", 1), _build, _args)(*_args())
    aot_cache.aot_cached(("p", 2), _build, _args)(*_args())
    assert len(list(aot_dir.glob("*.jaxexport"))) == 2


def test_corrupt_blob_falls_back(aot_dir):
    key = ("corrupt", 0)
    aot_cache.aot_cached(key, _build, _args)
    blob = next(aot_dir.glob("*.jaxexport"))
    blob.write_bytes(b"not an export")
    fn = aot_cache.aot_cached(key, _build, _args)
    out = fn(*_args())          # falls back to re-trace, still correct
    assert int(out.count) == 4


def test_disable_env(aot_dir, monkeypatch):
    monkeypatch.setenv("RTMODT_AOT_CACHE_DISABLE", "1")
    fn = aot_cache.aot_cached(("off", 0), _build, _args)
    fn(*_args())
    assert list(aot_dir.glob("*.jaxexport")) == []


def test_no_example_args_returns_plain_jit(aot_dir):
    fn = aot_cache.aot_cached(("noargs", 0), _build, None)
    assert int(fn(*_args()).count) == 4
    assert list(aot_dir.glob("*.jaxexport")) == []


def test_axon_backend_disables_cache(aot_dir, monkeypatch):
    """Exported.call hangs forever through the axon relay plugin
    (docs/PERF_NOTES.md section 7) - the cache must refuse to build or
    serve blobs there and return the plain jitted function."""
    monkeypatch.setattr(aot_cache, "_platform_unsupported", lambda: True)
    fn = aot_cache.aot_cached(("axon", 0), _build, _args)
    assert int(fn(*_args()).count) == 4
    assert list(aot_dir.glob("*.jaxexport")) == []
