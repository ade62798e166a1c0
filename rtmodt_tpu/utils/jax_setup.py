"""One-time JAX runtime configuration (compilation cache, flags)."""

from __future__ import annotations

import hashlib
import os
import platform

_done = False


def host_fingerprint() -> str:
    """Short stable hash of THIS host's CPU identity (ISA features + arch).

    XLA:CPU persistent-cache entries embed the target CPU's feature set; an
    entry compiled on a host with different features deserializes into an
    executable that can SIGILL (observed as the BENCH_r02 pass-0 failure:
    "compiled on a machine with CPU features ... vs host machine features").
    Folding this fingerprint into every cache key/path segregates entries
    per CPU model so a shared or migrated cache directory can never serve a
    foreign-host executable.
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    payload = f"{platform.machine()}|{platform.processor()}|{feats}"
    return hashlib.sha256(payload.encode()).hexdigest()[:12]


def setup_jax(cache_dir: str | None = None,
              platform: str | None = None) -> None:
    """Enable the persistent compilation cache so the large detect-step XLA
    programs compile once per machine, not once per process (first compile of
    the 640px model is minutes through the remote-TPU tunnel).

    ``platform="cpu"`` pins JAX to the host CPU (``system.device: cpu`` in
    the runtime config).  The env var ``JAX_PLATFORMS`` is NOT enough in
    this environment - the remote-TPU plugin's site hook overrides it - so
    the pin goes through ``jax.config`` exactly like tests/conftest.py.

    The cache directory gets a per-host-CPU subdirectory (see
    ``host_fingerprint``) so entries from a different machine sharing the
    same filesystem path can never poison this host's cache.
    """
    global _done
    if _done:
        return
    _done = True
    import jax

    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

    # NEVER persist/reload CPU-backend executables: this jaxlib's XLA:CPU
    # AOT loader rejects every reloaded executable's feature set (its own
    # writes include +prefer-no-scatter/+prefer-no-gather pseudo-features
    # absent from the loader's host probe) and the failed load HANGS the
    # computation instead of recompiling - reproduced 2026-08-19: cold run
    # completes, warm-cache rerun wedges in device_get at 0% CPU.  This,
    # not a foreign machine, is what killed BENCH_r02's pass 0.  TPU
    # processes still compile SOME programs for CPU (weight init, host
    # helpers), so gating by default_backend is not enough - filter the
    # cache get/put per executable's backend instead.  TPU executables
    # don't go through cpu_aot_loader and cache fine.
    if not _filter_cpu_entries():
        return   # can't guarantee safety -> leave the cache disabled

    path = cache_dir or os.environ.get(
        "RTMODT_JAX_CACHE", os.path.expanduser("~/.cache/rtmodt_jax_cache"))
    path = os.path.join(path, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _filter_cpu_entries() -> bool:
    """Patch jax's compilation cache so CPU-backend executables are never
    stored or loaded (see setup_jax).  Returns False when the internal API
    moved and the filter can't be installed."""
    try:
        import jax._src.compilation_cache as cc

        orig_get = cc.get_executable_and_time
        orig_put = cc.put_executable_and_time

        def get_filtered(cache_key, compile_options, backend,
                         executable_devices):
            if getattr(backend, "platform", "") == "cpu":
                return None, None
            return orig_get(cache_key, compile_options, backend,
                            executable_devices)

        def put_filtered(cache_key, module_name, executable, backend,
                         compile_time):
            if getattr(backend, "platform", "") == "cpu":
                return None
            return orig_put(cache_key, module_name, executable, backend,
                            compile_time)

        cc.get_executable_and_time = get_filtered
        cc.put_executable_and_time = put_filtered
        return True
    except Exception:
        return False
