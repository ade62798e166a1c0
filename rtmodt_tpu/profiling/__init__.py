from rtmodt_tpu.profiling.latency_profiler import LatencyProfiler  # noqa: F401
