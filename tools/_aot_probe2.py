"""Fresh-process cold-start timing: deserialize + call the exported program."""
import time, numpy as np
from rtmodt_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax
from jax import export as jexport
from rtmodt_tpu.config import load_config
from rtmodt_tpu.parallel.multistream import MultiStreamPipeline
from rtmodt_tpu.runtime.aot_cache import _register_serializations
_register_serializations()

t00 = time.perf_counter()
cfg = load_config(overrides={
    "detection": {"model": "yolov8s", "input_size": 640},
    "profiling": {"per_stage": False}, "visualization": {"enabled": False},
    "parallel": {"num_streams": 4, "chunk_size": 8}})
msp = MultiStreamPipeline.__new__(MultiStreamPipeline)
# build only what the call needs: params + state (skip _packed_chunk_for)
MultiStreamPipeline.__init__(msp, cfg, num_streams=4)
print(f"pipeline init: {time.perf_counter()-t00:.1f}s", flush=True)

t0 = time.perf_counter()
rt = jexport.deserialize(open("/tmp/msp_export.bin", "rb").read())
print(f"deserialize: {time.perf_counter()-t0:.1f}s", flush=True)

from rtmodt_tpu.ops.yuv import content_dims
ch, cw = content_dims(720, 1280, 640)
T, S = 8, 4
y = np.zeros((T, S, ch, cw), np.uint8); u = np.zeros((T, S, ch//2, cw//2), np.uint8)
t0 = time.perf_counter()
out = rt.call(msp.params, msp.state, y, u, u.copy())
jax.block_until_ready(out)
print(f"first call (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = rt.call(msp.params, msp.state, y, u, u.copy())
jax.block_until_ready(out)
print(f"second call: {time.perf_counter()-t0:.1f}s", flush=True)
