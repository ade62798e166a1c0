"""Quantization-aware fine-tuning (QAT) for the int8 deployment path.

Completes the quantization story next to ``quant/ptq.py``: where PTQ only
calibrates a trained model, QAT fine-tunes the weights THROUGH the int8
rounding so accuracy survives quantization.  The reference's int8 deployment
is TensorRT engine calibration (``tools/export_model.py:17-40`` ``int8``
flag, TECHNICAL_DESIGN_DOCUMENT.md:1104) - calibration-only; this gives the
TPU build the stronger variant.

Flow (standard fold-then-finetune):
  1. fold BatchNorm into the convs (``models.weights.fuse_bn``) so training
     sees exactly the deployed graph;
  2. calibrate per-layer activation scales once (``ptq.collect_act_scales``)
     and FREEZE them;
  3. fine-tune with fake-quant convs: weights are re-quantized per-channel
     from their live values every step, activations use the frozen scales,
     and both pass gradients via the straight-through estimator (STE)
     ``x + stop_grad(q(x) - x)``;
  4. deploy by feeding the SAME frozen scales to ``ptq.quantize_convs`` -
     the deployed int8 program computes the numbers training optimized for.

Everything is one jitted XLA program per step; the fake-quant interceptor
rewrites each fused ``ConvBN`` in place, so the model definition is untouched.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from jax import lax

from rtmodt_tpu.utils.logging import logger


def _convbn_cls():
    from rtmodt_tpu.models.yolov8 import ConvBN
    return ConvBN


def _fake_quant(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 fake-quant with straight-through gradients."""
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + lax.stop_gradient(q - x)


class FakeQuantModel:
    """Duck-typed twin of the Flax model whose fused ConvBN layers run with
    fake-quantized weights and activations (f32 compute for stable QAT
    gradients).  ``act_scales`` is the {module_path: amax} dict from
    ``ptq.collect_act_scales``; paths in ``skip`` or absent from it stay
    floating point (stem by default, matching the PTQ deployment)."""

    def __init__(self, model: Any, act_scales: dict[str, float],
                 skip: tuple[str, ...] = ("stem",)):
        self._model = model
        ConvBN = _convbn_cls()
        frozen = {p: max(a, 1e-8) / 127.0 for p, a in act_scales.items()
                  if p not in skip}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if not (isinstance(m, ConvBN) and context.method_name == "__call__"
                    and m.fused):
                return next_fun(*args, **kwargs)
            ascale = frozen.get("/".join(map(str, m.path)))
            if ascale is None:
                return next_fun(*args, **kwargs)
            w = m.variables["params"]["conv"]["kernel"].astype(jnp.float32)
            b = m.variables["params"]["conv"]["bias"].astype(jnp.float32)
            wmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))          # (cout,)
            wscale = jnp.maximum(wmax, 1e-8) / 127.0
            x = _fake_quant(args[0].astype(jnp.float32), jnp.float32(ascale))
            wq = _fake_quant(w, wscale)
            pad = m.kernel // 2
            y = lax.conv_general_dilated(
                x, wq, window_strides=(m.stride, m.stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return nn.silu(y + b).astype(m.dtype)

        self._interceptor = interceptor

    def apply(self, params, *args, **kwargs):
        with nn.intercept_methods(self._interceptor):
            return self._model.apply(params, *args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._model, name)


def make_qat_step(fq_model: FakeQuantModel, tx: optax.GradientTransformation,
                  input_size: int, box_gain: float = 7.5,
                  cls_gain: float = 0.5, dfl_gain: float = 1.5):
    """Jitted (params, opt_state, batch) -> (params, opt_state, metrics) on
    the FUSED graph (no BatchNorm state - it was folded before QAT)."""
    from rtmodt_tpu.training.loss import yolo_loss
    from rtmodt_tpu.training.train_step import Batch

    def step(params, opt_state, batch: Batch):
        images = batch.images
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0

        def loss_fn(p):
            box_dist, cls_logits = fq_model.apply(
                {"params": p}, images, train=True)
            lb = yolo_loss(box_dist, cls_logits, batch.gt_boxes,
                           batch.gt_labels, batch.gt_mask, input_size,
                           box_gain, cls_gain, dfl_gain)
            return lb.total, lb

        (loss, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "box_loss": lb.box, "cls_loss": lb.cls,
                   "dfl_loss": lb.dfl, "grad_norm": optax.global_norm(grads)}
        return new_params, new_opt, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def qat_finetune(model_fused: Any, fused_params: dict, batches: Iterable,
                 input_size: int, steps: int | None = None, lr: float = 1e-5,
                 calib_batches: int = 2, skip: tuple[str, ...] = ("stem",),
                 log_every: int = 20):
    """Convenience driver: calibrate -> fake-quant fine-tune -> return
    (new_fused_params, act_scales) ready for ``ptq.quantize_convs``.

    ``model_fused``/``fused_params`` are the ``fused=True`` build (fold a
    trained checkpoint with ``models.weights.fuse_bn`` first).  ``batches``
    yields ``training.train_step.Batch``; the first ``calib_batches`` of
    them also serve as activation-scale calibration data.
    """
    from rtmodt_tpu.quant.ptq import collect_act_scales

    batches = iter(batches)
    calib, cached = [], []
    for _ in range(calib_batches):
        b = next(batches)
        cached.append(b)
        img = b.images
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        calib.append(img)
    scales = collect_act_scales(model_fused, {"params": fused_params}, calib)
    fq = FakeQuantModel(model_fused, scales, skip=skip)
    # same masked decay as training/train_step.make_optimizer: default adamw
    # would weight-decay the BN-folded conv BIASES every step, drifting the
    # calibrated operating point the frozen activation scales assume
    from rtmodt_tpu.training.train_step import make_optimizer
    tx = make_optimizer(optax.constant_schedule(lr))
    # the step donates its state buffers; start from a copy so the caller's
    # params stay alive
    params = jax.tree.map(jnp.array, fused_params)
    opt_state = tx.init(params)
    step_fn = make_qat_step(fq, tx, input_size)
    n = 0
    import itertools
    for batch in itertools.chain(cached, batches):
        if steps is not None and n >= steps:
            break
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if log_every and n % log_every == 0:
            logger.info(f"qat step {n}: loss={float(metrics['loss']):.4f}")
        n += 1
    n_q = len([p for p in scales if p not in skip])
    logger.info(f"QAT fine-tune done: {n} steps, "
                f"{n_q} quantized layers (skip={list(skip)})")
    return params, scales
