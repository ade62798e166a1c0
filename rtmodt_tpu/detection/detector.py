"""The detection layer: `Detections` container + TPU `Detector`.

API-parity with the reference (``src/detection/detector.py:29-135``) - same
``Detections`` struct-of-arrays contract (xyxy f32, confidence f32, class_id
i32, class_names; empty frames produce zero-shape arrays) and the same
``Detector.detect(frame) -> Detections`` call - but the implementation is a
single jitted XLA program per input signature: device letterbox -> Flax
YOLOv8 forward (bf16) -> DFL decode -> fixed-shape class-aware NMS.  The only
host<->device traffic per frame is the uint8 frame in and the (max_det,)
result arrays out.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rtmodt_tpu.config.loader import DetectionConfig
from rtmodt_tpu.models.yolov8 import build_model, decode_predictions
from rtmodt_tpu.ops.letterbox import letterbox, unletterbox_boxes
from rtmodt_tpu.ops.nms import batched_nms_fixed, batched_nms_from_logits, NMSResult
from rtmodt_tpu.utils.coco_names import COCO_NAMES
from rtmodt_tpu.utils.logging import logger


@dataclass
class Detections:
    """One frame's detections (struct-of-arrays, host NumPy).

    Mirrors reference ``src/detection/detector.py:29-48`` exactly: same field
    names, dtypes, and the zero-shape contract for empty frames.
    """

    xyxy: np.ndarray            # (N, 4) float32, source-frame pixel coords
    confidence: np.ndarray     # (N,)  float32
    class_id: np.ndarray       # (N,)  int32
    class_names: list[str] = field(default_factory=lambda: list(COCO_NAMES))

    def __len__(self) -> int:
        return int(self.xyxy.shape[0])

    def filter_classes(self, keep: list[int]) -> "Detections":
        mask = np.isin(self.class_id, np.asarray(keep, dtype=np.int32))
        return Detections(self.xyxy[mask], self.confidence[mask],
                          self.class_id[mask], self.class_names)

    @staticmethod
    def empty(class_names: list[str] | None = None) -> "Detections":
        return Detections(
            np.zeros((0, 4), np.float32),
            np.zeros((0,), np.float32),
            np.zeros((0,), np.int32),
            class_names or list(COCO_NAMES),
        )


def detect_fn(
    params: Any,
    frame_u8: jnp.ndarray,
    *,
    model: Any,
    cfg: DetectionConfig,
    class_mask: jnp.ndarray | None,
) -> NMSResult:
    """The pure jittable detect step: uint8 (H, W, 3) frame -> NMSResult.

    Boxes are returned in *source-frame* coordinates (unletterboxed on device).
    Everything here is one XLA program: letterbox, forward, decode, NMS, and
    coordinate mapping.
    """
    dtype = jnp.bfloat16 if cfg.half else jnp.float32
    img, meta = letterbox(frame_u8, cfg.input_size, dtype=dtype)
    box_dist, cls_logits = model.apply(params, img[None], train=False)
    # decode-after-topk: candidate selection in logit space, DFL decode only
    # for the survivors (bit-identical to decode_predictions + fixed NMS)
    res = batched_nms_from_logits(
        box_dist[0], cls_logits[0], cfg.input_size,
        conf_thresh=cfg.conf_threshold,
        iou_thresh=cfg.iou_threshold,
        max_det=cfg.max_detections,
        num_candidates=cfg.nms_candidates,
        class_mask=class_mask,
        agnostic=cfg.agnostic_nms,
        impl=cfg.nms_impl, topk=cfg.topk_impl,
    )
    return res._replace(boxes=unletterbox_boxes(res.boxes, meta))


class Detector:
    """YOLOv8 detector with the reference's public API, jit-compiled per
    input-resolution signature (static shapes; each new (H, W) compiles once).
    """

    def __init__(self, config: DetectionConfig | dict | None = None, warmup: bool = True,
                 warmup_shape: tuple[int, int] | None = None):
        if isinstance(config, dict):
            config = DetectionConfig(**config)
        self.cfg = config or DetectionConfig()
        self.class_names = list(COCO_NAMES)[: self.cfg.num_classes]
        dtype = jnp.bfloat16 if self.cfg.half else jnp.float32
        self.model = build_model(self.cfg.model, self.cfg.num_classes, dtype=dtype)
        self._ckpt_fused = False
        self.params_version = 0   # bumped by the params setter; derived
        # caches (e.g. Pipeline._get_front_pack) key on it, never on id()
        self.params = self._load_params()
        if self._ckpt_fused and not self.cfg.fuse_bn:
            raise ValueError(
                "checkpoint is already BN-fused (e.g. a QAT qat_final.npz); "
                "set detection.fuse_bn: true to load it")
        if self.cfg.fuse_bn:
            # deploy-time BN folding (the TRT-engine analog); exact inference.
            # Already-fused checkpoints (QAT output) skip the fold.
            if not self._ckpt_fused:
                from rtmodt_tpu.models.weights import fuse_bn

                self.params = jax.device_put(jax.tree.map(
                    jnp.asarray, fuse_bn(jax.device_get(self.params))))
            self.model = build_model(self.cfg.model, self.cfg.num_classes,
                                     dtype=dtype, fused=True)
            if self.cfg.half and self.cfg.quant == "none":
                # deploy-time bf16 param storage: compute already casts every
                # operand to bf16 (flax dtype), so this is numerically
                # IDENTICAL - it halves HBM residency and the ~45 MB (s)
                # host->device weight transfer at cold start
                self.params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    self.params)
        if self.cfg.quant == "int8":
            if self.cfg.quant_scales:
                # frozen per-layer activation scales from QAT - the deployed
                # int8 program computes exactly what QAT optimized
                self._quantize_with_saved_scales(self.cfg.quant_scales)
            else:
                # PTQ on synthetic batches at init (reference exports a TRT
                # INT8 engine offline); call ``calibrate(frames)`` with real
                # frames to re-derive activation scales from stream data
                self._quantize(self._synthetic_calib_batches())
        if self.cfg.classes:
            mask = np.zeros((self.cfg.num_classes,), bool)
            mask[np.asarray(self.cfg.classes)] = True
            self._class_mask = jnp.asarray(mask)
        else:
            self._class_mask = None
        self._jitted: dict[tuple[int, int], Any] = {}
        if warmup:
            self._warmup(warmup_shape or (640, 640))

    # -- weights ---------------------------------------------------------
    @property
    def params(self) -> Any:
        return self._params

    @params.setter
    def params(self, value: Any) -> None:
        """Every (re)assignment bumps ``params_version`` so derived caches
        (precomputed s2d-front kernels, quant scales) invalidate by value,
        not by ``id()`` - CPython reuses ids of collected trees."""
        self._params = value
        self.params_version += 1

    def _load_params(self) -> Any:
        """Load weights with fallback chain (reference detector.py:82-90):
        primary -> fallback -> (new capability) random init with a warning."""
        from rtmodt_tpu.models import weights as W

        for path in (self.cfg.weights, self.cfg.fallback_weights):
            if not path:
                continue
            if os.path.exists(path):
                logger.info(f"loading weights from {path}")
                raw = W.load_params(path, None, self.cfg.input_size)
                self._ckpt_fused = W.tree_is_fused(raw)
                ref_model = self.model
                if self._ckpt_fused:
                    dtype = jnp.bfloat16 if self.cfg.half else jnp.float32
                    ref_model = build_model(self.cfg.model, self.cfg.num_classes,
                                            dtype=dtype, fused=True)
                    logger.info("checkpoint is BN-fused (QAT/deploy format)")
                W.validate_tree(raw, ref_model, self.cfg.input_size)
                return raw
            logger.warning(f"weights not found at {path}, trying fallback")
        logger.warning("no weights available - using random initialization "
                       "(detections will be meaningless; supply detection.weights)")
        shape = (1, self.cfg.input_size, self.cfg.input_size, 3)
        dtype = jnp.bfloat16 if self.cfg.half else jnp.float32
        # init ENTIRELY on CPU (including the PRNG key): the accelerator never
        # compiles the huge init program, and - critically - no accelerator
        # array ever feeds a CPU computation (mixing backends that way
        # permanently degrades accelerator transfer throughput ~50x under the
        # remote-TPU runtime; see docs/PERF_NOTES.md)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            rng = jax.random.PRNGKey(0)
            variables = self.model.init(rng, jnp.zeros(shape, dtype), train=False)
        return jax.device_put(variables)

    # -- quantization ------------------------------------------------------
    def _synthetic_calib_batches(self) -> list[jnp.ndarray]:
        rng = np.random.default_rng(0)
        s = self.cfg.input_size
        dtype = jnp.bfloat16 if self.cfg.half else jnp.float32
        return [jnp.asarray(rng.random((1, s, s, 3), np.float32), dtype)
                for _ in range(max(1, self.cfg.calib_frames))]

    def _quantize(self, calib_batches) -> None:
        from rtmodt_tpu.quant.ptq import quantize_model

        base = getattr(self.model, "_model", self.model)   # idempotent requant
        self.model = quantize_model(base, self.params, calib_batches)
        self._jitted = {}

    def _quantize_with_saved_scales(self, path: str) -> None:
        """int8 with FROZEN activation scales from QAT (qat_act_scales.npz:
        tools/train.py --qat-steps) - no calibration pass; the deployed
        program matches the numbers training optimized."""
        from rtmodt_tpu.quant.ptq import QuantizedModel, quantize_convs

        with np.load(path) as z:
            scales = {k.replace("|", "/"): float(z[k]) for k in z.files}
        base = getattr(self.model, "_model", self.model)
        qtree = quantize_convs(self.params, scales)
        logger.info(f"int8 with {len(qtree)} frozen QAT scales from {path}")
        self.model = QuantizedModel(base, qtree)
        self._jitted = {}

    def calibrate(self, frames_bgr: list[np.ndarray]) -> None:
        """Re-derive int8 activation scales from REAL frames (letterboxed the
        same way inference does), replacing the synthetic-init calibration."""
        if self.cfg.quant != "int8":
            raise ValueError("calibrate() only applies with detection.quant=int8")
        dtype = jnp.bfloat16 if self.cfg.half else jnp.float32
        batches = [letterbox(jnp.asarray(f), self.cfg.input_size, dtype=dtype)[0][None]
                   for f in frames_bgr]
        self._quantize(batches)

    # -- inference -------------------------------------------------------
    def _get_step(self, h: int, w: int):
        key = (h, w)
        if key not in self._jitted:
            logger.info(f"compiling detect step for input {w}x{h}")
            self._jitted[key] = jax.jit(
                partial(detect_fn, model=self.model, cfg=self.cfg,
                        class_mask=self._class_mask)
            )
        return self._jitted[key]

    def detect_device(self, frame_bgr_u8: np.ndarray) -> NMSResult:
        """Run detection, returning fixed-shape device arrays (for fusion with
        the tracker step or multi-stream batching)."""
        h, w = frame_bgr_u8.shape[:2]
        return self._get_step(h, w)(self.params, jnp.asarray(frame_bgr_u8))

    def detect(self, frame_bgr_u8: np.ndarray) -> Detections:
        """Reference-compatible API: BGR uint8 HWC in, host Detections out."""
        res = jax.device_get(self.detect_device(frame_bgr_u8))
        n = int(res.count)
        return Detections(
            np.asarray(res.boxes[:n], np.float32),
            np.asarray(res.scores[:n], np.float32),
            np.asarray(res.classes[:n], np.int32),
            self.class_names,
        )

    def _warmup(self, shape_hw: tuple[int, int], iters: int = 3) -> None:
        """Compile + warm the step on zeros (reference does 10 CUDA warmup
        iterations, detector.py:131-135; XLA needs one compile + a couple of
        executions to stabilize)."""
        h, w = shape_hw
        dummy = np.zeros((h, w, 3), np.uint8)
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(self.detect_device(dummy))
        logger.info(f"warmup done in {time.perf_counter() - t0:.2f}s ({w}x{h})")
