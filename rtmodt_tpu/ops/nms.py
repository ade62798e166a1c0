"""Fixed-shape class-aware NMS for TPU.

The reference delegates NMS to torchvision/TensorRT CUDA kernels inside
``ultralytics`` (reference ``src/detection/detector.py:103-109``; SURVEY.md N3)
with dynamic output shapes and a GPU->CPU sync.  On TPU dynamic shapes would
force a recompile per frame, so this NMS is fully static:

  1. per-anchor best class + score, confidence gate;
  2. ``top_k`` down to a static candidate pool (``nms_candidates``, def. 300);
  3. class-offset trick for class-aware suppression (boxes shifted by
     ``class_id * OFFSET`` so different classes never overlap);
  4. exact greedy suppression as a ``lax.fori_loop`` over the candidate pool
     (compiled into the XLA program - no host round-trip);
  5. static ``max_det`` outputs with a validity mask.

The result stays on device, flowing straight into the tracker update in the
same jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rtmodt_tpu.ops.iou import pairwise_iou

_CLASS_OFFSET = 7680.0  # > any letterboxed coordinate; same trick as torchvision batched_nms


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (max_det, 4) xyxy, model-input coords
    scores: jnp.ndarray   # (max_det,)
    classes: jnp.ndarray  # (max_det,) int32
    valid: jnp.ndarray    # (max_det,) bool
    count: jnp.ndarray    # () int32 number of valid detections


def _greedy_suppress(iou: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Exact sequential greedy NMS over a score-sorted candidate pool.

    ``iou`` is (K, K); candidates are already sorted by descending score.
    Returns keep mask (K,) bool.  The loop carries only a K-length mask;
    each iteration reads one IoU row - cheap VPU work inside the compiled
    program.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        alive = keep[i] & (scores[i] > 0.0)
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, axis=0)[0]
        suppress = (row > iou_thresh) & (idx > i)
        return jnp.where(alive, keep & ~suppress, keep)

    return jax.lax.fori_loop(0, k, body, jnp.ones((k,), dtype=bool))


def batched_nms_fixed(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    conf_thresh: float,
    iou_thresh: float,
    max_det: int = 100,
    num_candidates: int = 300,
    class_mask: jnp.ndarray | None = None,
    agnostic: bool = False,
) -> NMSResult:
    """Class-aware NMS with fully static shapes.

    Args:
      boxes: (A, 4) xyxy decoded boxes (model-input coordinates).
      class_scores: (A, C) per-class scores (post-sigmoid).
      class_mask: optional (C,) bool keep-mask (the ``classes=[0,1,...]`` filter
        the reference passes to predict, detector.py:105).
    """
    f32 = jnp.float32
    boxes = boxes.astype(f32)
    class_scores = class_scores.astype(f32)
    if class_mask is not None:
        class_scores = jnp.where(class_mask[None, :], class_scores, 0.0)

    best_score = jnp.max(class_scores, axis=-1)       # (A,)
    best_class = jnp.argmax(class_scores, axis=-1).astype(jnp.int32)
    gate = best_score >= conf_thresh
    gated = jnp.where(gate, best_score, -1.0)

    k = min(num_candidates, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(gated, k)      # sorted desc
    cand_boxes = boxes[top_idx]
    cand_classes = best_class[top_idx]
    cand_scores = jnp.where(top_scores > 0.0, top_scores, 0.0)

    if agnostic:
        offset_boxes = cand_boxes
    else:
        offset_boxes = cand_boxes + (cand_classes.astype(f32) * _CLASS_OFFSET)[:, None]

    iou = pairwise_iou(offset_boxes, offset_boxes)
    keep = _greedy_suppress(iou, cand_scores, iou_thresh) & (cand_scores > 0.0)

    kept_scores = jnp.where(keep, cand_scores, -1.0)
    m = min(max_det, k)
    final_scores, sel = jax.lax.top_k(kept_scores, m)
    valid = final_scores > 0.0
    out_boxes = jnp.where(valid[:, None], cand_boxes[sel], 0.0)
    out_scores = jnp.where(valid, final_scores, 0.0)
    out_classes = jnp.where(valid, cand_classes[sel], -1)
    if m < max_det:  # pad to the static max_det contract
        pad = max_det - m
        out_boxes = jnp.concatenate([out_boxes, jnp.zeros((pad, 4), out_boxes.dtype)])
        out_scores = jnp.concatenate([out_scores, jnp.zeros((pad,), out_scores.dtype)])
        out_classes = jnp.concatenate([out_classes, jnp.full((pad,), -1, out_classes.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return NMSResult(out_boxes, out_scores, out_classes, valid,
                     jnp.sum(valid.astype(jnp.int32)))
