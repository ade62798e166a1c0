"""YOLOv8 detection loss: CIoU box + BCE cls + Distribution Focal Loss.

Matches the loss structure the reference trains with through ultralytics
(box 7.5 / cls 0.5 / dfl 1.5 gains - reference ``config/training.yaml``),
implemented as pure batched JAX over the static (B, A) anchor grid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from rtmodt_tpu.models.yolov8 import REG_MAX, make_anchors, decode_predictions
from rtmodt_tpu.ops.iou import ciou
from rtmodt_tpu.training.assigner import assign


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray
    num_fg: jnp.ndarray


def _dfl_loss(box_dist: jnp.ndarray, target_ltrb: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss per anchor (sum over 4 sides).

    ``box_dist``: (..., 4, REG_MAX) logits; ``target_ltrb``: (..., 4) distances
    in stride units, clamped to [0, REG_MAX-1-eps].  The integer-adjacent bins
    get cross-entropy weighted by proximity.
    """
    t = jnp.clip(target_ltrb, 0.0, REG_MAX - 1 - 1e-3)
    tl = jnp.floor(t)
    wr = t - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(box_dist, axis=-1)
    il = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, il[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(logp, (il + 1)[..., None], axis=-1)[..., 0]
    return -(wl * lp_l + wr * lp_r).sum(axis=-1)


def yolo_loss(
    box_dist: jnp.ndarray,      # (B, A, 4*REG_MAX) raw
    cls_logits: jnp.ndarray,    # (B, A, C) raw
    gt_boxes: jnp.ndarray,      # (B, M, 4) xyxy input-pixels, padded
    gt_labels: jnp.ndarray,     # (B, M) i32
    gt_mask: jnp.ndarray,       # (B, M) bool
    input_size: int,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
) -> LossBreakdown:
    b, a, _ = cls_logits.shape
    anchors, strides = make_anchors(input_size)           # (A, 2), (A, 1)
    pred_boxes, pred_scores = decode_predictions(box_dist, cls_logits, input_size)

    res = assign(jax.lax.stop_gradient(pred_scores),
                 jax.lax.stop_gradient(pred_boxes),
                 anchors, gt_boxes, gt_labels, gt_mask)

    score_sum = jnp.maximum(res.target_scores.sum(), 1.0)

    # -- cls: BCE against soft targets over ALL anchors -------------------
    cls_l = optax.sigmoid_binary_cross_entropy(
        cls_logits.astype(jnp.float32), res.target_scores).sum() / score_sum

    # -- box: CIoU on assigned anchors, weighted by target score ----------
    w = res.target_scores.sum(-1) * res.fg_mask           # (B, A)
    iou_term = 1.0 - ciou(pred_boxes, res.target_boxes)
    box_l = (iou_term * w).sum() / score_sum

    # -- dfl ----------------------------------------------------------------
    tx1y1 = (anchors[None] - res.target_boxes[..., :2]) / strides[None, :, :]
    tx2y2 = (res.target_boxes[..., 2:] - anchors[None]) / strides[None, :, :]
    target_ltrb = jnp.concatenate([tx1y1, tx2y2], axis=-1)
    dist = box_dist.astype(jnp.float32).reshape(b, a, 4, REG_MAX)
    dfl_l = (_dfl_loss(dist, target_ltrb) * w).sum() / score_sum

    total = box_gain * box_l + cls_gain * cls_l + dfl_gain * dfl_l
    return LossBreakdown(total, box_l, cls_l, dfl_l,
                         res.fg_mask.sum().astype(jnp.int32))
