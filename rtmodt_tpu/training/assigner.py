"""Task-Aligned Assigner (TAL) for anchor-free YOLOv8 training - fully
vectorized/batched JAX with static shapes (padded GT slots).

The reference delegates training entirely to the ultralytics CLI
(``tools/train.py:20-41``; SURVEY.md 3.4); this is the framework's own
label-assignment core.  Protocol (Task-Aligned One-stage Object Detection,
TOOD/YOLOv8 variant):

  1. candidate anchors = those whose center lies inside the GT box;
  2. alignment metric t = score^alpha * IoU^beta per (gt, anchor);
  3. keep top-k anchors per GT by t;
  4. anchors claimed by multiple GTs go to the GT with highest IoU;
  5. cls targets = alignment metric normalized per GT to its max IoU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rtmodt_tpu.ops.iou import box_iou


class AssignResult(NamedTuple):
    target_boxes: jnp.ndarray    # (B, A, 4) xyxy
    target_scores: jnp.ndarray   # (B, A, C) soft cls targets
    fg_mask: jnp.ndarray         # (B, A) bool - anchor is assigned
    target_gt_idx: jnp.ndarray   # (B, A) i32 - index of assigned GT slot


def assign(
    pred_scores: jnp.ndarray,   # (B, A, C) post-sigmoid
    pred_boxes: jnp.ndarray,    # (B, A, 4) xyxy (input-pixel units)
    anchors: jnp.ndarray,       # (A, 2) centers
    gt_boxes: jnp.ndarray,      # (B, M, 4) xyxy, padded
    gt_labels: jnp.ndarray,     # (B, M) i32
    gt_mask: jnp.ndarray,       # (B, M) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    b, a, c = pred_scores.shape
    m = gt_boxes.shape[1]

    # -- candidates: anchor center inside GT -----------------------------
    ax = anchors[None, None, :, 0]
    ay = anchors[None, None, :, 1]
    in_gt = ((ax >= gt_boxes[..., 0:1]) & (ax < gt_boxes[..., 2:3]) &
             (ay >= gt_boxes[..., 1:2]) & (ay < gt_boxes[..., 3:4]))   # (B, M, A)
    in_gt = in_gt & gt_mask[..., None]

    # -- alignment metric -------------------------------------------------
    iou = box_iou(gt_boxes[:, :, None, :], pred_boxes[:, None, :, :])  # (B, M, A)
    iou = jnp.clip(iou, 0.0)
    cls_idx = jnp.clip(gt_labels, 0, c - 1)
    score = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),                # (B, C, A)
        cls_idx[..., None].astype(jnp.int32), axis=1)  # (B, M, A)
    metric = (score ** alpha) * (iou ** beta)
    metric = jnp.where(in_gt, metric, 0.0)

    # -- top-k per GT (explicit indices: ties beyond k are NOT kept) -------
    k = min(topk, a)
    topk_vals, topk_idx = jax.lax.top_k(metric, k)      # (B, M, k)
    b_idx = jnp.arange(b)[:, None, None]
    m_idx = jnp.arange(m)[None, :, None]
    is_topk = jnp.zeros((b, m, a), bool).at[b_idx, m_idx, topk_idx].set(
        topk_vals > 0.0)

    # -- resolve multi-GT anchors by highest IoU ---------------------------
    cand_iou = jnp.where(is_topk, iou, -1.0)
    best_gt = jnp.argmax(cand_iou, axis=1)             # (B, A)
    fg = jnp.max(is_topk, axis=1)                      # (B, A)
    keep = is_topk & (jnp.arange(m)[None, :, None] == best_gt[:, None, :])

    # -- targets -----------------------------------------------------------
    tgt_boxes = jnp.take_along_axis(
        gt_boxes, best_gt[:, :, None].astype(jnp.int32), axis=1)  # (B, A, 4)
    tgt_boxes = jnp.where(fg[..., None], tgt_boxes, 0.0)
    tgt_labels = jnp.take_along_axis(cls_idx, best_gt, axis=1)    # (B, A)

    # per-GT normalization: t_hat = t / max_t(gt) * max_iou(gt)
    metric_kept = jnp.where(keep, metric, 0.0)
    iou_kept = jnp.where(keep, iou, 0.0)
    max_metric = jnp.max(metric_kept, axis=-1, keepdims=True)    # (B, M, 1)
    max_iou = jnp.max(iou_kept, axis=-1, keepdims=True)
    norm = metric_kept * max_iou / jnp.maximum(max_metric, eps)  # (B, M, A)
    anchor_score = jnp.max(norm, axis=1)                         # (B, A)

    import jax.nn as jnn

    target_scores = jnn.one_hot(tgt_labels, c, dtype=pred_scores.dtype) * anchor_score[..., None]
    target_scores = jnp.where(fg[..., None], target_scores, 0.0)

    return AssignResult(
        target_boxes=tgt_boxes.astype(jnp.float32),
        target_scores=target_scores.astype(jnp.float32),
        fg_mask=fg,
        target_gt_idx=best_gt.astype(jnp.int32),
    )
