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


_FIXPOINT_UNROLL = 6  # straight-line rounds before the fallback while_loop


def _greedy_suppress(iou: jnp.ndarray, scores: jnp.ndarray,
                     iou_thresh: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EXACT greedy NMS via parallel fixpoint iteration (TPU-friendly).

    Candidates are sorted by descending score.  Sequential greedy satisfies
    the recurrence ``keep[j] = not exists i<j: keep[i] and iou[i,j] > t``,
    which has a UNIQUE solution (forward induction on j).  Iterating the map
    ``keep <- f(keep)`` therefore converges to exactly the greedy result;
    after iteration n, every box whose suppression-chain depth is <= n is
    final, so at most depth(chain)+1 rounds are needed (typically 2-4 in
    real scenes, K worst case).  Each round is one masked (K, K) reduction
    on the VPU - hundreds of times cheaper than K sequential loop steps.

    The first ``_FIXPOINT_UNROLL`` rounds are UNROLLED straight-line code:
    a ``lax.while_loop`` round costs ~an order of magnitude more than the
    round's actual VPU work (per-iteration loop overhead - the same effect
    that killed the fori_loop formulation, docs/PERF_NOTES.md #3; at round
    4 the fixpoint while was the chunk program's single largest op, 0.051
    ms/frame), and under ``vmap`` the loop runs until the SLOWEST frame in
    the chunk converges.  Unrolled rounds fuse into the surrounding
    program with no loop machinery; past the unroll a while_loop finishes
    deeper chains exactly - its cond evaluates once and the body never
    runs unless some chain is deeper than the unroll (rare: needs 6+
    boxes of one class stacked in a suppression chain).  Iterating the
    same map from the unrolled state is still the unique greedy fixpoint.

    Replaces the CUDA reference's torchvision NMS kernel (SURVEY.md N3) with
    identical greedy semantics.
    """
    k = iou.shape[0]
    upper = jnp.triu(jnp.ones((k, k), dtype=bool), 1)       # i < j pairs
    conflict = upper & (iou > iou_thresh) & (scores[:, None] > 0.0)

    def step(keep):
        return ~jnp.any(conflict & keep[:, None], axis=0)

    def cond(carry):
        keep, prev, it = carry
        return (it < k) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        return step(keep), keep, it + 1

    init = jnp.ones((k,), dtype=bool)
    keep, prev = step(init), init
    it = jnp.int32(1)
    for _ in range(min(_FIXPOINT_UNROLL, k) - 1):
        # past the fixpoint extra steps are exact no-ops; `it` advances
        # only while still changing, so `rounds` keeps its meaning (steps
        # to convergence - pinned against the host replica in
        # tests/test_dense_scenes.py)
        it = it + jnp.any(keep != prev).astype(jnp.int32)
        keep, prev = step(keep), keep
    keep, _, rounds = jax.lax.while_loop(cond, body, (keep, prev, it))
    return keep, rounds


def batched_nms_from_logits(
    box_dist: jnp.ndarray,
    cls_logits: jnp.ndarray,
    input_size: int,
    conf_thresh: float,
    iou_thresh: float,
    max_det: int = 100,
    num_candidates: int = 300,
    class_mask: jnp.ndarray | None = None,
    agnostic: bool = False,
    impl: str = "fixpoint",
    topk: str = "exact",
) -> NMSResult:
    """Class-aware NMS straight from the RAW head outputs - decode-after-topk.

    Equivalent to ``decode_predictions`` + ``batched_nms_fixed`` but picks the
    ``num_candidates`` survivors FIRST and only then runs the expensive DFL
    decode on those rows.  Sigmoid is strictly monotonic, so per-anchor class
    argmax, the confidence gate, and top-k are all done in LOGIT space with no
    semantic change; the full-grid sigmoid over (A, C) scores and the DFL
    softmax over all A anchors - together the dominant elementwise cost of
    the fused detect step (trace: ~40% of post-Kalman device time) - shrink
    to the candidate pool (28x fewer anchors at the default 300/8400).

    Args:
      box_dist: (A, 4*REG_MAX) raw DFL distributions from the head.
      cls_logits: (A, C) raw class logits (pre-sigmoid).
    """
    cand_boxes, cand_scores, cand_classes, k = _candidates_from_logits(
        box_dist, cls_logits, input_size, conf_thresh, num_candidates,
        class_mask, topk)
    return _suppress_and_pack(cand_boxes, cand_scores, cand_classes,
                              iou_thresh, max_det, k, agnostic, impl)


def _candidates_from_logits(
    box_dist: jnp.ndarray,
    cls_logits: jnp.ndarray,
    input_size: int,
    conf_thresh: float,
    num_candidates: int,
    class_mask: jnp.ndarray | None,
    topk: str = "exact",
):
    """Decode-after-topk candidate pool (shared by NMS and debug paths)."""
    import numpy as np

    from rtmodt_tpu.models.yolov8 import REG_MAX, make_anchors

    f32 = jnp.float32
    logits = cls_logits.astype(f32)
    if class_mask is not None:
        logits = jnp.where(class_mask[None, :], logits, -1e9)

    best_logit = jnp.max(logits, axis=-1)              # (A,)
    best_class = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # sigmoid(x) >= t  <=>  x >= log(t / (1-t))
    t = min(max(float(conf_thresh), 1e-9), 1.0 - 1e-9)
    logit_thresh = float(np.log(t / (1.0 - t)))
    gate = best_logit >= logit_thresh
    gated = jnp.where(gate, best_logit, -1e9)

    k = min(num_candidates, cls_logits.shape[0])
    if topk == "approx":
        # TPU PartialReduce custom call (jax.lax.approx_max_k): collapses
        # the anchor axis into buckets, per-bucket max, exact sorted top-k
        # over the maxima - several times cheaper than the full variadic
        # sort lax.top_k lowers to.  The loss mode is benign here: two
        # gated anchors sharing a bucket are ADJACENT grid cells, whose
        # lower-scored box NMS would almost always suppress anyway (pool
        # occupancy stays far below k in real scenes - bench_dense).  On
        # CPU (tests, CI) approx_max_k falls back to the exact sort, so
        # results are identical off-TPU.
        top_logits, top_idx = jax.lax.approx_max_k(
            gated, k, recall_target=0.95, aggregate_to_topk=True)
    else:
        top_logits, top_idx = jax.lax.top_k(gated, k)  # sorted desc
    cand_valid = top_logits > -1e8
    cand_scores = jnp.where(cand_valid, jax.nn.sigmoid(top_logits), 0.0)
    cand_classes = best_class[top_idx]

    # DFL decode for the candidate rows only
    anchors, strides = make_anchors(input_size)        # (A, 2), (A, 1)
    cd = box_dist[top_idx].astype(f32).reshape(k, 4, REG_MAX)
    bins = jnp.arange(REG_MAX, dtype=f32)
    ltrb = jnp.sum(jax.nn.softmax(cd, axis=-1) * bins, axis=-1) * strides[top_idx]
    a = anchors[top_idx]
    cand_boxes = jnp.concatenate([a - ltrb[:, :2], a + ltrb[:, 2:]], axis=-1)
    return cand_boxes, cand_scores, cand_classes, k


def nms_debug_from_logits(
    box_dist: jnp.ndarray,
    cls_logits: jnp.ndarray,
    input_size: int,
    conf_thresh: float,
    iou_thresh: float,
    num_candidates: int = 300,
    class_mask: jnp.ndarray | None = None,
    agnostic: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Diagnostics for the fixpoint NMS on real head outputs.

    Returns ``(rounds, pool_used, kept)``: fixpoint iterations until
    convergence, candidates that survived the confidence gate (pool
    saturation vs ``num_candidates``), and post-suppression survivors.
    Debug-only - the production path (``batched_nms_from_logits``) does not
    carry these scalars.
    """
    cand_boxes, cand_scores, cand_classes, _ = _candidates_from_logits(
        box_dist, cls_logits, input_size, conf_thresh, num_candidates,
        class_mask)
    f32 = jnp.float32
    if agnostic:
        offset_boxes = cand_boxes
    else:
        offset_boxes = cand_boxes + (cand_classes.astype(f32) * _CLASS_OFFSET)[:, None]
    iou = pairwise_iou(offset_boxes, offset_boxes)
    keep, rounds = _greedy_suppress(iou, cand_scores, iou_thresh)
    keep = keep & (cand_scores > 0.0)
    pool_used = jnp.sum((cand_scores > 0.0).astype(jnp.int32))
    return rounds, pool_used, jnp.sum(keep.astype(jnp.int32))


def batched_nms_fixed(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    conf_thresh: float,
    iou_thresh: float,
    max_det: int = 100,
    num_candidates: int = 300,
    class_mask: jnp.ndarray | None = None,
    agnostic: bool = False,
    impl: str = "fixpoint",
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

    return _suppress_and_pack(cand_boxes, cand_scores, cand_classes,
                              iou_thresh, max_det, k, agnostic, impl)


def _suppress_and_pack(
    cand_boxes: jnp.ndarray,
    cand_scores: jnp.ndarray,
    cand_classes: jnp.ndarray,
    iou_thresh: float,
    max_det: int,
    k: int,
    agnostic: bool,
    impl: str,
) -> NMSResult:
    """Shared tail: class-offset suppression + static max_det packing."""
    f32 = jnp.float32
    if agnostic:
        offset_boxes = cand_boxes
    else:
        offset_boxes = cand_boxes + (cand_classes.astype(f32) * _CLASS_OFFSET)[:, None]

    if impl == "auto":
        # measured (PERF_NOTES.md): in BATCHED chunk programs the fixpoint
        # wins (one masked (K,K) VPU round covers all frames; the vmapped
        # pallas kernel serializes per-frame sequential loops, 0.081 vs
        # 0.054 ms/frame at 16 frames); single-frame latency programs the
        # pallas kernel wins slightly. "auto" = the batched-path default.
        impl = "fixpoint"
    if impl == "pallas":
        from rtmodt_tpu.ops.pallas.nms_kernel import pallas_greedy_suppress

        # pallas on the CPU backend only runs in interpret mode (the config
        # is portable between TPU runs and CPU-mesh tests/CI)
        interpret = jax.default_backend() == "cpu"
        keep = pallas_greedy_suppress(offset_boxes, cand_scores, iou_thresh,
                                      interpret=interpret)
    else:
        iou = pairwise_iou(offset_boxes, offset_boxes)
        keep, _ = _greedy_suppress(iou, cand_scores, iou_thresh)
    keep = keep & (cand_scores > 0.0)

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
