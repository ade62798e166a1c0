"""BoT-SORT as a pure, jittable JAX state machine over static track slots.

Framework extension (the reference implements only a simplified ByteTrack,
``src/tracking/tracker.py:43-194``).  BoT-SORT (Aharon et al. 2022) is
ByteTrack's confidence-split two-stage association plus two additions:

  * **camera-motion compensation** - provided by the shared ``tracking.gmc``
    device-side phase-correlation block (``ops/gmc.py``), applied to the
    track state before this update runs;
  * **fused motion+appearance cost** in the high-confidence stage:
    ``min(IoU distance, gated cosine distance)``, where the cosine distance
    (halved, per the canonical repo) is only consulted for pairs that are
    both spatially plausible (``1 - IoU <= proximity_thresh``) and
    appearance-plausible (``d_emb <= appearance_thresh``).

Formulation mirrors ``bytetrack.py``/``deepsort.py``: fixed slots, batched
block-diagonal Kalman, greedy mutual-best assignment, so detect + embed +
track compiles into ONE XLA program.  State reuses ``DeepSortState`` (the
field set - slots + EMA appearance gallery - is identical), and the update
signature matches ``deepsort_update``, so every pipeline appearance path
(fused, packed, chunked, multi-stream SPMD) drives both trackers through
the same machinery.

Deviations from the canonical repo, shared with our other trackers:
  * births are immediately visible (our ByteTrack semantics) instead of the
    unconfirmed-track third stage;
  * the appearance gallery is a StrongSORT-style EMA, and stage-2 (low
    confidence) matches also refresh it - canonical BoT-SORT computes
    embeddings only for high-confidence detections, but here every NMS
    output already has one on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from rtmodt_tpu.config.loader import BotSortConfig
from rtmodt_tpu.ops import kalman as kf
from rtmodt_tpu.ops.assignment import greedy_assign
from rtmodt_tpu.ops.iou import pairwise_iou, xyxy_to_cxcyah, cxcyah_to_xyxy
from rtmodt_tpu.tracking.bytetrack import TrackOutputs, claim_free_slots
from rtmodt_tpu.tracking.deepsort import (DeepSortState, _apply_matches,
                                          init_deepsort_state)

# same pytree as DeepSORT: slots + Kalman + EMA appearance gallery
BotSortState = DeepSortState


def init_botsort_state(max_tracks: int = 256, embed_dim: int = 128) -> BotSortState:
    return init_deepsort_state(max_tracks, embed_dim)


def botsort_update(
    state: BotSortState,
    det_boxes: jnp.ndarray,   # (D, 4) xyxy, source coords
    det_conf: jnp.ndarray,    # (D,)
    det_cls: jnp.ndarray,     # (D,) int32
    det_valid: jnp.ndarray,   # (D,) bool
    det_feat: jnp.ndarray,    # (D, E) f32 L2-normalized embeddings
    cfg: BotSortConfig,
) -> tuple[BotSortState, TrackOutputs]:
    """One BoT-SORT step. Returns (new_state, TrackOutputs)."""
    det_boxes = det_boxes.astype(jnp.float32)
    det_conf = det_conf.astype(jnp.float32)
    det_feat = det_feat.astype(jnp.float32)

    # -- 0. Kalman predict for all active slots ---------------------------
    pred = kf.predict(kf.KalmanState(state.kf_mean, state.kf_cov))
    kf_mean = jnp.where(state.active[:, None], pred.mean, state.kf_mean)
    kf_cov = jnp.where(state.active[:, None, None], pred.cov, state.kf_cov)
    state = state._replace(kf_mean=kf_mean, kf_cov=kf_cov)
    pred_boxes = jnp.where(state.active[:, None],
                           cxcyah_to_xyxy(kf_mean[:, :4]), state.boxes)

    # -- 1. split detections (BYTE) ----------------------------------------
    high = det_valid & (det_conf >= cfg.track_thresh)
    low = det_valid & ~high & (det_conf >= cfg.low_thresh)

    iou = pairwise_iou(pred_boxes, det_boxes)              # (S, D)

    # -- 2. stage 1: high dets vs all active tracks, fused cost ------------
    # canonical BoT-SORT: d_iou = 1 - iou (optionally conf-fused);
    # d_emb = cos_dist/2, forced to 1 when the pair fails the spatial
    # proximity gate or its own appearance cut; cost = min(d_iou, d_emb)
    d_iou_raw = 1.0 - iou
    d_iou = 1.0 - iou * det_conf[None, :] if cfg.fuse_score else d_iou_raw
    cos_sim = state.feat @ det_feat.T                      # (S, D) in [-1, 1]
    d_emb = 0.5 * (1.0 - cos_sim)                          # /2 per canon; [0,1]
    gate = ((d_iou_raw <= cfg.proximity_thresh)
            & (d_emb <= cfg.appearance_thresh))
    d_emb = jnp.where(gate, d_emb, 1.0)
    fused_sim = 1.0 - jnp.minimum(d_iou, d_emb)
    res1 = greedy_assign(fused_sim, 1.0 - cfg.match_thresh,
                         row_valid=state.active, col_valid=high)
    matched1 = res1.row_to_col >= 0
    state = _apply_matches(state, matched1, jnp.clip(res1.row_to_col, 0),
                           det_boxes, det_conf, det_cls, det_feat,
                           cfg.ema_alpha)

    # -- 3. stage 2: low dets vs leftover tracks, IoU only -----------------
    res2 = greedy_assign(iou, 1.0 - cfg.low_match_thresh,
                         row_valid=state.active & ~matched1, col_valid=low)
    matched2 = res2.row_to_col >= 0
    state = _apply_matches(state, matched2, jnp.clip(res2.row_to_col, 0),
                           det_boxes, det_conf, det_cls, det_feat,
                           cfg.ema_alpha)
    matched = matched1 | matched2

    # -- 4. births: unmatched high dets above the new-track gate -----------
    is_new = high & (res1.col_to_row < 0) & (det_conf >= cfg.new_track_thresh)
    target_slot, can_place, new_ids, newly_born = claim_free_slots(
        state.active, is_new, state.next_id)
    born = kf.initiate(xyxy_to_cxcyah(det_boxes))
    state = state._replace(
        active=state.active.at[target_slot].set(True, mode="drop"),
        boxes=state.boxes.at[target_slot].set(det_boxes, mode="drop"),
        kf_mean=state.kf_mean.at[target_slot].set(born.mean, mode="drop"),
        kf_cov=state.kf_cov.at[target_slot].set(born.cov, mode="drop"),
        track_id=state.track_id.at[target_slot].set(new_ids, mode="drop"),
        class_id=state.class_id.at[target_slot].set(det_cls, mode="drop"),
        confidence=state.confidence.at[target_slot].set(det_conf, mode="drop"),
        age=state.age.at[target_slot].set(1, mode="drop"),
        tsu=state.tsu.at[target_slot].set(0, mode="drop"),
        feat=state.feat.at[target_slot].set(det_feat, mode="drop"),
        next_id=state.next_id + jnp.sum(can_place.astype(jnp.int32)),
    )

    # -- 5. age unmatched tracks, free the dead -----------------------------
    unmatched = state.active & ~matched & ~newly_born
    tsu = jnp.where(unmatched, state.tsu + 1, state.tsu)
    active = state.active & (tsu <= cfg.track_buffer)
    state = state._replace(tsu=tsu, active=active)

    visible = state.active & (state.tsu == 0)
    outputs = TrackOutputs(
        boxes=state.boxes, track_id=state.track_id, class_id=state.class_id,
        confidence=state.confidence, age=state.age, tsu=state.tsu,
        visible=visible,
    )
    return state, outputs
