"""DeepSORT as a pure, jittable JAX state machine over static track slots.

The reference *declares* DeepSORT (``config/default.yaml:53-60``: max_dist,
min_confidence, max_iou_distance, max_age, n_init, nn_budget, embedder) but
its dispatch raises NotImplementedError (``src/tracking/tracker.py:212-214``).
This is a working TPU-native implementation in the same fixed-slot formulation
as ``bytetrack.py``, so detect + embed + track compiles into ONE XLA program:

  * appearance association first: cosine distance between each confirmed
    track's gallery feature and every detection embedding, accepted when
    ``1 - cos_sim <= max_dist``, optionally gated by the Kalman Mahalanobis
    chi-square bound (canonical DeepSORT gating);
  * IoU association second for unconfirmed tracks and confirmed tracks that
    were matched last frame, accepted when ``1 - IoU <= max_iou_distance``
    (canonical DeepSORT's final IoU stage);
  * tentative births: a new track must be re-matched ``n_init`` consecutive
    frames before it is confirmed (and thus emitted); a tentative track that
    misses a frame is deleted immediately;
  * confirmed tracks survive ``max_age`` unmatched frames.

Deviations from the 2017 reference algorithm, both standard modernizations:
  * the per-track feature gallery (``nn_budget`` snapshots + min-distance)
    is an exponential moving average (``ema_alpha``), the StrongSORT
    formulation - O(1) memory per slot and jit-friendly;
  * the age-cascaded sequential matching loop is a single greedy pass over
    the full appearance matrix (StrongSORT showed vanilla global matching
    matches or beats the cascade).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rtmodt_tpu.config.loader import DeepSortConfig
from rtmodt_tpu.ops import kalman as kf
from rtmodt_tpu.ops.assignment import greedy_assign
from rtmodt_tpu.ops.iou import pairwise_iou, xyxy_to_cxcyah, cxcyah_to_xyxy
from rtmodt_tpu.tracking.bytetrack import (TrackOutputs, _CHI2_95_4DOF,
                                           claim_free_slots)


class DeepSortState(NamedTuple):
    """Fixed-slot DeepSORT state: ByteTrack's slots + an appearance gallery.

    ``age`` counts matched frames (hits); a slot is *confirmed* once
    ``age >= n_init``.  Only confirmed, currently-matched slots are visible.
    """

    active: jnp.ndarray      # (S,) bool
    boxes: jnp.ndarray       # (S, 4) f32 current xyxy estimate
    kf_mean: jnp.ndarray     # (S, 8) f32
    kf_cov: jnp.ndarray      # (S, 4, 3) f32 packed 2x2 blocks (see ops/kalman.py)
    track_id: jnp.ndarray    # (S,) i32
    class_id: jnp.ndarray    # (S,) i32
    confidence: jnp.ndarray  # (S,) f32
    age: jnp.ndarray         # (S,) i32 matched-frame count (hits)
    tsu: jnp.ndarray         # (S,) i32 frames since last match
    feat: jnp.ndarray        # (S, E) f32 L2-normalized EMA appearance
    next_id: jnp.ndarray     # () i32


def init_deepsort_state(max_tracks: int = 256, embed_dim: int = 128) -> DeepSortState:
    s = max_tracks
    return DeepSortState(
        active=jnp.zeros((s,), bool),
        boxes=jnp.zeros((s, 4), jnp.float32),
        kf_mean=jnp.zeros((s, 8), jnp.float32),
        kf_cov=jnp.zeros(kf.cov_shape(s), jnp.float32),
        track_id=jnp.zeros((s,), jnp.int32),
        class_id=jnp.full((s,), -1, jnp.int32),
        confidence=jnp.zeros((s,), jnp.float32),
        age=jnp.zeros((s,), jnp.int32),
        tsu=jnp.zeros((s,), jnp.int32),
        feat=jnp.zeros((s, embed_dim), jnp.float32),
        next_id=jnp.int32(1),
    )


def _apply_matches(state: DeepSortState, matched: jnp.ndarray,
                   det_of_row: jnp.ndarray, det_boxes, det_conf, det_cls,
                   det_feat, ema_alpha: float) -> DeepSortState:
    """Kalman-update + gallery-EMA every matched slot."""
    m_boxes = det_boxes[det_of_row]
    meas = xyxy_to_cxcyah(m_boxes)
    upd = kf.update(kf.KalmanState(state.kf_mean, state.kf_cov), meas)
    new_mean = jnp.where(matched[:, None], upd.mean, state.kf_mean)
    new_cov = jnp.where(matched[:, None, None], upd.cov, state.kf_cov)
    out_boxes = jnp.where(matched[:, None], cxcyah_to_xyxy(new_mean[:, :4]),
                          state.boxes)
    mixed = ema_alpha * state.feat + (1.0 - ema_alpha) * det_feat[det_of_row]
    mixed = mixed / (jnp.linalg.norm(mixed, axis=-1, keepdims=True) + 1e-8)
    return state._replace(
        boxes=out_boxes,
        kf_mean=new_mean,
        kf_cov=new_cov,
        confidence=jnp.where(matched, det_conf[det_of_row], state.confidence),
        class_id=jnp.where(matched, det_cls[det_of_row], state.class_id),
        age=jnp.where(matched, state.age + 1, state.age),
        tsu=jnp.where(matched, 0, state.tsu),
        feat=jnp.where(matched[:, None], mixed, state.feat),
    )


def deepsort_update(
    state: DeepSortState,
    det_boxes: jnp.ndarray,   # (D, 4) xyxy, source coords
    det_conf: jnp.ndarray,    # (D,)
    det_cls: jnp.ndarray,     # (D,) int32
    det_valid: jnp.ndarray,   # (D,) bool
    det_feat: jnp.ndarray,    # (D, E) f32 L2-normalized embeddings
    cfg: DeepSortConfig,
) -> tuple[DeepSortState, TrackOutputs]:
    """One DeepSORT step. Returns (new_state, TrackOutputs)."""
    det_boxes = det_boxes.astype(jnp.float32)
    det_conf = det_conf.astype(jnp.float32)
    det_feat = det_feat.astype(jnp.float32)
    eligible = det_valid & (det_conf >= cfg.min_confidence)
    confirmed = state.active & (state.age >= cfg.n_init)

    # -- 0. Kalman predict for all active slots ---------------------------
    pred = kf.predict(kf.KalmanState(state.kf_mean, state.kf_cov))
    kf_mean = jnp.where(state.active[:, None], pred.mean, state.kf_mean)
    kf_cov = jnp.where(state.active[:, None, None], pred.cov, state.kf_cov)
    state = state._replace(kf_mean=kf_mean, kf_cov=kf_cov)
    pred_boxes = jnp.where(state.active[:, None],
                           cxcyah_to_xyxy(kf_mean[:, :4]), state.boxes)

    # -- 1. appearance association: confirmed tracks x eligible dets ------
    cos_sim = state.feat @ det_feat.T                      # (S, D), in [-1, 1]
    if cfg.gate_distance:
        dist = kf.gating_distance(
            kf.KalmanState(state.kf_mean, state.kf_cov),
            xyxy_to_cxcyah(det_boxes)[None])   # broadcasts; no (S, D, 4) copy
        cos_sim = jnp.where(dist <= _CHI2_95_4DOF, cos_sim, -2.0)
    res1 = greedy_assign(cos_sim, 1.0 - cfg.max_dist,
                         row_valid=confirmed, col_valid=eligible)
    matched1 = res1.row_to_col >= 0
    state = _apply_matches(state, matched1, jnp.clip(res1.row_to_col, 0),
                           det_boxes, det_conf, det_cls, det_feat, cfg.ema_alpha)

    # -- 2. IoU association: unconfirmed + recently-seen confirmed --------
    # (canonical DeepSORT: tracks with time_since_update == 1 get an IoU
    #  pass; older lost tracks are appearance-only)
    rows2 = state.active & ~matched1 & (~confirmed | (state.tsu == 0))
    cols2 = eligible & (res1.col_to_row < 0)
    iou = pairwise_iou(pred_boxes, det_boxes)
    res2 = greedy_assign(iou, 1.0 - cfg.max_iou_distance,
                         row_valid=rows2, col_valid=cols2)
    matched2 = res2.row_to_col >= 0
    state = _apply_matches(state, matched2, jnp.clip(res2.row_to_col, 0),
                           det_boxes, det_conf, det_cls, det_feat, cfg.ema_alpha)
    matched = matched1 | matched2

    # -- 3. births: unmatched eligible dets claim free slots --------------
    is_new = eligible & (res1.col_to_row < 0) & (res2.col_to_row < 0)
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

    # -- 4. deaths ---------------------------------------------------------
    unmatched = state.active & ~matched & ~newly_born
    # tentative (never confirmed) tracks die on their first miss
    tentative_miss = unmatched & (state.age < cfg.n_init)
    tsu = jnp.where(unmatched, state.tsu + 1, state.tsu)
    active = state.active & ~tentative_miss & (tsu <= cfg.max_age)
    state = state._replace(tsu=tsu, active=active)

    visible = state.active & (state.age >= cfg.n_init) & (state.tsu == 0)
    outputs = TrackOutputs(
        boxes=state.boxes, track_id=state.track_id, class_id=state.class_id,
        confidence=state.confidence, age=state.age, tsu=state.tsu, visible=visible,
    )
    return state, outputs
