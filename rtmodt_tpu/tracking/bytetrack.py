"""ByteTrack as a pure, jittable JAX state machine over static track slots.

The reference's ByteTrack (``src/tracking/tracker.py:43-194``) is a Python
list-of-dicts updated on the CPU every frame.  The TPU-native formulation is a
pure function ``(TrackState, detections) -> (TrackState, visible)`` over a
fixed number of track slots (default 256), so detect+track compiles into ONE
XLA program with no host round-trip:

  * two-stage association (high-conf dets vs all active tracks, then low-conf
    dets vs the leftovers) exactly as the reference - match accepted when
    IoU >= match_thresh (reference tracker.py:97, :115-117, :170, :188);
  * batched Kalman predict/update (``motion_model: kalman``; the north-star
    requirement) or raw last-box association (``motion_model: none``, matching
    the Kalman-less reference);
  * births: unmatched high-conf dets claim free slots with monotonically
    increasing ids starting at 1 (reference tracker.py:125-135);
  * deaths: slots whose ``time_since_update`` exceeds ``track_buffer`` are
    freed (reference tracker.py:139).

Intended-semantics note (SURVEY.md 3.6 bug 1): the reference's ``_age_tracks``
unconditionally increments every track's ``time_since_update`` after matching,
so its ``update()`` provably returns ``[]`` every frame.  This implementation
follows the *intended* ByteTrack semantics - matched tracks keep tsu=0 and are
returned; only unmatched tracks age.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rtmodt_tpu.config.loader import ByteTrackConfig
from rtmodt_tpu.ops import kalman as kf
from rtmodt_tpu.ops.assignment import greedy_assign
from rtmodt_tpu.ops.iou import pairwise_iou, xyxy_to_cxcyah, cxcyah_to_xyxy


class TrackState(NamedTuple):
    """Fixed-slot tracker state; a pytree carried through the jitted step.

    Batched multi-stream mode simply adds a leading stream axis to every leaf.
    """

    active: jnp.ndarray      # (S,) bool
    boxes: jnp.ndarray       # (S, 4) f32 current xyxy estimate
    kf_mean: jnp.ndarray     # (S, 8) f32
    kf_cov: jnp.ndarray      # (S, 4, 3) f32 packed 2x2 blocks (see ops/kalman.py)
    track_id: jnp.ndarray    # (S,) i32
    class_id: jnp.ndarray    # (S,) i32
    confidence: jnp.ndarray  # (S,) f32
    age: jnp.ndarray         # (S,) i32 frames since birth (matched frames)
    tsu: jnp.ndarray         # (S,) i32 time since last update
    next_id: jnp.ndarray     # () i32


class TrackOutputs(NamedTuple):
    """Compact per-slot outputs of one tracking step - the ONLY data the host
    needs per frame (~7 KB at S=256), so the expensive full-state device->host
    fetch never happens on the hot path."""

    boxes: jnp.ndarray       # (S, 4) f32
    track_id: jnp.ndarray    # (S,) i32
    class_id: jnp.ndarray    # (S,) i32
    confidence: jnp.ndarray  # (S,) f32
    age: jnp.ndarray         # (S,) i32
    tsu: jnp.ndarray         # (S,) i32
    visible: jnp.ndarray     # (S,) bool


def init_track_state(max_tracks: int = 256) -> TrackState:
    s = max_tracks
    return TrackState(
        active=jnp.zeros((s,), bool),
        boxes=jnp.zeros((s, 4), jnp.float32),
        kf_mean=jnp.zeros((s, 8), jnp.float32),
        kf_cov=jnp.zeros(kf.cov_shape(s), jnp.float32),
        track_id=jnp.zeros((s,), jnp.int32),
        class_id=jnp.full((s,), -1, jnp.int32),
        confidence=jnp.zeros((s,), jnp.float32),
        age=jnp.zeros((s,), jnp.int32),
        tsu=jnp.zeros((s,), jnp.int32),
        next_id=jnp.int32(1),
    )


_CHI2_95_4DOF = 9.4877  # chi2.ppf(0.95, 4): canonical ByteTrack/DeepSORT chi2inv95 gate


def claim_free_slots(active: jnp.ndarray, is_new: jnp.ndarray,
                     next_id: jnp.ndarray):
    """Slot allocation for track births, shared by bytetrack and deepsort:
    the k-th new det (det order) claims the k-th free slot (slot order);
    births beyond the free-slot count scatter to the out-of-bounds sink S
    and are dropped (``mode="drop"``).  Returns
    (target_slot (D,), can_place (D,), new_ids (D,), newly_born (S,))."""
    s = active.shape[0]
    free_order = jnp.argsort(jnp.where(~active, jnp.arange(s), s + jnp.arange(s)))
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1     # (D,) exclusive rank
    num_free = jnp.sum(~active)
    can_place = is_new & (new_rank < num_free)
    target_slot = jnp.where(can_place, free_order[jnp.clip(new_rank, 0, s - 1)], s)
    new_ids = next_id + new_rank.astype(jnp.int32)
    newly_born = jnp.zeros((s,), bool).at[target_slot].set(True, mode="drop")
    return target_slot, can_place, new_ids, newly_born


def _associate_and_update(
    state: TrackState,
    pred_boxes: jnp.ndarray,
    det_boxes: jnp.ndarray,
    det_conf: jnp.ndarray,
    det_cls: jnp.ndarray,
    det_eligible: jnp.ndarray,
    row_eligible: jnp.ndarray,
    match_thresh: float,
    use_kalman: bool,
    fuse_score: bool = False,
    gate_distance: bool = False,
    iou: jnp.ndarray | None = None,
) -> tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """One association stage. Returns (state', matched_rows, matched_dets).

    Optional fidelity knobs from canonical ByteTrack: ``fuse_score``
    multiplies IoU similarity by detection confidence; ``gate_distance``
    rejects pairs whose squared Mahalanobis distance from the Kalman
    prediction exceeds the chi-square 95% bound.  ``iou`` lets the caller
    share one (S, D) matrix across both association stages.
    """
    if iou is None:
        iou = pairwise_iou(pred_boxes, det_boxes)      # (S, D)
    sim = iou * det_conf[None, :] if fuse_score else iou
    if gate_distance and use_kalman:
        # (1, D, 4) broadcasts against state.mean (S, 1, 4) inside
        # gating_distance - no materialized (S, D, 4) repeat
        dist = kf.gating_distance(kf.KalmanState(state.kf_mean, state.kf_cov),
                                  xyxy_to_cxcyah(det_boxes)[None])
        sim = jnp.where(dist <= _CHI2_95_4DOF, sim, -1.0)
    res = greedy_assign(sim, match_thresh, row_valid=row_eligible, col_valid=det_eligible)
    matched_rows = res.row_to_col >= 0                  # (S,)
    det_of_row = jnp.clip(res.row_to_col, 0)            # safe gather index

    m_boxes = det_boxes[det_of_row]                     # (S, 4)
    m_conf = det_conf[det_of_row]
    m_cls = det_cls[det_of_row]

    if use_kalman:
        meas = xyxy_to_cxcyah(m_boxes)
        upd = kf.update(kf.KalmanState(state.kf_mean, state.kf_cov), meas)
        new_mean = jnp.where(matched_rows[:, None], upd.mean, state.kf_mean)
        new_cov = jnp.where(matched_rows[:, None, None], upd.cov, state.kf_cov)
        filt_boxes = cxcyah_to_xyxy(new_mean[:, :4])
        out_boxes = jnp.where(matched_rows[:, None], filt_boxes, state.boxes)
    else:
        new_mean, new_cov = state.kf_mean, state.kf_cov
        out_boxes = jnp.where(matched_rows[:, None], m_boxes, state.boxes)

    state = state._replace(
        boxes=out_boxes,
        kf_mean=new_mean,
        kf_cov=new_cov,
        confidence=jnp.where(matched_rows, m_conf, state.confidence),
        class_id=jnp.where(matched_rows, m_cls, state.class_id),
        age=jnp.where(matched_rows, state.age + 1, state.age),
        tsu=jnp.where(matched_rows, 0, state.tsu),
    )
    matched_dets = res.col_to_row >= 0                  # (D,)
    return state, matched_rows, matched_dets


def bytetrack_update(
    state: TrackState,
    det_boxes: jnp.ndarray,   # (D, 4) xyxy, source coords
    det_conf: jnp.ndarray,    # (D,)
    det_cls: jnp.ndarray,     # (D,) int32
    det_valid: jnp.ndarray,   # (D,) bool
    cfg: ByteTrackConfig,
) -> tuple[TrackState, TrackOutputs]:
    """One tracking step. Returns (new_state, TrackOutputs).

    Visible tracks are active slots matched this frame (tsu == 0), the
    reference's return contract (tracker.py:141 under intended semantics).
    """
    use_kalman = cfg.motion_model == "kalman"
    det_boxes = det_boxes.astype(jnp.float32)
    det_conf = det_conf.astype(jnp.float32)
    # similarity is IoU either way; only the acceptance floor differs
    # (config/loader.py ByteTrackConfig.match_metric)
    accept = (cfg.match_thresh if cfg.match_metric == "iou"
              else 1.0 - cfg.match_thresh)

    # -- 0. Kalman predict for all active slots ---------------------------
    if use_kalman:
        pred = kf.predict(kf.KalmanState(state.kf_mean, state.kf_cov))
        kf_mean = jnp.where(state.active[:, None], pred.mean, state.kf_mean)
        kf_cov = jnp.where(state.active[:, None, None], pred.cov, state.kf_cov)
        state = state._replace(kf_mean=kf_mean, kf_cov=kf_cov)
        pred_boxes = jnp.where(state.active[:, None],
                               cxcyah_to_xyxy(kf_mean[:, :4]), state.boxes)
    else:
        pred_boxes = state.boxes

    # -- 1. split detections (reference tracker.py:75-85) -----------------
    high = det_valid & (det_conf >= cfg.track_thresh)
    low = det_valid & ~high & (det_conf >= cfg.low_thresh)

    # one (S, D) IoU matrix shared by both stages: predictions don't move
    # between them (stage-1-matched rows are ineligible in stage 2)
    iou = pairwise_iou(pred_boxes, det_boxes)

    # -- 2. first association: high dets vs all active tracks -------------
    state, matched1, det_matched1 = _associate_and_update(
        state, pred_boxes, det_boxes, det_conf, det_cls,
        det_eligible=high, row_eligible=state.active,
        match_thresh=accept, use_kalman=use_kalman,
        fuse_score=cfg.fuse_score, gate_distance=cfg.gate_distance, iou=iou,
    )

    # -- 3. second association: low dets vs unmatched tracks --------------
    # (canonical ByteTrack fuses scores only in the high-confidence stage)
    state, matched2, _ = _associate_and_update(
        state, pred_boxes, det_boxes, det_conf, det_cls,
        det_eligible=low, row_eligible=state.active & ~matched1,
        match_thresh=accept, use_kalman=use_kalman,
        gate_distance=cfg.gate_distance, iou=iou,
    )
    matched = matched1 | matched2

    # -- 4. births: unmatched high dets above the NEW-track gate claim
    # free slots (canonical ByteTrack activates only score >=
    # new_track_thresh; an unmatched det in [track_thresh, new_track_thresh)
    # is discarded, not born)
    is_new = high & ~det_matched1 & (det_conf >= cfg.new_track_thresh)
    target_slot, can_place, new_ids, newly_born = claim_free_slots(
        state.active, is_new, state.next_id)
    meas = xyxy_to_cxcyah(det_boxes)
    born = kf.initiate(meas)                                           # (D,) states

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
        next_id=state.next_id + jnp.sum(can_place.astype(jnp.int32)),
    )

    # -- 5. age unmatched tracks, free the dead (intended semantics) ------
    unmatched = state.active & ~matched & ~newly_born
    tsu = jnp.where(unmatched, state.tsu + 1, state.tsu)
    active = state.active & (tsu <= cfg.track_buffer)
    state = state._replace(tsu=tsu, active=active)

    visible = state.active & (state.tsu == 0)
    outputs = TrackOutputs(
        boxes=state.boxes, track_id=state.track_id, class_id=state.class_id,
        confidence=state.confidence, age=state.age, tsu=state.tsu, visible=visible,
    )
    return state, outputs
