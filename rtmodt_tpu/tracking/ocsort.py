"""OC-SORT as a pure, jittable JAX state machine over static track slots.

Observation-Centric SORT (Cao et al., CVPR 2023) extends the SORT family for
occlusion-heavy scenes by trusting *observations* over the Kalman prior when
a track re-appears.  The reference repo ships only ByteTrack (and declares an
unimplemented DeepSORT, ``src/tracking/tracker.py:212-214``); OC-SORT is a
framework extension in the same fixed-slot formulation as ``bytetrack.py`` /
``deepsort.py``, so detect + track still compiles into ONE XLA program with
no host round-trip.  The three observation-centric mechanisms:

  * **OCM (momentum)** - association prefers detections whose direction from
    the track's observation ``delta_t`` matches ago is consistent with the
    track's stored observation velocity: similarity = IoU +
    ``vdc_weight * (pi/2 - |angle diff|) / pi``, acceptance still gated on
    raw IoU >= ``iou_threshold`` (the canonical formulation).
  * **OCR (recovery)** - a final association stage matches still-unmatched
    detections against unmatched tracks' LAST OBSERVATIONS (not the Kalman
    prediction, which drifts during occlusion).
  * **ORU (re-update), closed form** - when a track re-activates after k lost
    frames, the filter is re-anchored on observations: position from the new
    measurement, velocity = (z_new - z_last_obs) / k, covariance re-initiated
    - instead of canonical ORU's per-track k-step virtual-trajectory replay,
    whose variable-length sequential loop is hostile to the SPMD per-frame
    scan (30 masked loop steps would cost more device time than the entire
    tracker - docs/PERF_NOTES.md on TPU loop overhead).  Same fixed point:
    an observation-consistent state, immune to the frozen prior's drift.

Other deviations from the canonical repo, all documented standards of this
framework: the Kalman state is (cx, cy, a, h) + velocities (ByteTrack
convention, ``ops/kalman.py``) instead of (x, y, s, r); assignment is the
exact-greedy device matcher (``ops/assignment.py``) instead of Hungarian
(same policy as our ByteTrack/DeepSORT); the OCM "previous observation" is
the one ``delta_t`` *matches* ago (a per-slot shift register) rather than
``delta_t`` frames ago - identical while a track is continuously matched,
and during a lost stretch both fall back to the newest stored observation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rtmodt_tpu.config.loader import OCSortConfig
from rtmodt_tpu.ops import kalman as kf
from rtmodt_tpu.ops.assignment import greedy_assign
from rtmodt_tpu.ops.iou import pairwise_iou, xyxy_to_cxcyah, cxcyah_to_xyxy
from rtmodt_tpu.tracking.bytetrack import TrackOutputs, claim_free_slots

_NEG = -1e9


class OCSortState(NamedTuple):
    """Fixed-slot OC-SORT state; a pytree carried through the jitted step.

    ``obs_ring[:, 0]`` is the newest stored observation, ``obs_ring[:, k]``
    the one k matches ago (shift register of length delta_t + 1).
    """

    active: jnp.ndarray      # (S,) bool
    boxes: jnp.ndarray       # (S, 4) f32 current xyxy estimate
    kf_mean: jnp.ndarray     # (S, 8) f32
    kf_cov: jnp.ndarray      # (S, 4, 3) f32 packed blocks (ops/kalman.py)
    track_id: jnp.ndarray    # (S,) i32
    class_id: jnp.ndarray    # (S,) i32
    confidence: jnp.ndarray  # (S,) f32
    age: jnp.ndarray         # (S,) i32 matched-frame count (hits)
    streak: jnp.ndarray      # (S,) i32 consecutive-match streak
    tsu: jnp.ndarray         # (S,) i32 frames since last match
    last_obs: jnp.ndarray    # (S, 4) f32 last matched observation (xyxy)
    obs_ring: jnp.ndarray    # (S, R, 4) f32 recent observations, newest first
    ring_count: jnp.ndarray  # (S,) i32 valid entries in obs_ring
    velocity: jnp.ndarray    # (S, 2) f32 unit (vx, vy) of centroid motion
    next_id: jnp.ndarray     # () i32
    frame_count: jnp.ndarray  # () i32 frames processed (min_hits grace)


def init_ocsort_state(max_tracks: int = 256, delta_t: int = 3) -> OCSortState:
    s, r = max_tracks, delta_t + 1
    return OCSortState(
        active=jnp.zeros((s,), bool),
        boxes=jnp.zeros((s, 4), jnp.float32),
        kf_mean=jnp.zeros((s, 8), jnp.float32),
        kf_cov=jnp.zeros(kf.cov_shape(s), jnp.float32),
        track_id=jnp.zeros((s,), jnp.int32),
        class_id=jnp.full((s,), -1, jnp.int32),
        confidence=jnp.zeros((s,), jnp.float32),
        age=jnp.zeros((s,), jnp.int32),
        streak=jnp.zeros((s,), jnp.int32),
        tsu=jnp.zeros((s,), jnp.int32),
        last_obs=jnp.zeros((s, 4), jnp.float32),
        obs_ring=jnp.zeros((s, r, 4), jnp.float32),
        ring_count=jnp.zeros((s,), jnp.int32),
        velocity=jnp.zeros((s, 2), jnp.float32),
        next_id=jnp.int32(1),
        frame_count=jnp.int32(0),
    )


def _centroid(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([(boxes[..., 0] + boxes[..., 2]) * 0.5,
                      (boxes[..., 1] + boxes[..., 3]) * 0.5], axis=-1)


def _prev_obs(state: OCSortState, delta_t: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Observation delta_t matches ago (or the oldest stored) per slot.

    Returns (obs (S, 4), has_obs (S,) bool)."""
    idx = jnp.clip(state.ring_count - 1, 0, delta_t)            # (S,)
    obs = jnp.take_along_axis(state.obs_ring,
                              idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return obs, state.ring_count > 0


def _angle_bonus(prev_obs: jnp.ndarray, has_prev: jnp.ndarray,
                 velocity: jnp.ndarray, vel_valid: jnp.ndarray,
                 det_boxes: jnp.ndarray, vdc_weight: float) -> jnp.ndarray:
    """OCM similarity bonus (S, D): vdc_weight * (pi/2 - |dangle|) / pi for
    tracks with a stored velocity, 0 otherwise (canonical associate())."""
    d = _centroid(det_boxes)[None, :, :] - _centroid(prev_obs)[:, None, :]
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1))                    # (S, D)
    dir_sd = d / jnp.maximum(norm, 1e-6)[..., None]
    cos = jnp.clip(jnp.sum(dir_sd * velocity[:, None, :], axis=-1), -1.0, 1.0)
    diff = (jnp.pi / 2.0 - jnp.abs(jnp.arccos(cos))) / jnp.pi   # [-1/2, 1/2]
    ok = (has_prev & vel_valid)[:, None] & (norm > 1e-6)
    return jnp.where(ok, diff * vdc_weight, 0.0)


def _apply_matches(state: OCSortState, matched: jnp.ndarray,
                   det_of_row: jnp.ndarray, det_boxes, det_conf, det_cls,
                   delta_t: int) -> OCSortState:
    """Kalman update (ORU-lite on re-activation) + observation bookkeeping."""
    m_boxes = det_boxes[det_of_row]                              # (S, 4)
    meas = xyxy_to_cxcyah(m_boxes)

    # standard update on the predicted prior
    upd = kf.update(kf.KalmanState(state.kf_mean, state.kf_cov), meas)

    # ORU-lite: a slot lost for k >= 2 frames re-anchors on observations -
    # position from the new measurement, velocity from the (last_obs -> new
    # obs) secant over the gap, covariance re-initiated (see module docstring)
    k_gap = jnp.maximum(state.tsu, 1).astype(jnp.float32)        # (S,)
    last_meas = xyxy_to_cxcyah(state.last_obs)
    re_born = kf.initiate(meas)
    re_vel = (meas - last_meas) / k_gap[:, None]
    re_mean = jnp.concatenate([meas, re_vel], axis=-1)
    reanchor = matched & (state.tsu >= 2) & (state.ring_count > 0)

    new_mean = jnp.where(reanchor[:, None], re_mean, upd.mean)
    new_cov = jnp.where(reanchor[:, None, None], re_born.cov, upd.cov)
    new_mean = jnp.where(matched[:, None], new_mean, state.kf_mean)
    new_cov = jnp.where(matched[:, None, None], new_cov, state.kf_cov)
    out_boxes = jnp.where(matched[:, None], cxcyah_to_xyxy(new_mean[:, :4]),
                          state.boxes)

    # observation velocity (unit centroid direction, canonical
    # speed_direction): from the obs delta_t matches ago to the new one
    prev, has_prev = _prev_obs(state, delta_t)
    d = _centroid(m_boxes) - _centroid(prev)                     # (S, 2)
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    vel = d / jnp.maximum(norm, 1e-6)
    vel_ok = matched & has_prev & (norm[:, 0] > 1e-6)
    new_velocity = jnp.where(vel_ok[:, None], vel, state.velocity)

    # push into the shift register
    pushed = jnp.concatenate([m_boxes[:, None], state.obs_ring[:, :-1]], axis=1)
    obs_ring = jnp.where(matched[:, None, None], pushed, state.obs_ring)
    ring_count = jnp.where(
        matched, jnp.minimum(state.ring_count + 1, state.obs_ring.shape[1]),
        state.ring_count)

    return state._replace(
        boxes=out_boxes,
        kf_mean=new_mean,
        kf_cov=new_cov,
        confidence=jnp.where(matched, det_conf[det_of_row], state.confidence),
        class_id=jnp.where(matched, det_cls[det_of_row], state.class_id),
        age=jnp.where(matched, state.age + 1, state.age),
        streak=jnp.where(matched, state.streak + 1, state.streak),
        tsu=jnp.where(matched, 0, state.tsu),
        last_obs=jnp.where(matched[:, None], m_boxes, state.last_obs),
        obs_ring=obs_ring,
        ring_count=ring_count,
        velocity=new_velocity,
    )


def ocsort_update(
    state: OCSortState,
    det_boxes: jnp.ndarray,   # (D, 4) xyxy, source coords
    det_conf: jnp.ndarray,    # (D,)
    det_cls: jnp.ndarray,     # (D,) int32
    det_valid: jnp.ndarray,   # (D,) bool
    cfg: OCSortConfig,
) -> tuple[OCSortState, TrackOutputs]:
    """One OC-SORT step. Returns (new_state, TrackOutputs).

    Visible tracks follow SORT's emit rule: matched this frame AND
    (streak >= min_hits OR the stream is younger than min_hits frames).
    """
    det_boxes = det_boxes.astype(jnp.float32)
    det_conf = det_conf.astype(jnp.float32)
    state = state._replace(frame_count=state.frame_count + 1)

    high = det_valid & (det_conf >= cfg.det_thresh)
    low = det_valid & ~high & (det_conf >= cfg.low_thresh)

    # -- 0. Kalman predict for all active slots ---------------------------
    pred = kf.predict(kf.KalmanState(state.kf_mean, state.kf_cov))
    kf_mean = jnp.where(state.active[:, None], pred.mean, state.kf_mean)
    kf_cov = jnp.where(state.active[:, None, None], pred.cov, state.kf_cov)
    state = state._replace(kf_mean=kf_mean, kf_cov=kf_cov)
    pred_boxes = jnp.where(state.active[:, None],
                           cxcyah_to_xyxy(kf_mean[:, :4]), state.boxes)

    # -- 1. OCM association: high dets vs active tracks -------------------
    # similarity = IoU + angle-consistency bonus, but ACCEPTANCE is gated on
    # raw IoU >= iou_threshold (canonical associate()); rows whose IoU fails
    # the gate are masked out so the bonus can reorder but never admit
    iou = pairwise_iou(pred_boxes, det_boxes)                   # (S, D)
    prev, has_prev = _prev_obs(state, cfg.delta_t)
    vel_valid = state.ring_count > 1
    bonus = _angle_bonus(prev, has_prev, state.velocity, vel_valid,
                         det_boxes, cfg.vdc_weight)
    sim1 = jnp.where(iou >= cfg.iou_threshold, iou + bonus, _NEG)
    res1 = greedy_assign(sim1, float(_NEG / 2),
                         row_valid=state.active, col_valid=high)
    matched1 = res1.row_to_col >= 0
    state = _apply_matches(state, matched1, jnp.clip(res1.row_to_col, 0),
                           det_boxes, det_conf, det_cls, cfg.delta_t)

    # -- 2. BYTE stage (optional): low dets vs unmatched tracks -----------
    if cfg.use_byte:
        sim2 = jnp.where(iou >= cfg.iou_threshold, iou, _NEG)
        res2 = greedy_assign(sim2, float(_NEG / 2),
                             row_valid=state.active & ~matched1, col_valid=low)
        matched2 = res2.row_to_col >= 0
        state = _apply_matches(state, matched2, jnp.clip(res2.row_to_col, 0),
                               det_boxes, det_conf, det_cls, cfg.delta_t)
    else:
        matched2 = jnp.zeros_like(matched1)

    # -- 3. OCR: remaining high dets vs unmatched tracks' LAST OBSERVATIONS
    rows3 = state.active & ~matched1 & ~matched2 & (state.ring_count > 0)
    cols3 = high & (res1.col_to_row < 0)
    iou_obs = pairwise_iou(state.last_obs, det_boxes)
    sim3 = jnp.where(iou_obs >= cfg.iou_threshold, iou_obs, _NEG)
    res3 = greedy_assign(sim3, float(_NEG / 2), row_valid=rows3, col_valid=cols3)
    matched3 = res3.row_to_col >= 0
    state = _apply_matches(state, matched3, jnp.clip(res3.row_to_col, 0),
                           det_boxes, det_conf, det_cls, cfg.delta_t)
    matched = matched1 | matched2 | matched3

    # -- 4. births: unmatched high dets claim free slots ------------------
    is_new = high & (res1.col_to_row < 0) & (res3.col_to_row < 0)
    target_slot, can_place, new_ids, newly_born = claim_free_slots(
        state.active, is_new, state.next_id)
    meas = xyxy_to_cxcyah(det_boxes)
    born = kf.initiate(meas)
    # each newborn's ring holds just its first observation
    born_ring = jnp.concatenate(
        [det_boxes[:, None, :],
         jnp.zeros((det_boxes.shape[0], state.obs_ring.shape[1] - 1, 4),
                   jnp.float32)], axis=1)                        # (D, R, 4)
    state = state._replace(
        active=state.active.at[target_slot].set(True, mode="drop"),
        boxes=state.boxes.at[target_slot].set(det_boxes, mode="drop"),
        kf_mean=state.kf_mean.at[target_slot].set(born.mean, mode="drop"),
        kf_cov=state.kf_cov.at[target_slot].set(born.cov, mode="drop"),
        track_id=state.track_id.at[target_slot].set(new_ids, mode="drop"),
        class_id=state.class_id.at[target_slot].set(det_cls, mode="drop"),
        confidence=state.confidence.at[target_slot].set(det_conf, mode="drop"),
        age=state.age.at[target_slot].set(1, mode="drop"),
        streak=state.streak.at[target_slot].set(1, mode="drop"),
        tsu=state.tsu.at[target_slot].set(0, mode="drop"),
        last_obs=state.last_obs.at[target_slot].set(det_boxes, mode="drop"),
        obs_ring=state.obs_ring.at[target_slot].set(born_ring, mode="drop"),
        ring_count=state.ring_count.at[target_slot].set(1, mode="drop"),
        velocity=state.velocity.at[target_slot].set(
            jnp.zeros((det_boxes.shape[0], 2), jnp.float32), mode="drop"),
        next_id=state.next_id + jnp.sum(can_place.astype(jnp.int32)),
    )

    # -- 5. age unmatched, free the dead; streak resets on a miss ---------
    unmatched = state.active & ~matched & ~newly_born
    tsu = jnp.where(unmatched, state.tsu + 1, state.tsu)
    streak = jnp.where(unmatched, 0, state.streak)
    active = state.active & (tsu <= cfg.max_age)
    state = state._replace(tsu=tsu, streak=streak, active=active)

    visible = state.active & (state.tsu == 0) & (
        (state.streak >= cfg.min_hits) | (state.frame_count <= cfg.min_hits))
    outputs = TrackOutputs(
        boxes=state.boxes, track_id=state.track_id, class_id=state.class_id,
        confidence=state.confidence, age=state.age, tsu=state.tsu,
        visible=visible,
    )
    return state, outputs
