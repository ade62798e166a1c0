"""Batched constant-velocity Kalman filter (ByteTrack-style) in JAX.

The reference declares ``filterpy`` but never uses it - its in-repo ByteTrack
has NO motion model (SURVEY.md N10; reference ``src/tracking/tracker.py``
associates against raw last boxes).  Real ByteTrack uses this filter, and the
north-star baseline requires it, so it is built here as a first-class batched
op.

State: (cx, cy, a, h, vcx, vcy, va, vh) with aspect a = w/h.
Measurement: (cx, cy, a, h).  Noise scales with box height, matching the
canonical ByteTrack/DeepSORT implementation constants (1/20 position,
1/160 velocity).

**Block-diagonal representation.** In this filter the four coordinates never
mix: F = [[I, I], [0, I]], and Q, R, and the initial covariance are diagonal,
so the full 8x8 covariance stays EXACTLY block-diagonal forever - four
independent 2x2 (position, velocity) blocks, one per coordinate.  The
covariance is therefore stored as ``(N, 4, 3)`` packed blocks
``(P_pp, P_pv, P_vv)`` and every step is closed form on (N, 4) arrays: the
innovation covariance is diagonal, so the update is a scalar reciprocal per
coordinate instead of a batched 4x4 LU solve - which matters because these
ops run INSIDE the per-frame ``lax.scan`` of the chunked tracking step (a
device trace showed the dense formulation's solves dominating that scan).
Identical math to the dense filter, up to float reassociation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

STD_WEIGHT_POS = 1.0 / 20.0
STD_WEIGHT_VEL = 1.0 / 160.0


class KalmanState(NamedTuple):
    mean: jnp.ndarray  # (N, 8)
    cov: jnp.ndarray   # (N, 4, 3) per-coordinate packed 2x2 block (pp, pv, vv)

    @property
    def pp(self) -> jnp.ndarray:
        return self.cov[..., 0]

    @property
    def pv(self) -> jnp.ndarray:
        return self.cov[..., 1]

    @property
    def vv(self) -> jnp.ndarray:
        return self.cov[..., 2]


def cov_shape(n: int) -> tuple[int, int, int]:
    """Shape of the packed covariance for n slots (for state initializers)."""
    return (n, 4, 3)


def pack_cov(dense: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) dense covariance -> (..., 4, 3) packed blocks.  Valid for
    the block-diagonal structure this filter maintains (off-block entries of
    a conforming dense covariance are zero and are dropped)."""
    idx = jnp.arange(4)
    pp = dense[..., idx, idx]
    pv = dense[..., idx, idx + 4]
    vv = dense[..., idx + 4, idx + 4]
    return jnp.stack([pp, pv, vv], axis=-1)


def unpack_cov(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 3) packed blocks -> (..., 8, 8) dense covariance."""
    idx = jnp.arange(4)
    dense = jnp.zeros(packed.shape[:-2] + (8, 8), packed.dtype)
    dense = dense.at[..., idx, idx].set(packed[..., 0])
    dense = dense.at[..., idx, idx + 4].set(packed[..., 1])
    dense = dense.at[..., idx + 4, idx].set(packed[..., 1])
    dense = dense.at[..., idx + 4, idx + 4].set(packed[..., 2])
    return dense


def _meas_stds(h: jnp.ndarray, pos_w: float, vel_w: float | None,
               a_std: float, va_std: float | None):
    """Per-coordinate (cx, cy, a, h) std stacks used by Q/R/P0."""
    pos = jnp.stack([pos_w * h, pos_w * h, jnp.full_like(h, a_std), pos_w * h],
                    axis=-1)
    if vel_w is None:
        return pos
    vel = jnp.stack([vel_w * h, vel_w * h, jnp.full_like(h, va_std), vel_w * h],
                    axis=-1)
    return pos, vel


def initiate(measurement: jnp.ndarray) -> KalmanState:
    """Create filter state from unassociated measurements (..., 4)."""
    mean = jnp.concatenate([measurement, jnp.zeros_like(measurement)], axis=-1)
    h = measurement[..., 3]
    p_std, v_std = _meas_stds(h, 2 * STD_WEIGHT_POS, 10 * STD_WEIGHT_VEL,
                              1e-2, 1e-5)
    cov = jnp.stack([p_std**2, jnp.zeros_like(p_std), v_std**2], axis=-1)
    return KalmanState(mean, cov)


def predict(state: KalmanState) -> KalmanState:
    """Batched predict: mean' = F mean; per-block P' = F2 P F2^T + diag(q).

    With F2 = [[1, 1], [0, 1]]:
      pp' = pp + 2 pv + vv + q_pos;  pv' = pv + vv;  vv' = vv + q_vel.
    """
    h = state.mean[..., 3]
    q_pos, q_vel = _meas_stds(h, STD_WEIGHT_POS, STD_WEIGHT_VEL, 1e-2, 1e-5)
    pp, pv, vv = state.pp, state.pv, state.vv
    cov = jnp.stack([pp + 2 * pv + vv + q_pos**2, pv + vv, vv + q_vel**2],
                    axis=-1)
    mean = jnp.concatenate(
        [state.mean[..., :4] + state.mean[..., 4:], state.mean[..., 4:]], axis=-1)
    return KalmanState(mean, cov)


def update(state: KalmanState, measurement: jnp.ndarray) -> KalmanState:
    """Batched update with measurements (..., 4).

    Innovation covariance is diagonal (S_i = pp_i + r_i), so the Kalman gain
    is two scalars per coordinate: K_p = pp/S, K_v = pv/S - no linear solve.
    """
    h_meas = state.mean[..., 3]
    r_std = _meas_stds(h_meas, STD_WEIGHT_POS, None, 1e-1, None)
    # floor: a zero-height box (edge-clipped detection) gives s = 0 and
    # k = 0/0 = NaN, permanently poisoning the track state
    s = jnp.maximum(state.pp + r_std**2, 1e-9)                # (..., 4)
    k_p = state.pp / s
    k_v = state.pv / s
    innov = measurement - state.mean[..., :4]                 # (..., 4)
    mean = jnp.concatenate(
        [state.mean[..., :4] + k_p * innov, state.mean[..., 4:] + k_v * innov],
        axis=-1)
    # Joseph-free standard form: P' = (I - K H) P
    pp = (1.0 - k_p) * state.pp
    pv = (1.0 - k_p) * state.pv
    vv = state.vv - k_v * state.pv
    return KalmanState(mean, jnp.stack([pp, pv, vv], axis=-1))


def gating_distance(state: KalmanState, measurements: jnp.ndarray) -> jnp.ndarray:
    """Squared Mahalanobis distance of measurements (..., M, 4) from each
    predicted state (optional gating, as in canonical ByteTrack).  Diagonal
    innovation covariance -> elementwise division, no solve."""
    h = state.mean[..., 3]
    r_std = _meas_stds(h, STD_WEIGHT_POS, None, 1e-1, None)
    s = jnp.maximum(state.pp + r_std**2, 1e-9)                # (..., 4)
    d = measurements - state.mean[..., None, :4]              # (..., M, 4)
    return jnp.sum(d * d / s[..., None, :], axis=-1)
