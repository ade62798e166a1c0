"""Batched constant-velocity Kalman filter (ByteTrack-style) in JAX.

The reference declares ``filterpy`` but never uses it - its in-repo ByteTrack
has NO motion model (SURVEY.md N10; reference ``src/tracking/tracker.py``
associates against raw last boxes).  Real ByteTrack uses this filter, and the
north-star baseline requires it, so it is built here as a first-class batched
op: all track slots predict/update in parallel as (N, 8) means and (N, 8, 8)
covariances - pure einsum/solve work that XLA fuses into the tracking step.

State: (cx, cy, a, h, vcx, vcy, va, vh) with aspect a = w/h.
Measurement: (cx, cy, a, h).  Noise scales with box height, matching the
canonical ByteTrack/DeepSORT implementation constants (1/20 position,
1/160 velocity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

STD_WEIGHT_POS = 1.0 / 20.0
STD_WEIGHT_VEL = 1.0 / 160.0


class KalmanState(NamedTuple):
    mean: jnp.ndarray  # (N, 8)
    cov: jnp.ndarray   # (N, 8, 8)


def _motion_mat(dtype=jnp.float32) -> jnp.ndarray:
    f = jnp.eye(8, dtype=dtype)
    return f.at[:4, 4:].set(jnp.eye(4, dtype=dtype))  # x' = x + v * dt (dt=1 frame)


def initiate(measurement: jnp.ndarray) -> KalmanState:
    """Create filter state from unassociated measurements (..., 4)."""
    mean = jnp.concatenate([measurement, jnp.zeros_like(measurement)], axis=-1)
    h = measurement[..., 3]
    std = jnp.stack(
        [
            2 * STD_WEIGHT_POS * h,
            2 * STD_WEIGHT_POS * h,
            jnp.full_like(h, 1e-2),
            2 * STD_WEIGHT_POS * h,
            10 * STD_WEIGHT_VEL * h,
            10 * STD_WEIGHT_VEL * h,
            jnp.full_like(h, 1e-5),
            10 * STD_WEIGHT_VEL * h,
        ],
        axis=-1,
    )
    return KalmanState(mean, _diag_embed(std**2))


def _diag_embed(d: jnp.ndarray) -> jnp.ndarray:
    """(..., K) -> (..., K, K) diagonal matrices."""
    k = d.shape[-1]
    return d[..., :, None] * jnp.eye(k, dtype=d.dtype)


def predict(state: KalmanState) -> KalmanState:
    """Batched predict step: mean' = F mean, P' = F P F^T + Q(h)."""
    f = _motion_mat(state.mean.dtype)
    h = state.mean[..., 3]
    std = jnp.stack(
        [
            STD_WEIGHT_POS * h,
            STD_WEIGHT_POS * h,
            jnp.full_like(h, 1e-2),
            STD_WEIGHT_POS * h,
            STD_WEIGHT_VEL * h,
            STD_WEIGHT_VEL * h,
            jnp.full_like(h, 1e-5),
            STD_WEIGHT_VEL * h,
        ],
        axis=-1,
    )
    q = _diag_embed(std**2)
    mean = jnp.einsum("ij,...j->...i", f, state.mean)
    cov = jnp.einsum("ij,...jk,lk->...il", f, state.cov, f) + q
    return KalmanState(mean, cov)


def update(state: KalmanState, measurement: jnp.ndarray) -> KalmanState:
    """Batched update with measurements (..., 4).

    Uses an explicit 4x4 solve (H is a selector of the first 4 state dims, so
    S = P[:4,:4] + R) - small dense algebra the TPU handles inline.
    """
    h_meas = state.mean[..., 3]
    std = jnp.stack(
        [
            STD_WEIGHT_POS * h_meas,
            STD_WEIGHT_POS * h_meas,
            jnp.full_like(h_meas, 1e-1),
            STD_WEIGHT_POS * h_meas,
        ],
        axis=-1,
    )
    r = _diag_embed(std**2)                                  # (..., 4, 4)
    p = state.cov
    s = p[..., :4, :4] + r                                    # innovation cov
    pht = p[..., :, :4]                                       # P H^T  (..., 8, 4)
    # K = P H^T S^{-1}  -> solve S^T K^T = (P H^T)^T
    kt = jnp.linalg.solve(jnp.swapaxes(s, -1, -2), jnp.swapaxes(pht, -1, -2))
    gain = jnp.swapaxes(kt, -1, -2)                           # (..., 8, 4)
    innov = measurement - state.mean[..., :4]
    mean = state.mean + jnp.einsum("...ij,...j->...i", gain, innov)
    cov = p - jnp.einsum("...ij,...jk->...ik", gain, p[..., :4, :])
    return KalmanState(mean, cov)


def gating_distance(state: KalmanState, measurements: jnp.ndarray) -> jnp.ndarray:
    """Squared Mahalanobis distance of measurements (..., M, 4) from each
    predicted state (optional gating, as in canonical ByteTrack)."""
    h = state.mean[..., 3]
    std = jnp.stack(
        [
            STD_WEIGHT_POS * h,
            STD_WEIGHT_POS * h,
            jnp.full_like(h, 1e-1),
            STD_WEIGHT_POS * h,
        ],
        axis=-1,
    )
    s = state.cov[..., :4, :4] + _diag_embed(std**2)
    d = measurements - state.mean[..., None, :4]              # (..., M, 4)
    sol = jnp.linalg.solve(s[..., None, :, :], d[..., :, None])[..., 0]
    return jnp.sum(d * sol, axis=-1)
