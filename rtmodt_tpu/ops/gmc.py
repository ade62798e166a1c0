"""Global (camera) motion estimation on device: FFT phase correlation.

Kalman trackers assume a static camera: a pan/tilt makes every track's
prediction miss sideways at once, the IoU gate fails fleet-wide, and ids
churn (BoT-SORT, Aharon et al. 2022, measured this as the dominant failure
on moving-camera MOT).  BoT-SORT's fix is a host-side OpenCV sparse-flow
affine per frame.  The TPU-native formulation estimates the dominant
TRANSLATION by phase correlation of consecutive downsampled luma grids -
two tiny FFTs and an argmax that ride the SAME XLA program as detection
(the luma plane is already on device in the packed I420 paths), so
compensation costs no host round trip and no extra dispatch.

Scope: translation covers pan/tilt - the dominant component of PTZ and
vehicle-mounted motion.  Rotation/zoom would need a log-polar second stage;
out of scope (BoT-SORT's own affine is near-identity rotation in practice).

The reference (gabbarX RTMODT) has no camera-motion handling at all
(src/tracking/tracker.py runs raw IoU on Kalman predictions); this is a
framework extension, off by default (``tracking.gmc.method: none``).

Sign convention: ``phase_shift`` returns the CONTENT displacement d such
that cur(x) ~= prev(x - d), i.e. how far scene content moved in image
coordinates.  Track state stored in previous-frame coordinates is brought
into current-frame coordinates by adding d (``compensate``).
"""

from __future__ import annotations

import jax.numpy as jnp


def half_res_luma(y: jnp.ndarray) -> jnp.ndarray:
    """2x2 box-average a (H, W) luma plane to half resolution (f32).

    Numerically identical to the mean of the four Y parity channels of
    the x6 space-to-depth transport (``ops/yuv.py::planes_to_x6``,
    channels 0-3), so ``luma_grid(half_res_luma(y))`` on the planar-I420
    path and ``luma_grid(mean(x6[..., :4]))`` on the x6 path produce the
    same grids: GMC shift estimates do not depend on the transport choice
    (ADVICE round 4 - they used to differ because i420 resized from full
    res while x6 pooled one octave first).
    """
    h, w = y.shape
    return y.astype(jnp.float32).reshape(h // 2, 2, w // 2, 2).mean((1, 3))


def s2d_half_luma(x6: jnp.ndarray) -> jnp.ndarray:
    """Half-res luma from one x6 frame (H/2, W/2, 6): mean of the four Y
    parity channels - bit-identical to ``half_res_luma`` of the full-res
    Y plane (the parities ARE the 2x2 block samples)."""
    return jnp.mean(x6[..., :4].astype(jnp.float32), axis=-1)


def x24_half_luma(x24: jnp.ndarray) -> jnp.ndarray:
    """Half-res luma from one x24 frame (H/4, W/4, 24).

    Channel ``c6*4 + g2`` (ops/yuv.py::planes_to_x24): the 16 Y channels
    hold the 4 first-level parities (c6) at each of the 4 second-level
    parities (g2).  Mean over c6 gives the half-res luma of each
    second-level parity; a depth-to-space 2x2 restores the (H/2, W/2)
    grid - bit-identical to the x6 / pooled-i420 paths, so GMC shift
    estimates stay transport-independent at every level."""
    h4, w4 = x24.shape[0], x24.shape[1]
    m = x24[..., :16].astype(jnp.float32).reshape(h4, w4, 4, 4).mean(axis=-2)
    return m.reshape(h4, w4, 2, 2).transpose(0, 2, 1, 3).reshape(
        h4 * 2, w4 * 2)


def luma_grid(img: jnp.ndarray, grid: int = 128) -> jnp.ndarray:
    """Downsample a frame to a fixed (grid, grid) f32 luma raster.

    ``img``: (H, W) luma plane (uint8/float) or (H, W, 3) BGR/RGB uint8 -
    channel mean is luma enough for correlation (the exact BT.601 weights
    don't change where the peak is).  Resize is bilinear (jax.image), so
    the op stays a pair of small matmuls on device.
    """
    import jax

    img = img.astype(jnp.float32)
    if img.ndim == 3:
        img = img.mean(axis=-1)
    if img.shape == (grid, grid):       # already a grid: exact passthrough
        return img
    return jax.image.resize(img, (grid, grid), method="linear")


def _hann2d(n: int) -> jnp.ndarray:
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)
    return w[:, None] * w[None, :]


def phase_shift(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    min_ratio: float = 1.5,
    max_shift_frac: float = 0.25,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Translation between two (G, G) luma grids by phase correlation.

    Returns ``(shift_xy (2,) f32, conf () f32)``: the content displacement
    in GRID units (dx, dy) and the peak-to-second-peak ratio used to gate
    it.  Absolute peak height varies ~5x with scene bandwidth, so the
    confidence is the RATIO of the main peak to the highest peak outside
    its 15x15 neighborhood (classic PSR idea): >= ~3 on real pans, ~1.1 on
    uncorrelated frames (scene cuts), 0 on flat frames.  The shift is
    zeroed when ``conf < min_ratio`` or the wrap-unambiguous range is
    exceeded (``|shift| > G * max_shift_frac``) - a wrong confident shift
    is worse for the tracker than none.

    Textbook Kuglin-Hines: with cur(x) = prev(x - d), the normalized cross
    power spectrum F(cur) * conj(F(prev)) / |.| equals exp(-i 2 pi k d / G),
    whose inverse FFT is a delta at d (circularly).  Hann windowing kills
    the wrap-around edge correlation; a 3-point parabolic fit around the
    peak recovers the sub-pixel fraction.
    """
    g = prev.shape[-1]
    w = _hann2d(g)
    a = (prev - prev.mean()) * w
    b = (cur - cur.mean()) * w
    fa = jnp.fft.rfft2(a)
    fb = jnp.fft.rfft2(b)
    r = fb * jnp.conj(fa)
    r = r / (jnp.abs(r) + 1e-9)
    corr = jnp.fft.irfft2(r, s=(g, g))                        # (G, G)

    flat = jnp.argmax(corr)
    py, px = flat // g, flat % g
    peak = corr.reshape(-1)[flat]

    # second peak outside the (2*excl+1)^2 circular neighborhood of the
    # main one; excl=7 clears the broad main lobe of smooth scenes
    excl = 7
    iy = (jnp.arange(g)[:, None] - py + g // 2) % g - g // 2
    ix = (jnp.arange(g)[None, :] - px + g // 2) % g - g // 2
    near = (jnp.abs(iy) <= excl) & (jnp.abs(ix) <= excl)
    second = jnp.max(jnp.where(near, -jnp.inf, corr))
    conf = peak / jnp.maximum(second, 1e-9)

    def _axis(p, left, right):
        """Wrap to signed + parabolic sub-pixel along one axis."""
        denom = left - 2.0 * peak + right
        frac = jnp.where(jnp.abs(denom) > 1e-9,
                         0.5 * (left - right) / denom, 0.0)
        frac = jnp.clip(frac, -0.5, 0.5)
        signed = ((p + g // 2) % g) - g // 2
        return signed.astype(jnp.float32) + frac

    dy = _axis(py, corr[(py - 1) % g, px], corr[(py + 1) % g, px])
    dx = _axis(px, corr[py, (px - 1) % g], corr[py, (px + 1) % g])

    limit = g * max_shift_frac
    ok = (conf >= min_ratio) & (peak > 1e-6) \
        & (jnp.abs(dx) <= limit) & (jnp.abs(dy) <= limit)
    shift = jnp.where(ok, jnp.stack([dx, dy]), jnp.zeros((2,), jnp.float32))
    return shift, conf


def gmc_step(state, luma_src, carry, cfg, scale_xy):
    """One camera-motion-compensation step for a jitted detect+track program.

    Downsample this frame's luma, phase-correlate against the carried
    previous grid, and shift the track state into current-frame
    coordinates.  ``carry`` is ``(prev_grid (G, G) f32, valid () f32)``;
    ``valid=0`` silences the first frame after init/reset.  ``scale_xy``
    is the static (grid->source-px) factor pair.  Returns
    ``(state', (cur_grid, 1.0))``.  Works per-stream under ``jax.vmap``
    (the constant validity broadcasts across the batch).
    """
    prev, valid = carry
    cur = luma_grid(luma_src, cfg.grid)
    shift, _ = phase_shift(prev, cur, cfg.min_ratio, cfg.max_shift_frac)
    state = compensate(
        state, shift * valid * jnp.asarray(scale_xy, jnp.float32))
    return state, (cur, jnp.float32(1.0))


# Track-state fields holding xyxy boxes (any leading batch axes): shifted by
# (dx, dy, dx, dy).  kf_mean holds (cx, cy, a, h, velocities): positions
# shift, aspect/height/velocities don't; the covariance is INVARIANT under
# pure translation (BoT-SORT rotates it only because its affine may rotate).
_BOX_FIELDS = frozenset({"boxes", "last_obs", "obs_ring"})


def compensate(state, shift_xy: jnp.ndarray):
    """Bring a fixed-slot tracker state (TrackState / DeepSortState /
    OCSortState - any NamedTuple with the shared field layout) from
    previous-frame into current-frame coordinates.

    ``shift_xy``: (2,) f32 content displacement in SOURCE pixels.  Works
    batched: leading stream axes on the state broadcast against the
    trailing-dim update.  Inactive slots shift too - harmless, their
    contents are dead until a birth overwrites them.

    OC-SORT note: ``velocity`` (unit inter-observation direction) is left
    as stored; with per-frame compensation consecutive observations live in
    almost-identical compensated frames, so the error is bounded by one
    frame of residual motion (same approximation BoT-SORT ships).
    """
    shift_xy = shift_xy.astype(jnp.float32)
    d4 = jnp.concatenate([shift_xy, shift_xy])                 # (4,)
    upd = {}
    for name in state._fields:
        if name in _BOX_FIELDS:
            upd[name] = getattr(state, name) + d4
        elif name == "kf_mean":
            km = getattr(state, name)
            upd[name] = km.at[..., 0:2].add(shift_xy)
    return state._replace(**upd)
