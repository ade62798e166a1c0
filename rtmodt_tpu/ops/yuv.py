"""Packed I420 (YUV 4:2:0) frame transport: host pack + device unpack.

Why this exists: the host->device link is the scarce resource in a streaming
vision pipeline (SURVEY.md 7 hard part 3).  Video decoders natively emit
YUV 4:2:0 (12 bits/px); converting to BGR on the host and shipping 24 bits/px
- what the reference effectively does by handing cv2 BGR frames to CUDA -
doubles the transfer volume for zero information gain.  This module ships the
decoder-native representation, already resized to the model's content size,
and fuses chroma upsampling + BT.601 YUV->RGB + /255 normalization into the
jitted step on the TPU's vector units.

720p BGR frame: 2.76 MB  ->  640x384 I420 content: 0.37 MB  (7.5x less)

Host side uses cv2 (resize + COLOR_BGR2YUV_I420); device side is pure jnp.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rtmodt_tpu.ops.letterbox import LetterboxMeta, letterbox_meta


def content_dims(src_h: int, src_w: int, size: int) -> tuple[int, int]:
    """Letterbox content (h, w) rounded to even (I420 needs even dims)."""
    m = letterbox_meta(src_h, src_w, size)
    return (m.new_h // 2) * 2, (m.new_w // 2) * 2


def packed_meta(src_h: int, src_w: int, size: int) -> LetterboxMeta:
    """LetterboxMeta of the packed-I420 geometry - the ONE place the
    even-rounding convention lives: content dims rounded to even (I420
    chroma) and pads rounded DOWN to even so the half-res chroma grid
    stays aligned (<= 1 px shift vs ultralytics centering)."""
    ch, cw = content_dims(src_h, src_w, size)
    scale = min(ch / src_h, cw / src_w)
    pad_left = (int(round((size - cw) / 2 - 0.1)) // 2) * 2
    pad_top = (int(round((size - ch) / 2 - 0.1)) // 2) * 2
    return LetterboxMeta(scale, pad_left, pad_top, cw, ch, src_w, src_h)


def unletterbox_boxes_packed(boxes_xyxy: jnp.ndarray,
                             meta: LetterboxMeta) -> jnp.ndarray:
    """Exact inverse for the PACKED geometry: even-rounding makes the two
    axes scale unequally (e.g. new_h 361 -> 360 while new_w stays 640), so
    this divides each axis by its REALIZED scale (new/src) instead of the
    nominal isotropic ``meta.scale`` - a single-scale inverse skews the
    non-min axis by up to a few source pixels on odd-sized inputs.
    (``ops.letterbox.unletterbox_boxes`` keeps the isotropic division for
    ultralytics scale_boxes parity on the unpacked path.)"""
    shift = jnp.array([meta.pad_left, meta.pad_top, meta.pad_left, meta.pad_top],
                      dtype=boxes_xyxy.dtype)
    sx = meta.new_w / meta.src_w
    sy = meta.new_h / meta.src_h
    scale = jnp.array([sx, sy, sx, sy], dtype=boxes_xyxy.dtype)
    out = (boxes_xyxy - shift) / scale
    lim = jnp.array([meta.src_w, meta.src_h, meta.src_w, meta.src_h],
                    dtype=out.dtype)
    return jnp.clip(out, 0.0, lim)


def pack_i420(frame_bgr: np.ndarray, size: int) -> tuple[np.ndarray, LetterboxMeta]:
    """Resize to letterbox content size and pack as I420 planar uint8.

    Returns (yuv (ch*3/2, cw) uint8, meta) where meta maps model coords back
    to source coords (same convention as ops.letterbox).  Thin wrapper over
    :func:`pack_chunk` (shared native/cv2 dispatch) that lays the planes out
    in the single-buffer I420 order: Y rows, then U and V flat-reshaped to
    ``cw``-wide rows.
    """
    (y, u, v), meta = pack_chunk(frame_bgr[None], size)
    ch, cw = meta.new_h, meta.new_w
    yuv = np.empty((ch * 3 // 2, cw), np.uint8)
    yuv[:ch] = y[0]
    flat = yuv[ch:].reshape(-1)
    n_chroma = (ch // 2) * (cw // 2)
    flat[:n_chroma] = u[0].reshape(-1)
    flat[n_chroma:] = v[0].reshape(-1)
    return yuv, meta


def pack_i420_planar(frame_bgr: np.ndarray, size: int):
    """Like :func:`pack_i420` but returns separate (y, u, v) planes - the
    transport layout the device decodes cheapest (no cross-lane reshapes).

    Returns ((y (ch, cw), u (ch/2, cw/2), v (ch/2, cw/2)) uint8, meta).
    """
    (y, u, v), meta = pack_chunk(frame_bgr[None], size)
    return (y[0], u[0], v[0]), meta


def planar_letterbox(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                     size: int, pad_left: int, pad_top: int,
                     dtype=jnp.bfloat16, pad_value: float = 114.0) -> jnp.ndarray:
    """Planar I420 -> padded normalized RGB (size, size, 3), bf16 throughout.

    Chroma upsample + BT.601 + /255 + letterbox pad in one fused graph; all
    arithmetic in the compute dtype, single (h, w, 3) materialization.
    """
    ch, cw = y.shape
    yf = y.astype(dtype)
    uf = u.astype(dtype) - jnp.asarray(128.0, dtype)
    vf = v.astype(dtype) - jnp.asarray(128.0, dtype)

    def up2(p):
        p = jnp.broadcast_to(p[:, None, :, None], (ch // 2, 2, cw // 2, 2))
        return p.reshape(ch, cw)

    uf = up2(uf)
    vf = up2(vf)
    scale = jnp.asarray(1.0 / 255.0, dtype)
    r = (yf + jnp.asarray(1.403, dtype) * vf) * scale
    g = (yf - jnp.asarray(0.344, dtype) * uf - jnp.asarray(0.714, dtype) * vf) * scale
    b = (yf + jnp.asarray(1.773, dtype) * uf) * scale
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
    pad_bottom = size - ch - pad_top
    pad_right = size - cw - pad_left
    return jnp.pad(rgb, ((pad_top, pad_bottom), (pad_left, pad_right), (0, 0)),
                   constant_values=jnp.asarray(pad_value / 255.0, dtype))


def pack_chunk(frames_bgr: np.ndarray, size: int,
               out: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None):
    """Pack a (N, H, W, 3) BGR chunk into planar I420 chunk arrays.

    Writes into preallocated (y, u, v) chunk buffers when given (no
    intermediate np.stack allocations - this path runs on ingest worker
    threads where cv2 releases the GIL for the heavy ops).
    Returns ((y (N, ch, cw), u, v), meta).

    Dispatch: the production geometries are exact integer downsamples
    (720p -> 640x360 is 2x, 1080p -> 640x360 is 3x), where the native
    AVX-512 packer (rtmodt_tpu/native/framepack.cpp) fuses resize +
    BGR->I420 into one GIL-free sweep ~1.5x faster than cv2's two passes;
    other geometries use cv2 resize + cvtColor per frame.
    """
    import cv2

    n, h, w = frames_bgr.shape[:3]
    ch, cw = content_dims(h, w, size)

    from rtmodt_tpu.native import native_pack_wins, pack_i420_chunk_native

    if native_pack_wins(h, w, ch, cw):
        res = pack_i420_chunk_native(frames_bgr, ch, cw, out=out)
        if res is not None:
            return res, packed_meta(h, w, size)

    if out is None:
        out = (np.empty((n, ch, cw), np.uint8),
               np.empty((n, ch // 2, cw // 2), np.uint8),
               np.empty((n, ch // 2, cw // 2), np.uint8))
    y, u, v = out
    n_chroma = (ch // 2) * (cw // 2)
    meta = None
    for i in range(n):
        resized = cv2.resize(frames_bgr[i], (cw, ch), interpolation=cv2.INTER_LINEAR)
        yuv = cv2.cvtColor(resized, cv2.COLOR_BGR2YUV_I420)
        y[i] = yuv[:ch]
        chroma = yuv[ch:].reshape(-1)
        u[i] = chroma[:n_chroma].reshape(ch // 2, cw // 2)
        v[i] = chroma[n_chroma:2 * n_chroma].reshape(ch // 2, cw // 2)
    return (y, u, v), packed_meta(h, w, size)


def planes_to_x6(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                 out: np.ndarray | None = None) -> np.ndarray:
    """Host-side space-to-depth transport packing: planar I420 chunk ->
    one ``(N, ch/2, cw/2, 6)`` uint8 tensor in the exact channel order the
    s2d front consumes (``ops.planar_stem.make_x6``: Y parity channels
    ``2p + q`` first, then U, V).

    Why on the host: the device-side ``make_x6`` reshape+transpose is a
    byte-granular lane shuffle the VPU runs at ~6 GB/s - ~0.065 ms/frame of
    the chunk program (docs/PERF_NOTES.md round-2 remainder list).  The same
    rearrangement on the ingest worker is a strided numpy copy that
    overlaps device compute, and the link bytes are IDENTICAL to planar
    I420 (12 bit/px, content dims only - padding still happens on device).
    """
    n, ch, cw = y.shape
    if out is None:
        out = np.empty((n, ch // 2, cw // 2, 6), np.uint8)
    ys = y.reshape(n, ch // 2, 2, cw // 2, 2)
    out[..., 0] = ys[:, :, 0, :, 0]
    out[..., 1] = ys[:, :, 0, :, 1]
    out[..., 2] = ys[:, :, 1, :, 0]
    out[..., 3] = ys[:, :, 1, :, 1]
    out[..., 4] = u
    out[..., 5] = v
    return out


def planes_to_x24(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                  out: np.ndarray | None = None) -> np.ndarray:
    """Host-side DOUBLE space-to-depth packing: planar I420 chunk ->
    ``(N, ch/4, cw/4, 24)`` uint8, channel ``c6 * 4 + g2`` where ``c6`` is
    the x6 channel (4 Y parities, U, V - ops/planar_stem.py::make_x6
    order) and ``g2 = 2*p2 + q2`` the second-level 2x2 parity.

    Why a second octave: the x6 stem conv runs the MXU at ~9 TF/s because
    only 6 of its 128 input lanes are live (round-5 trace attribution,
    docs/PERF_NOTES.md).  Re-blocking the input to 24 channels at quarter
    resolution turns the stem into a 2x2 stride-1 conv over 24 lanes -
    identical arithmetic (s2d_front.py::_pack_in24_kernel), 4x the lane
    occupancy.  Link bytes are IDENTICAL to x6/planar I420.  Requires
    content dims divisible by 4 and letterbox pads divisible by 4 (the
    blocking must commute with padding); callers fall back to x6
    otherwise (Pipeline._s2d_level).
    """
    n, ch, cw = y.shape
    if out is None:
        out = np.empty((n, ch // 4, cw // 4, 24), np.uint8)
    # 24 per-channel strided slice-copies measured FASTER than one
    # blocked 7-axis transpose-copy (0.62 vs 1.35 ms/frame, 128-frame
    # 720p blocks, idle host) - numpy's simple strided copy loop beats
    # its generic transpose path here.  Full-res row r = 4I + m with
    # m = 2*p2 + p1; col likewise.
    ys = y.reshape(n, ch // 4, 4, cw // 4, 4)
    for m in range(4):
        p2, p1 = divmod(m, 2)
        for mm in range(4):
            q2, q1 = divmod(mm, 2)
            out[..., (2 * p1 + q1) * 4 + 2 * p2 + q2] = ys[:, :, m, :, mm]
    us = u.reshape(n, ch // 4, 2, cw // 4, 2)
    vs = v.reshape(n, ch // 4, 2, cw // 4, 2)
    for p2 in (0, 1):
        for q2 in (0, 1):
            out[..., 16 + 2 * p2 + q2] = us[:, :, p2, :, q2]
            out[..., 20 + 2 * p2 + q2] = vs[:, :, p2, :, q2]
    return out


def pack_x6_chunk(frames_bgr: np.ndarray, size: int,
                  out: np.ndarray | None = None,
                  scratch=None):
    """Pack a (N, H, W, 3) BGR chunk straight to the x6 s2d transport.

    Composition of :func:`pack_chunk` (native/cv2 resize + BGR->I420) and
    :func:`planes_to_x6`; ``scratch`` optionally carries preallocated
    (y, u, v) plane buffers between calls.  Returns (x6, meta).
    """
    planes, meta = pack_chunk(frames_bgr, size, out=scratch)
    return planes_to_x6(*planes, out=out), meta


def i420_to_rgb(yuv: jnp.ndarray, ch: int, cw: int,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """Device-side I420 -> RGB [0,1] (ch, cw, 3). Fused VPU math under jit.

    cv2's I420 is full-range BT.601: R = Y + 1.403 (V-128),
    G = Y - 0.344 (U-128) - 0.714 (V-128), B = Y + 1.773 (U-128).
    Chroma is upsampled 2x nearest (matching cv2.COLOR_YUV2BGR_I420).
    """
    f32 = jnp.float32
    y = yuv[:ch].astype(f32)
    n_chroma = (ch // 2) * (cw // 2)
    chroma = yuv[ch:].reshape(-1)
    u = chroma[:n_chroma].reshape(ch // 2, cw // 2).astype(f32) - 128.0
    v = chroma[n_chroma:2 * n_chroma].reshape(ch // 2, cw // 2).astype(f32) - 128.0

    def up2(p):  # nearest 2x chroma upsample via broadcast/reshape (no gather)
        p = jnp.broadcast_to(p[:, None, :, None], (ch // 2, 2, cw // 2, 2))
        return p.reshape(ch, cw)

    u = up2(u)
    v = up2(v)
    r = y + 1.403 * v
    g = y - 0.344 * u - 0.714 * v
    b = y + 1.773 * u
    rgb = jnp.stack([r, g, b], axis=-1)
    return (jnp.clip(rgb, 0.0, 255.0) * (1.0 / 255.0)).astype(dtype)


def letterbox_from_i420(yuv: jnp.ndarray, ch: int, cw: int, size: int,
                        pad_left: int, pad_top: int,
                        dtype=jnp.bfloat16, pad_value: float = 114.0) -> jnp.ndarray:
    """Full device-side preprocessing from packed I420: unpack -> RGB ->
    pad to (size, size, 3) normalized - ready for the first conv."""
    rgb = i420_to_rgb(yuv, ch, cw, dtype)
    pad_bottom = size - ch - pad_top
    pad_right = size - cw - pad_left
    return jnp.pad(
        rgb,
        ((pad_top, pad_bottom), (pad_left, pad_right), (0, 0)),
        constant_values=jnp.asarray(pad_value / 255.0, dtype),
    )
