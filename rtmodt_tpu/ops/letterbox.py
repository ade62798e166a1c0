"""Device-side letterbox preprocessing.

Replaces the reference's CPU preprocessing inside ``ultralytics.YOLO.predict``
(letterbox resize + BGR->RGB + /255 + HWC->CHW + fp16 cast; documented at
reference ``TECHNICAL_DESIGN_DOCUMENT.md:333-339`` and SURVEY.md N2).  Here the
raw uint8 frame is shipped to the TPU once and everything else happens on
device with static shapes, so it fuses with the first conv of the network.

Geometry matches ultralytics' LetterBox: scale ``r = min(S/h, S/w)``, resize to
``(round(h*r), round(w*r))`` bilinear, center-pad to ``SxS`` with value 114,
pad split as ``round(d - 0.1) / round(d + 0.1)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LetterboxMeta(NamedTuple):
    """Static geometry of one letterbox transform (Python floats/ints)."""

    scale: float
    pad_left: int
    pad_top: int
    new_w: int
    new_h: int
    src_w: int
    src_h: int


def letterbox_meta(src_h: int, src_w: int, size: int) -> LetterboxMeta:
    r = min(size / src_h, size / src_w)
    new_w, new_h = round(src_w * r), round(src_h * r)
    dw, dh = (size - new_w) / 2.0, (size - new_h) / 2.0
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    return LetterboxMeta(r, left, top, new_w, new_h, src_w, src_h)


def letterbox(
    frame_u8: jnp.ndarray,
    size: int,
    dtype: jnp.dtype = jnp.bfloat16,
    bgr_to_rgb: bool = True,
    pad_value: float = 114.0,
) -> tuple[jnp.ndarray, LetterboxMeta]:
    """uint8 (H, W, 3) frame -> normalized (size, size, 3) tensor + geometry.

    All shapes are static (derived from the traced input's shape), so this is
    one fused XLA op-graph: resize, pad, channel-swap, and /255 normalize.
    Output is NHWC-style HWC (TPU-friendly channels-last).
    """
    h, w = int(frame_u8.shape[0]), int(frame_u8.shape[1])
    meta = letterbox_meta(h, w, size)
    x = frame_u8.astype(dtype)
    if bgr_to_rgb:
        x = x[..., ::-1]
    # antialias=False: ultralytics preprocesses with cv2.INTER_LINEAR, which
    # is plain half-pixel-center bilinear with no antialias prefilter; the
    # default antialiased downscale would diverge from the reference pixels
    # (parity oracle: ops/letterbox_ref.py, tests/test_letterbox_parity.py)
    x = jax.image.resize(x, (meta.new_h, meta.new_w, 3), method="bilinear",
                         antialias=False)
    pad_bottom = size - meta.new_h - meta.pad_top
    pad_right = size - meta.new_w - meta.pad_left
    x = jnp.pad(
        x,
        ((meta.pad_top, pad_bottom), (meta.pad_left, pad_right), (0, 0)),
        constant_values=jnp.asarray(pad_value, dtype),
    )
    return x * jnp.asarray(1.0 / 255.0, dtype), meta


def unletterbox_boxes(boxes_xyxy: jnp.ndarray, meta: LetterboxMeta) -> jnp.ndarray:
    """Map xyxy boxes from model (letterboxed) coords back to source-frame coords,
    clipped to the source image - the analog of ultralytics' scale_boxes."""
    shift = jnp.array([meta.pad_left, meta.pad_top, meta.pad_left, meta.pad_top],
                      dtype=boxes_xyxy.dtype)
    out = (boxes_xyxy - shift) / meta.scale
    lim = jnp.array([meta.src_w, meta.src_h, meta.src_w, meta.src_h], dtype=out.dtype)
    return jnp.clip(out, 0.0, lim)
