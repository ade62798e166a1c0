"""Batched ROI crop-and-resize on device (bilinear, static shapes).

The reference's DeepSORT path (declared at ``config/default.yaml:53-60``,
never implemented) would crop detection patches on CPU and feed a separate
embedder process.  TPU-native: all ``max_det`` boxes are sampled from the
frame tensor in ONE vectorized bilinear gather, producing a fixed
``(D, crop_h, crop_w, C)`` patch batch that feeds the appearance embedder
inside the same XLA program as detect+track.

Degenerate boxes (zero area - padded/invalid detections) sample a clamped
single pixel, which is harmless: invalid slots are masked downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_and_resize(
    image: jnp.ndarray,        # (H, W, C) any float/int dtype
    boxes: jnp.ndarray,        # (D, 4) xyxy in image coordinates
    crop_hw: tuple[int, int],  # static output (h, w)
) -> jnp.ndarray:
    """Bilinear crop+resize of every box -> (D, h, w, C) float32.

    Sampling follows the align_corners=False convention: output pixel i
    samples source coordinate ``lo + (i + 0.5) * extent / out - 0.5``,
    clamped to the image - matching ``cv2.resize`` of a tight crop.
    """
    h_img, w_img = image.shape[0], image.shape[1]
    oh, ow = crop_hw
    img = image.astype(jnp.float32)

    def one(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        ys = y1 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (y2 - y1) / oh - 0.5
        xs = x1 + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (x2 - x1) / ow - 0.5
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        wy = (ys - y0)[:, None]                       # (oh, 1)
        wx = (xs - x0)[None, :]                       # (1, ow)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h_img - 1)
        y1i = jnp.clip(y0i + 1, 0, h_img - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w_img - 1)
        x1i = jnp.clip(x0i + 1, 0, w_img - 1)
        # gather the 4 corner planes: (oh, ow, C)
        tl = img[y0i][:, x0i]
        tr = img[y0i][:, x1i]
        bl = img[y1i][:, x0i]
        br = img[y1i][:, x1i]
        top = tl + (tr - tl) * wx[..., None]
        bot = bl + (br - bl) * wx[..., None]
        return top + (bot - top) * wy[..., None]

    return jax.vmap(one)(boxes.astype(jnp.float32))


def crop_yuv_rgb(
    y: jnp.ndarray,            # (H, W) luma plane
    u: jnp.ndarray,            # (H/2, W/2) chroma
    v: jnp.ndarray,            # (H/2, W/2) chroma
    boxes: jnp.ndarray,        # (D, 4) xyxy in LUMA-plane coordinates
    crop_hw: tuple[int, int],
) -> jnp.ndarray:
    """ROI crops straight from planar I420 -> (D, h, w, 3) RGB in [0, 255].

    The chunked transport path never materializes an RGB frame (the planar
    stem consumes Y/U/V directly, ops/planar_stem.py); DeepSORT's appearance
    crops are the one consumer that needs RGB - so the color conversion is
    done per-CROP here (D*h*w pixels) instead of per-frame.  Chroma is
    sampled at half coordinates (bilinear resize doubles as the 2x chroma
    upsample); full-range BT.601 matching ``ops.yuv``.
    """
    cy = crop_and_resize(y[..., None], boxes, crop_hw)[..., 0]
    cu = crop_and_resize(u[..., None], boxes * 0.5, crop_hw)[..., 0] - 128.0
    cv = crop_and_resize(v[..., None], boxes * 0.5, crop_hw)[..., 0] - 128.0
    r = cy + 1.403 * cv
    g = cy - 0.344 * cu - 0.714 * cv
    b = cy + 1.773 * cu
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
