"""Pure-NumPy oracle of ultralytics' LetterBox preprocessing.

An independent port of the reference preprocessing contract (reference
``TECHNICAL_DESIGN_DOCUMENT.md:333-339``: letterbox resize with
``r = min(S/h, S/w)``, bilinear interpolation, 114-gray center pad with the
``round(d ∓ 0.1)`` split, BGR->RGB, /255) implemented with nothing but
NumPy, so the device-side ``ops/letterbox.py`` can be tested against the
reference semantics without ultralytics or cv2 in the loop
(``tests/test_letterbox_parity.py``).

The bilinear resize reproduces cv2.INTER_LINEAR's float semantics:
half-pixel-center source coordinates ``(dst + 0.5) / scale - 0.5``,
edge-clamped, NO antialias prefilter.  (cv2's uint8 path additionally
quantizes weights to 1/2048 fixed point; the float contract is the spec.)
"""

from __future__ import annotations

import numpy as np


def resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) float -> (out_h, out_w, C); cv2.INTER_LINEAR float semantics."""
    h, w = img.shape[:2]
    x = img.astype(np.float64, copy=False)

    def axis_coords(n_src: int, n_dst: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        src = (np.arange(n_dst, dtype=np.float64) + 0.5) * (n_src / n_dst) - 0.5
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        # edge clamp: out-of-range taps read the border pixel
        lo = np.clip(i0, 0, n_src - 1)
        hi = np.clip(i0 + 1, 0, n_src - 1)
        return lo, hi, frac

    y0, y1, fy = axis_coords(h, out_h)
    x0, x1, fx = axis_coords(w, out_w)
    fy = fy[:, None, None]
    fx = fx[None, :, None]
    top = x[y0][:, x0] * (1 - fx) + x[y0][:, x1] * fx
    bot = x[y1][:, x0] * (1 - fx) + x[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def letterbox_ref(
    frame_bgr_u8: np.ndarray,
    size: int,
    pad_value: float = 114.0,
) -> tuple[np.ndarray, dict]:
    """uint8 BGR (H, W, 3) -> float32 RGB (size, size, 3) in [0, 1] + geometry.

    The returned dict mirrors ``ops.letterbox.LetterboxMeta`` field-for-field
    so geometry can be compared exactly.
    """
    h, w = frame_bgr_u8.shape[:2]
    r = min(size / h, size / w)
    new_w, new_h = round(w * r), round(h * r)
    dw, dh = (size - new_w) / 2.0, (size - new_h) / 2.0
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom, right = int(round(dh + 0.1)), int(round(dw + 0.1))

    rgb = frame_bgr_u8[..., ::-1].astype(np.float64)
    if (new_h, new_w) != (h, w):
        rgb = resize_bilinear_np(rgb, new_h, new_w)
    out = np.full((size, size, 3), float(pad_value), np.float64)
    out[top:top + new_h, left:left + new_w] = rgb
    # the asymmetric remainder pixel lands on the bottom/right edge
    assert top + new_h + bottom == size and left + new_w + right == size
    meta = {"scale": r, "pad_left": left, "pad_top": top,
            "new_w": new_w, "new_h": new_h, "src_w": w, "src_h": h}
    return (out / 255.0).astype(np.float32), meta


def unletterbox_boxes_ref(boxes_xyxy: np.ndarray, meta: dict) -> np.ndarray:
    """NumPy twin of ``ops.letterbox.unletterbox_boxes`` (ultralytics
    scale_boxes semantics: un-pad, un-scale, clip to source frame)."""
    shift = np.array([meta["pad_left"], meta["pad_top"]] * 2, np.float64)
    out = (np.asarray(boxes_xyxy, np.float64) - shift) / meta["scale"]
    lim = np.array([meta["src_w"], meta["src_h"]] * 2, np.float64)
    return np.clip(out, 0.0, lim)
