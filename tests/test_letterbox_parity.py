"""Pixel-parity of the device letterbox against the pure-NumPy ultralytics
oracle (ops/letterbox_ref.py; reference TECHNICAL_DESIGN_DOCUMENT.md:333-339).

Guards the preprocessing contract that pretrained-weight parity depends on:
a systematic geometry or interpolation difference here would silently shift
every detection when real ultralytics checkpoints are loaded."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from rtmodt_tpu.ops.letterbox import (
    letterbox,
    letterbox_meta,
    unletterbox_boxes,
)
from rtmodt_tpu.ops.letterbox_ref import (
    letterbox_ref,
    resize_bilinear_np,
    unletterbox_boxes_ref,
)

# production geometries + adversarial odd sizes (non-integer scale, odd pad
# remainders exercising the round(d -/+ 0.1) split)
GEOMS = [
    (720, 1280, 640),   # headline 720p
    (1080, 1920, 640),  # 1080p (3x point geometry)
    (480, 640, 640),
    (640, 640, 640),    # identity scale
    (301, 517, 640),    # odd sizes
    (77, 191, 320),
    (640, 360, 640),    # portrait
    (123, 123, 64),
]


@pytest.mark.parametrize("h,w,size", GEOMS)
def test_geometry_matches_oracle(h, w, size):
    meta = letterbox_meta(h, w, size)
    _, ref = letterbox_ref(np.zeros((h, w, 3), np.uint8), size)
    for field in ("scale", "pad_left", "pad_top", "new_w", "new_h",
                  "src_w", "src_h"):
        assert getattr(meta, field) == pytest.approx(ref[field]), field


@pytest.mark.parametrize("h,w,size", GEOMS)
def test_pixels_match_oracle(h, w, size):
    rng = np.random.default_rng(hash((h, w, size)) % 2**32)
    frame = rng.integers(0, 256, (h, w, 3), np.uint8)
    got, _ = letterbox(jnp.asarray(frame), size, dtype=jnp.float32)
    want, ref = letterbox_ref(frame, size)
    got = np.asarray(got)
    # pad region: exact 114/255 everywhere outside the content window
    mask = np.ones((size, size), bool)
    mask[ref["pad_top"]:ref["pad_top"] + ref["new_h"],
         ref["pad_left"]:ref["pad_left"] + ref["new_w"]] = False
    # (the device path computes pad * f32(1/255); match that rounding order)
    assert np.all(got[mask] == np.float32(114.0) * np.float32(1.0 / 255.0))
    # content region: same bilinear convention; tolerance covers f32-vs-f64
    # accumulation (measured max 4e-5), far below the 1/255 pixel quantum
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_resize_oracle_exact_2x_box_average():
    """At an exact 2x downsample, half-pixel-center bilinear degenerates to
    the 2x2 box average (the AVX-512 packer exploits the same identity -
    native/framepack.cpp)."""
    rng = np.random.default_rng(0)
    img = rng.random((8, 12, 3)) * 255
    got = resize_bilinear_np(img, 4, 6)
    want = img.reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_resize_oracle_identity():
    rng = np.random.default_rng(1)
    img = rng.random((5, 7, 1)) * 255
    np.testing.assert_allclose(resize_bilinear_np(img, 5, 7), img, atol=1e-12)


@pytest.mark.parametrize("h,w,size", [(720, 1280, 640), (301, 517, 640)])
def test_unletterbox_matches_oracle(h, w, size):
    meta = letterbox_meta(h, w, size)
    _, ref = letterbox_ref(np.zeros((h, w, 3), np.uint8), size)
    rng = np.random.default_rng(2)
    boxes = rng.random((16, 4), np.float32) * size
    boxes = np.sort(boxes.reshape(16, 2, 2), axis=1).reshape(16, 4)
    got = np.asarray(unletterbox_boxes(jnp.asarray(boxes), meta))
    want = unletterbox_boxes_ref(boxes, ref)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-6)
