"""Planar YUV stem: the first conv consumes Y/U/V planes directly.

The measured bottleneck of the streaming path was not the network - it was
materializing the (H, W, 3) RGB tensor: a 3-wide trailing dim wastes 125/128
TPU lanes for every elementwise op that touches it (~8.7 ms/frame at 640 px).

YUV->RGB is linear and chroma upsampling is linear, so both compose with the
stem convolution algebraically:

    stem(rgb)  where  rgb = (A @ [y, u, v] + A @ [0,-128,-128]) / 255
  = conv_y(Y) + conv_u(U) + conv_v(V) + const

with ``conv_y`` the stem kernel contracted against A[:,0]/255 (3x3, stride 2
on the full-res Y plane) and ``conv_u/v`` 2x2 stride-1 kernels on the
half-res chroma planes (each stride-2 3x3 output tap reads a 2x2 chroma
neighborhood; the taps collapse by summation).  All operands are 2-D planes
with lane-aligned widths - the RGB tensor never exists.

Exactness: identical to the reference path everywhere except (a) out-of-gamut
YUV combos that the standard path would clip to [0,1], and (b) a 1-pixel
border ring of the /2 feature map where the standard path's zero-padding
carries no chroma offset.  Both are sub-noise for detection and vanish
inside letterbox padding; the parity test bounds the interior error.

BT.601 matrix (matches ``ops.yuv``): R = Y + 1.403 Vc, G = Y - 0.344 Uc
- 0.714 Vc, B = Y + 1.773 Uc  (Uc = U - 128, Vc = V - 128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# columns: contribution of (Y, U, V) to each of (R, G, B)
_A = np.array([
    [1.0, 0.0, 1.403],
    [1.0, -0.344, -0.714],
    [1.0, 1.773, 0.0],
], dtype=np.float32)
_OFFSET = (_A @ np.array([0.0, -128.0, -128.0], np.float32)) / 255.0  # per RGB ch


def _chroma_kernel(wc: jnp.ndarray) -> jnp.ndarray:
    """Collapse a (3, 3, C) stride-2 kernel into the equivalent (2, 2, 1, C)
    stride-1 kernel over the half-resolution plane."""
    k = jnp.stack([
        jnp.stack([wc[0, 0], wc[0, 1] + wc[0, 2]], axis=0),
        jnp.stack([wc[1, 0] + wc[2, 0],
                   wc[1, 1] + wc[1, 2] + wc[2, 1] + wc[2, 2]], axis=0),
    ], axis=0)                                    # (2, 2, C)
    return k[:, :, None, :]


def stem_2x2_kernel(stem_kernel: jnp.ndarray):
    """Fold color matrix + /255 into the combined (2, 2, 6, C) stem kernel.

    Input channels: 0..3 = Y block parities (2*p + q), 4 = U, 5 = V (the
    layout :func:`make_x6` produces).  Returns (kernel, const (C,)) where
    ``const`` is the folded -128 chroma offset, to be added BEFORE any BN.
    """
    w = stem_kernel.astype(jnp.float32)                          # (3, 3, 3, C)
    n_out = w.shape[-1]
    a = jnp.asarray(_A)
    wy = jnp.einsum("ijco,c->ijo", w, a[:, 0]) / 255.0           # (3, 3, C)
    wu = jnp.einsum("ijco,c->ijo", w, a[:, 1]) / 255.0
    wv = jnp.einsum("ijco,c->ijo", w, a[:, 2]) / 255.0
    const = jnp.einsum("ijco,c->o", w, jnp.asarray(_OFFSET))     # (C,)

    zero = jnp.zeros((n_out,), jnp.float32)

    def ytap(ky, kx, p, q):
        dy = {(0, 1): 0, (1, 0): 1, (1, 1): 2}.get((ky, p))
        dx = {(0, 1): 0, (1, 0): 1, (1, 1): 2}.get((kx, q))
        return zero if dy is None or dx is None else wy[dy, dx]

    ku = _chroma_kernel(wu)[:, :, 0, :]                          # (2, 2, C)
    kv = _chroma_kernel(wv)[:, :, 0, :]
    kernel = jnp.stack([
        jnp.stack([
            jnp.stack([ytap(ky, kx, 0, 0), ytap(ky, kx, 0, 1),
                       ytap(ky, kx, 1, 0), ytap(ky, kx, 1, 1),
                       ku[ky, kx], kv[ky, kx]], axis=0)          # (6, C)
            for kx in (0, 1)], axis=0)                           # (2, 6, C)
        for ky in (0, 1)], axis=0)                               # (2, 2, 6, C)
    return kernel, const


def make_x6(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
            dtype=jnp.bfloat16) -> jnp.ndarray:
    """Space-to-depth the Y plane 2x2 and concat half-res chroma: the
    6-channel half-resolution tensor every stem formulation consumes."""
    b, s = y.shape[0], y.shape[1]
    yd = y.reshape(b, s // 2, 2, s // 2, 2).transpose(0, 1, 3, 2, 4)
    yd = yd.reshape(b, s // 2, s // 2, 4)
    return jnp.concatenate([yd, u[..., None], v[..., None]],
                           axis=-1).astype(dtype)


def planar_stem_apply(stem_params: dict, stem_stats: dict | None,
                      y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                      dtype=jnp.bfloat16, bn_eps: float = 1e-3) -> jnp.ndarray:
    """Apply the stem ConvBN+SiLU to LETTERBOXED planes.

    Args:
      stem_params/stem_stats: the model's ``stem`` param/batch_stats subtrees.
        ``stem_stats=None`` means a BN-fused stem (conv has a bias instead).
      y: (B, S, S) uint8 Y plane padded with 114.
      u, v: (B, S/2, S/2) uint8 chroma planes padded with 128.
    Returns (B, S/2, S/2, C) post-stem features.

    Single-conv formulation: three separate per-plane convs each have ONE
    input channel, wasting the MXU's 128-deep contraction (a device trace
    showed them at ~40% of total chunk time).  Instead: space-to-depth the
    Y plane 2x2 into 4 channels at half resolution, concat U and V (6
    channels total, all at S/2), and fold the 3x3/stride-2 Y kernel into
    the exactly-equivalent 2x2/stride-1 kernel over the packed layout -
    the whole stem is one conv with a 2*2*6=24-deep contraction.  The Y
    taps map as (output-window row ky, block parity p) -> source row
    2i+dy-1: (0,1)->dy=0, (1,0)->dy=1, (1,1)->dy=2 (and likewise for
    columns); the (0,0) slot is structurally zero.
    """
    kernel, const = stem_2x2_kernel(stem_params["conv"]["kernel"])
    x = make_x6(y, u, v, dtype)

    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    # bf16 conv output (MXU accumulates f32 internally): the f32 output
    # tensor cost more in layout copies than the conv itself in the trace
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=dn,
        preferred_element_type=dtype).astype(jnp.float32)
    out = out + const[None, None, None, :]

    if stem_stats is None:  # BN already folded into the conv (fused model)
        out = out + stem_params["conv"]["bias"].astype(jnp.float32)
    else:
        bn = stem_params["bn"]
        mean = stem_stats["bn"]["mean"].astype(jnp.float32)
        var = stem_stats["bn"]["var"].astype(jnp.float32)
        out = (out - mean) * jax.lax.rsqrt(var + bn_eps)
        out = out * bn["scale"].astype(jnp.float32) + bn["bias"].astype(jnp.float32)
    return jax.nn.silu(out).astype(dtype)


def pad_planes(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, size: int,
               pad_left: int, pad_top: int):
    """Letterbox-pad content planes to the model grid (Y: 114, chroma: 128).

    Requires even pad offsets so the chroma grid stays aligned; callers round
    the letterbox pads to even (content dims are already even).
    """
    ch, cw = y.shape[-2:]
    pb = size - ch - pad_top
    pr = size - cw - pad_left
    y_p = jnp.pad(y, ((0, 0), (pad_top, pb), (pad_left, pr)), constant_values=114)
    u_p = jnp.pad(u, ((0, 0), (pad_top // 2, pb // 2), (pad_left // 2, pr // 2)),
                  constant_values=128)
    v_p = jnp.pad(v, ((0, 0), (pad_top // 2, pb // 2), (pad_left // 2, pr // 2)),
                  constant_values=128)
    return y_p, u_p, v_p


def pad_x24(x24: jnp.ndarray, size: int, pad_left: int, pad_top: int,
            dtype=None) -> jnp.ndarray:
    """Letterbox-pad an x24 content tensor (B, ch/4, cw/4, 24) to
    (B, S/4, S/4, 24) - the double-s2d twin of :func:`pad_x6`.  Channel
    order ``c6 * 4 + g2`` (ops/yuv.py::planes_to_x24): Y channels (c6<4)
    fill with 114, chroma with 128.  Requires pads divisible by 4 (the
    caller guarantees it - Pipeline._s2d_level falls back to x6
    otherwise)."""
    hh, ww = x24.shape[1:3]
    s4 = size // 4
    pt, pl = pad_top // 4, pad_left // 4
    if dtype is not None:
        x24 = x24.astype(dtype)
    out = jnp.pad(x24, ((0, 0), (pt, s4 - hh - pt), (pl, s4 - ww - pl),
                        (0, 0)))
    row = jnp.arange(s4, dtype=jnp.int32)[:, None, None]
    col = jnp.arange(s4, dtype=jnp.int32)[None, :, None]
    inside = (row >= pt) & (row < pt + hh) & (col >= pl) & (col < pl + ww)
    fill = jnp.asarray([114] * 16 + [128] * 8, x24.dtype)
    return jnp.where(inside[None], out, fill[None, None, None, :])


def pad_x6(x6: jnp.ndarray, size: int, pad_left: int, pad_top: int,
           dtype=None) -> jnp.ndarray:
    """Letterbox-pad an x6 content tensor (B, ch/2, cw/2, 6) to (B, S/2,
    S/2, 6) with the per-channel letterbox fill (Y parity channels: 114,
    chroma: 128).

    Exactly equivalent to ``pad_planes`` + ``make_x6`` when the host
    shipped the s2d layout (``ops.yuv.planes_to_x6``): the even pad
    offsets make space-to-depth commute with padding, so padded full-res
    Y rows become half-res rows with all four parity channels at 114.
    One pad + one fused iota-select instead of the device-side
    reshape+transpose lane shuffle.

    ``dtype``: when given (the model compute dtype, bf16), the uint8 ->
    dtype conversion happens INSIDE the pad select, so the standalone
    convert pass over the padded (B, S/2, S/2, 6) tensor disappears from
    the chunk program (0.032 ms/frame at K=32 in the round-4 trace -
    docs/PERF_NOTES.md).  Every uint8 value is exactly representable in
    bf16 (integers < 2^8), so the fold is numerically identical.
    """
    hh, ww = x6.shape[1:3]
    s2 = size // 2
    pt, pl = pad_top // 2, pad_left // 2
    if dtype is not None:
        x6 = x6.astype(dtype)   # fuses into the pad/select below
    out = jnp.pad(x6, ((0, 0), (pt, s2 - hh - pt), (pl, s2 - ww - pl), (0, 0)))
    row = jnp.arange(s2, dtype=jnp.int32)[:, None, None]
    col = jnp.arange(s2, dtype=jnp.int32)[None, :, None]
    inside = (row >= pt) & (row < pt + hh) & (col >= pl) & (col < pl + ww)
    fill = jnp.array([114, 114, 114, 114, 128, 128], x6.dtype)
    return jnp.where(inside[None], out, fill[None, None, None, :])
