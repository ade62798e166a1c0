"""Space-to-depth front end: stem -> down1 -> c2f1 -> down2 in packed layout.

Why: a device trace of the production chunk program (tools/trace_chunk.py,
docs/PERF_NOTES.md 2026-08-17) put >50% of device time in the network's
first four blocks.  At 320/160 px spatial with 32-64 channels, XLA's conv
emitters run the MXU at 2-10% utilization (batch lives in sublanes, 32 of
128 lanes carry channels), and the fat low-channel activations cost extra
relayout copies.  The bandwidth/compute sweet spot only starts at 80 px /
128 channels (c2f2 onward).

Fix: run every front conv in a 2x2 space-to-depth layout - each (H, W, C)
tensor is represented as (H/2, W/2, 4C) with packed channel c*4 + (2p + q)
holding unpacked pixel (2i+p, 2j+q).  Convolutions map EXACTLY onto this
layout with rearranged (structurally sparse) kernels:

  * 3x3 stride-2, unpacked in, packed out  -> 3x3 stride-2 (stem: 6 -> 4C)
  * 3x3 stride-2, packed in, packed out    -> 3x3 stride-2 (down1)
  * 3x3 stride-1, packed in, packed out    -> 3x3 stride-1 (bottlenecks)
  * 1x1,          packed in, packed out    -> 1x1 parity-block-diagonal
  * 3x3 stride-2, packed in, UNPACKED out  -> 2x2 stride-1 (down2 exits
    packed space at 80 px / 128 channels, where XLA is already efficient)

The parity-minor channel order (c*4 + g) makes unpacked channel split /
concat (the C2f dense concat) plain contiguous slicing on packed channels.
Nominal FLOPs grow ~4x from structural zeros, but the contraction depth
(3*3*4C >= 1152) and 4C >= 128 output lanes keep the MXU fed - measured
net win ~3x on the front blocks (PERF_NOTES.md).

Eval-only (BatchNorm folded to its running-stats affine); the production
inference path.  Bypassed in int8 mode - quantization intercepts the Flax
ConvBN modules, which this module does not execute.

Reference: this replaces the first third of the CUDA YOLOv8s forward that
the reference runs via ultralytics/TensorRT (detector.py:98-112, SURVEY N1).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rtmodt_tpu.ops.planar_stem import make_x6, stem_2x2_kernel

# (output parity p, unpacked tap dy) -> (packed kernel row wy, input parity pr)
_MAP_S2 = {(0, 0): (0, 1), (0, 1): (1, 0), (0, 2): (1, 1),
           (1, 0): (1, 1), (1, 1): (2, 0), (1, 2): (2, 1)}
_MAP_S1 = {(0, 0): (0, 1), (0, 1): (1, 0), (0, 2): (1, 1),
           (1, 0): (1, 0), (1, 1): (1, 1), (1, 2): (2, 0)}
# packed-in unpacked-out stride-2 (down2): dy -> (wy, pr)
_MAP_EXIT = {0: (0, 1), 1: (1, 0), 2: (1, 1)}


def _pack_in6_kernel(k2: jnp.ndarray) -> jnp.ndarray:
    """(2, 2, 6, C) stem kernel -> (3, 3, 6, 4C) packed-output kernel."""
    c = k2.shape[-1]
    out = jnp.zeros((3, 3, 6, 4 * c), k2.dtype)
    for p in (0, 1):
        for q in (0, 1):
            for ky in (0, 1):
                for kx in (0, 1):
                    out = out.at[ky + p, kx + q, :, (2 * p + q)::4].set(
                        k2[ky, kx])
    return out


def _pack_in24_kernel(k2: jnp.ndarray) -> jnp.ndarray:
    """(2, 2, 6, C) stem kernel -> (2, 2, 24, 4C) double-s2d kernel.

    The x6 stem (3x3 stride-2 over the (S/2, S/2, 6) grid) re-expressed
    over the x24 grid (S/4, S/4, 24): output cell I parity p is the stem
    output at x6 row 2I+p, whose k2 window covers x6 rows 2I+p-1+ky -
    i.e. x24 cells I-1+wy at first-level parity pr with
    ``wy = (p-1+ky)//2 + 1, pr = (p-1+ky) % 2``.  2x2 stride-1 conv,
    padding ((1,0),(1,0)); input channel ``c6*4 + (2*pr+pc)``
    (ops/yuv.py::planes_to_x24 order).  Arithmetic identical to
    ``_pack_in6_kernel``'s conv; contraction depth 2*2*24=96 of the
    MXU's 128 lanes vs 6 - the fix for the 8.9 TF/s stem
    (docs/PERF_NOTES.md round 5)."""
    c = k2.shape[-1]
    out = jnp.zeros((2, 2, 24, 4 * c), k2.dtype)
    for p in (0, 1):
        for q in (0, 1):
            g_out = 2 * p + q
            for ky in (0, 1):
                for kx in (0, 1):
                    wy, pr = divmod(p - 1 + ky, 2)
                    wx, pc = divmod(q - 1 + kx, 2)
                    out = out.at[wy + 1, wx + 1,
                                 (2 * pr + pc)::4, g_out::4].set(k2[ky, kx])
    return out


def _pack_s2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, K) stride-2 conv -> (3, 3, 4C, 4K) packed->packed."""
    c, k = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * c, 4 * k), w.dtype)
    for p in (0, 1):
        for q in (0, 1):
            g_out = 2 * p + q
            for dy in range(3):
                for dx in range(3):
                    wy, pr = _MAP_S2[(p, dy)]
                    wx, pc = _MAP_S2[(q, dx)]
                    out = out.at[wy, wx, (2 * pr + pc)::4, g_out::4].set(
                        w[dy, dx])
    return out


def _pack_s1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, K) stride-1 conv -> (3, 3, 4C, 4K) packed->packed."""
    c, k = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * c, 4 * k), w.dtype)
    for p in (0, 1):
        for q in (0, 1):
            g_out = 2 * p + q
            for dy in range(3):
                for dx in range(3):
                    wy, pr = _MAP_S1[(p, dy)]
                    wx, pc = _MAP_S1[(q, dx)]
                    out = out.at[wy, wx, (2 * pr + pc)::4, g_out::4].set(
                        w[dy, dx])
    return out


def _pack_1x1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, K) -> (1, 1, 4C, 4K) parity-block-diagonal."""
    c, k = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, 4 * c, 4 * k), w.dtype)
    for g in range(4):
        out = out.at[0, 0, g::4, g::4].set(w[0, 0])
    return out


def _pack_exit_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, K) stride-2 conv, packed input -> (2, 2, 4C, K) unpacked
    output at half the packed grid... no: output matches the packed grid
    (stride-1 over it), which IS the unpacked stride-2 output grid."""
    c, k = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * c, k), w.dtype)
    for dy in range(3):
        for dx in range(3):
            wy, pr = _MAP_EXIT[dy]
            wx, pc = _MAP_EXIT[dx]
            out = out.at[wy, wx, (2 * pr + pc)::4, :].set(w[dy, dx])
    return out


def _rep4(x: jnp.ndarray) -> jnp.ndarray:
    """Per-unpacked-channel vector -> packed (parity-minor) layout."""
    return jnp.repeat(x, 4)


def _eval_affine(layer: dict, stats: dict | None,
                 bn_eps: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-mode (scale, bias) of a ConvBN: BN running-stats affine, or the
    conv bias for a BN-fused checkpoint."""
    if stats is None:                     # fused: conv has a bias, no BN
        b = layer["conv"]["bias"].astype(jnp.float32)
        return jnp.ones_like(b), b
    bn = layer["bn"]
    mean = stats["bn"]["mean"].astype(jnp.float32)
    var = stats["bn"]["var"].astype(jnp.float32)
    scale = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(var + bn_eps)
    bias = bn["bias"].astype(jnp.float32) - mean * scale
    return scale, bias


def _conv(x, kernel, stride, pad, dtype):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (stride, stride), pad,
        dimension_numbers=dn, preferred_element_type=dtype)


def _convbn(x, kernel, scale, bias, stride, pad, dtype):
    y = _conv(x, kernel, stride, pad, dtype).astype(jnp.float32)
    return jax.nn.silu(y * scale + bias).astype(dtype)


def apply_front(params: dict, model: Any, yp: jnp.ndarray, up: jnp.ndarray,
                vp: jnp.ndarray, quant: str, dtype=jnp.bfloat16):
    """Front-end dispatch shared by every packed execution path: the
    space-to-depth front when quantization is off, else the Flax module
    path (whose ConvBN modules the int8 interceptor wraps).  Takes
    letterboxed planes; returns raw (box_dist, cls_logits)."""
    if quant == "none":
        feats = s2d_front_apply(params, yp, up, vp, dtype=dtype)
        return model.apply(params, feats, train=False, skip_front=True)
    from rtmodt_tpu.ops.planar_stem import planar_stem_apply

    stem_stats = (params["batch_stats"]["stem"]
                  if "batch_stats" in params else None)
    feats = planar_stem_apply(params["params"]["stem"], stem_stats,
                              yp, up, vp, dtype=dtype)
    return model.apply(params, feats, train=False, skip_stem=True)


def apply_front_x6(params: dict, model: Any, x6p: jnp.ndarray,
                   dtype=jnp.bfloat16):
    """x6-transport twin of :func:`apply_front` (quantization off only -
    int8 mode intercepts the Flax ConvBN modules the s2d front bypasses,
    so x6-eligible paths pin ``quant == "none"`` at config time).  Takes
    the letterbox-padded (B, S/2, S/2, 6) tensor; returns raw
    (box_dist, cls_logits)."""
    feats = s2d_front_apply_x6(precompute_front(params), x6p, dtype=dtype)
    return model.apply(params, feats, train=False, skip_front=True)


def apply_front_x24(params: dict, model: Any, x24p: jnp.ndarray,
                    dtype=jnp.bfloat16):
    """x24-transport twin of :func:`apply_front_x6`: takes the
    letterbox-padded (B, S/4, S/4, 24) double-s2d tensor."""
    feats = s2d_front_apply_x24(precompute_front(params), x24p, dtype=dtype)
    return model.apply(params, feats, train=False, skip_front=True)


def precompute_front(params: dict, bn_eps: float = 1e-3) -> dict:
    """Build the packed front kernels + eval-mode affines ONCE.

    Weights are static at inference, so repacking the structurally-sparse
    kernels from live params inside every jitted call (36-144
    dynamic-update-slices per conv) is wasted work in the single-frame
    path and bloats every compiled program.  Call this at pipeline init
    (optionally under ``jax.jit``), keep the result on device, and feed it
    to :func:`s2d_front_apply_packed`; invalidate when weights change.

    Every entry is {"k": packed kernel, "scale": per-packed-channel scale,
    "bias": per-packed-channel bias} - the stem's color-offset const is
    folded into its bias (silu((conv + c)*s + b) = silu(conv*s + (c*s+b))).
    """
    pr = params["params"]
    stats_root = params.get("batch_stats")

    def stats(*path):
        if stats_root is None:
            return None
        node = stats_root
        for k in path:
            node = node[k]
        return node

    def entry(kernel, layer, st, pack_fn, rep=_rep4, extra_bias=None):
        sc, bi = _eval_affine(layer, st, bn_eps)
        if extra_bias is not None:
            bi = bi + extra_bias * sc
        return {"k": pack_fn(kernel), "scale": rep(sc), "bias": rep(bi)}

    k2, const = stem_2x2_kernel(pr["stem"]["conv"]["kernel"])
    out = {
        "stem": entry(k2, pr["stem"], stats("stem"), _pack_in6_kernel,
                      extra_bias=const),
        "stem24": entry(k2, pr["stem"], stats("stem"), _pack_in24_kernel,
                        extra_bias=const),
        "down1": entry(pr["down1"]["conv"]["kernel"], pr["down1"],
                       stats("down1"), _pack_s2_kernel),
        "down2": entry(pr["down2"]["conv"]["kernel"], pr["down2"],
                       stats("down2"), _pack_exit_kernel, rep=lambda x: x),
    }
    c2f = pr["c2f1"]
    out["c2f1"] = {
        "cv1": entry(c2f["cv1"]["conv"]["kernel"], c2f["cv1"],
                     stats("c2f1", "cv1"), _pack_1x1_kernel),
        "cv2": entry(c2f["cv2"]["conv"]["kernel"], c2f["cv2"],
                     stats("c2f1", "cv2"), _pack_1x1_kernel),
        "m": [
            {"cv1": entry(c2f[f"m{i}"]["cv1"]["conv"]["kernel"],
                          c2f[f"m{i}"]["cv1"],
                          stats("c2f1", f"m{i}", "cv1"), _pack_s1_kernel),
             "cv2": entry(c2f[f"m{i}"]["cv2"]["conv"]["kernel"],
                          c2f[f"m{i}"]["cv2"],
                          stats("c2f1", f"m{i}", "cv2"), _pack_s1_kernel)}
            for i in range(len([k for k in c2f if k.startswith("m")]))
        ],
    }
    return out


def _cb(x, e, stride, pad, dtype):
    """Packed ConvBN+SiLU from a precomputed entry."""
    return _convbn(x, e["k"], e["scale"], e["bias"], stride, pad, dtype)


def s2d_front_apply_packed(pk: dict, y: jnp.ndarray, u: jnp.ndarray,
                           v: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """stem+down1+c2f1+down2 on letterboxed planes from precomputed packed
    kernels (:func:`precompute_front`).

    y: (B, S, S) uint8 Y plane padded with 114; u, v: (B, S/2, S/2) chroma
    padded with 128 (same contract as ``planar_stem_apply``).  Returns the
    post-down2 feature map (B, S/8, S/8, C2) ready for
    ``model.apply(..., skip_front=True)``.
    """
    return s2d_front_apply_x6(pk, make_x6(y, u, v, dtype), dtype=dtype)


def _front_tail(pk: dict, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """down1 -> c2f1 -> down2 from the packed stem output
    (B, S/4, S/4, 4C0) - shared by the x6 and x24 entries."""
    p00 = ((0, 0), (0, 0))
    p10 = ((1, 0), (1, 0))
    p11 = ((1, 1), (1, 1))
    x = _cb(x, pk["down1"], 2, p10, dtype)                     # (B, S/8, S/8, 4C1)

    # c2f1 in packed layout (parity-minor channels: unpacked split/concat
    # becomes contiguous packed slicing)
    yv = _cb(x, pk["c2f1"]["cv1"], 1, p00, dtype)
    hidden4 = yv.shape[-1] // 2
    parts = [yv[..., :hidden4], yv[..., hidden4:]]
    for m in pk["c2f1"]["m"]:
        t = _cb(parts[-1], m["cv1"], 1, p11, dtype)
        t = _cb(t, m["cv2"], 1, p11, dtype)
        parts.append(parts[-1] + t)                            # shortcut
    x = _cb(jnp.concatenate(parts, axis=-1), pk["c2f1"]["cv2"], 1, p00, dtype)

    # down2: exit packed space -> (B, S/8, S/8, C2) unpacked
    return _cb(x, pk["down2"], 1, p10, dtype)


def s2d_front_apply_x6(pk: dict, x6: jnp.ndarray,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """Same front, consuming the (B, S/2, S/2, 6) space-to-depth tensor
    directly - the path for the x6 transport (``ops.yuv.planes_to_x6`` +
    ``ops.planar_stem.pad_x6``), where the host already did the s2d
    rearrangement and no device-side lane shuffle is needed."""
    p10 = ((1, 0), (1, 0))
    x = x6.astype(dtype)                                       # (B, S/2, S/2, 6)
    x = _cb(x, pk["stem"], 2, p10, dtype)                      # (B, S/4, S/4, 4C0)
    return _front_tail(pk, x, dtype)


def s2d_front_apply_x24(pk: dict, x24: jnp.ndarray,
                        dtype=jnp.bfloat16) -> jnp.ndarray:
    """Same front from the DOUBLE space-to-depth tensor (B, S/4, S/4, 24)
    (``ops.yuv.planes_to_x24`` + ``ops.planar_stem.pad_x24``).  The stem
    becomes a 2x2 stride-1 conv with 96-deep contraction instead of the
    6-lane 3x3 stride-2 - bit-identical outputs (tests/test_pipeline.py
    pins x24 == x6 == i420), ~4x the MXU lane occupancy on the program's
    formerly slowest conv."""
    p10 = ((1, 0), (1, 0))
    x = x24.astype(dtype)                                      # (B, S/4, S/4, 24)
    x = _cb(x, pk["stem24"], 1, p10, dtype)                    # (B, S/4, S/4, 4C0)
    return _front_tail(pk, x, dtype)


def s2d_front_apply(params: dict, y: jnp.ndarray, u: jnp.ndarray,
                    v: jnp.ndarray, dtype=jnp.bfloat16,
                    bn_eps: float = 1e-3) -> jnp.ndarray:
    """Convenience form: precompute + apply in one call (the packing then
    happens inside the caller's jit; chunk programs amortize it, the
    single-frame path should precompute once instead - see
    :func:`precompute_front`)."""
    return s2d_front_apply_packed(precompute_front(params, bn_eps), y, u, v,
                                  dtype=dtype)
