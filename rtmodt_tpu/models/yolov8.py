"""Flax/JAX YOLOv8 detection model family (n/s/m/l/x).

Ground-up TPU-native implementation of the architecture the reference runs via
``ultralytics.YOLO`` CUDA/TensorRT (reference ``src/detection/detector.py:98-112``;
SURVEY.md N1): CSP backbone with C2f blocks, SPPF, PAN neck, decoupled
anchor-free head with Distribution Focal Loss (DFL) box regression.

TPU design notes:
  * NHWC layout throughout (channels-last feeds the MXU's native conv tiling).
  * bf16 compute / fp32 params by default; BatchNorm runs in fp32 for
    numerical stability and XLA fuses its affine into the conv epilogue.
  * Static shapes only; the three pyramid levels are concatenated into one
    (A, C) prediction tensor (A = sum of level anchors, e.g. 8400 @ 640px) so
    decode + NMS are single fixed-shape ops.
  * No data-dependent control flow anywhere - the full forward is one XLA
    program under ``jax.jit``.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# depth_multiple, width_multiple, ratio (last-stage channel ratio)
YOLOV8_VARIANTS: dict[str, tuple[float, float, float]] = {
    "yolov8n": (0.34, 0.25, 2.0),
    "yolov8s": (0.34, 0.50, 2.0),
    "yolov8m": (0.67, 0.75, 1.5),
    "yolov8l": (1.00, 1.00, 1.0),
    "yolov8x": (1.00, 1.25, 1.0),
}

REG_MAX = 16
STRIDES = (8, 16, 32)


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(math.ceil(x / divisor) * divisor)) if x > 0 else 0


def _scale_channels(c: int, width: float) -> int:
    return _make_divisible(c * width, 8)


def _depth(n: int, depth: float) -> int:
    return max(1, round(n * depth))


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + SiLU - the universal YOLOv8 conv block.

    With ``fused=True`` the BN is folded into the conv (bias enabled, no BN
    modules) - the deploy-time graph optimization analogous to the
    reference's TensorRT engine build; see ``models.weights.fuse_bn``.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.fused,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if not self.fused:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="bn",
            )(x)
        return nn.silu(x).astype(self.dtype)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    kernels: tuple[int, int] = (3, 3)
    dtype: Any = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        y = ConvBN(hidden, self.kernels[0], dtype=self.dtype, fused=self.fused,
                   name="cv1")(x, train)
        y = ConvBN(self.features, self.kernels[1], dtype=self.dtype,
                   fused=self.fused, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage-partial block with n bottlenecks and dense split concat."""

    features: int
    n: int = 1
    shortcut: bool = False
    expansion: float = 0.5
    dtype: Any = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, fused=self.fused,
                   name="cv1")(x, train)
        parts = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(hidden, self.shortcut, 1.0, (3, 3), dtype=self.dtype,
                           fused=self.fused, name=f"m{i}")(parts[-1], train)
            )
        return ConvBN(self.features, 1, dtype=self.dtype, fused=self.fused,
                      name="cv2")(jnp.concatenate(parts, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained stride-1 max-pools, concat."""

    features: int
    pool: int = 5
    dtype: Any = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.features // 2
        x = ConvBN(hidden, 1, dtype=self.dtype, fused=self.fused,
                   name="cv1")(x, train)
        p = self.pool
        pad = p // 2

        def mp(v):
            return nn.max_pool(v, (p, p), strides=(1, 1), padding=((pad, pad), (pad, pad)))

        y1 = mp(x)
        y2 = mp(y1)
        y3 = mp(y2)
        return ConvBN(self.features, 1, dtype=self.dtype, fused=self.fused,
                      name="cv2")(jnp.concatenate([x, y1, y2, y3], axis=-1), train)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (NHWC) - pure reshape/broadcast, no gather."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class DetectHead(nn.Module):
    """Decoupled anchor-free head: per-level box (4*REG_MAX) and cls (nc) branches."""

    num_classes: int
    channels: Sequence[int]  # per-level input channels (P3, P4, P5)
    dtype: Any = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        c2 = max(16, self.channels[0] // 4, 4 * REG_MAX)
        c3 = max(self.channels[0], min(self.num_classes, 100))
        box_out, cls_out = [], []
        for i, f in enumerate(feats):
            b = ConvBN(c2, 3, dtype=self.dtype, fused=self.fused,
                       name=f"box{i}_0")(f, train)
            b = ConvBN(c2, 3, dtype=self.dtype, fused=self.fused,
                       name=f"box{i}_1")(b, train)
            b = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"box{i}_2")(b)
            c = ConvBN(c3, 3, dtype=self.dtype, fused=self.fused,
                       name=f"cls{i}_0")(f, train)
            c = ConvBN(c3, 3, dtype=self.dtype, fused=self.fused,
                       name=f"cls{i}_1")(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"cls{i}_2")(c)
            n = f.shape[0]
            box_out.append(b.reshape(n, -1, 4 * REG_MAX))
            cls_out.append(c.reshape(n, -1, self.num_classes))
        return jnp.concatenate(box_out, axis=1), jnp.concatenate(cls_out, axis=1)


class YOLOv8(nn.Module):
    """Full detector: backbone -> PAN neck -> decoupled head.

    Returns raw ``(box_dist (N, A, 4*REG_MAX), cls_logits (N, A, nc))``;
    use :func:`decode_predictions` for xyxy boxes + sigmoid scores.
    """

    num_classes: int = 80
    depth: float = 0.34
    width: float = 0.50
    ratio: float = 2.0
    dtype: Any = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 skip_stem: bool = False,
                 skip_front: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        ch = lambda c: _scale_channels(c, self.width)  # noqa: E731
        c5 = _make_divisible(512 * self.width * self.ratio, 8)
        d = lambda n: _depth(n, self.depth)  # noqa: E731
        dt = self.dtype

        # Backbone.  ``skip_stem=True`` means x is already the post-stem
        # feature map (e.g. produced by ``planar_stem_apply`` straight from
        # packed YUV planes - the (H, W, 3) image tensor never exists).
        # ``skip_front=True`` means x is already the post-down2 /8 feature
        # map (``ops.s2d_front.s2d_front_apply`` computes stem..down2 in
        # space-to-depth layout - the production packed path).
        if not skip_front:
            if not skip_stem:
                x = ConvBN(ch(64), 3, 2, dtype=dt, fused=self.fused, name="stem")(x, train)   # /2
            x = ConvBN(ch(128), 3, 2, dtype=dt, fused=self.fused, name="down1")(x, train)     # /4
            x = C2f(ch(128), d(3), True, dtype=dt, fused=self.fused, name="c2f1")(x, train)
            x = ConvBN(ch(256), 3, 2, dtype=dt, fused=self.fused, name="down2")(x, train)     # /8
        p3 = C2f(ch(256), d(6), True, dtype=dt, fused=self.fused, name="c2f2")(x, train)
        x = ConvBN(ch(512), 3, 2, dtype=dt, fused=self.fused, name="down3")(p3, train)        # /16
        p4 = C2f(ch(512), d(6), True, dtype=dt, fused=self.fused, name="c2f3")(x, train)
        x = ConvBN(c5, 3, 2, dtype=dt, fused=self.fused, name="down4")(p4, train)             # /32
        x = C2f(c5, d(3), True, dtype=dt, fused=self.fused, name="c2f4")(x, train)
        p5 = SPPF(c5, 5, dtype=dt, fused=self.fused, name="sppf")(x, train)

        # PAN neck (top-down then bottom-up)
        u4 = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
        n4 = C2f(ch(512), d(3), False, dtype=dt, fused=self.fused, name="neck_td4")(u4, train)
        u3 = jnp.concatenate([_upsample2x(n4), p3], axis=-1)
        n3 = C2f(ch(256), d(3), False, dtype=dt, fused=self.fused, name="neck_td3")(u3, train)  # P3 out
        dn3 = ConvBN(ch(256), 3, 2, dtype=dt, fused=self.fused, name="neck_dn3")(n3, train)
        n4b = C2f(ch(512), d(3), False, dtype=dt, fused=self.fused, name="neck_bu4")(
            jnp.concatenate([dn3, n4], axis=-1), train
        )                                                                     # P4 out
        dn4 = ConvBN(ch(512), 3, 2, dtype=dt, fused=self.fused, name="neck_dn4")(n4b, train)
        n5 = C2f(c5, d(3), False, dtype=dt, fused=self.fused, name="neck_bu5")(
            jnp.concatenate([dn4, p5], axis=-1), train
        )                                                                     # P5 out

        head_ch = (ch(256), ch(512), c5)
        return DetectHead(self.num_classes, head_ch, dtype=dt, fused=self.fused, name="head")(
            [n3, n4b, n5], train
        )


def build_model(variant: str = "yolov8s", num_classes: int = 80,
                dtype: Any = jnp.bfloat16, fused: bool = False) -> YOLOv8:
    if variant not in YOLOV8_VARIANTS:
        raise KeyError(f"unknown model '{variant}'; choose from {sorted(YOLOV8_VARIANTS)}")
    depth, width, ratio = YOLOV8_VARIANTS[variant]
    return YOLOv8(num_classes=num_classes, depth=depth, width=width, ratio=ratio,
                  dtype=dtype, fused=fused)


def make_anchors(input_size: int, strides: Sequence[int] = STRIDES,
                 offset: float = 0.5) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centers (A, 2) in input pixels and per-anchor stride (A, 1)."""
    pts, strs = [], []
    for s in strides:
        n = input_size // s
        xs = (jnp.arange(n, dtype=jnp.float32) + offset)
        gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1) * s)
        strs.append(jnp.full((n * n, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(strs, axis=0)


def decode_predictions(
    box_dist: jnp.ndarray,
    cls_logits: jnp.ndarray,
    input_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DFL decode to xyxy boxes (N, A, 4) in input pixels + sigmoid scores (N, A, nc).

    DFL: each of l/t/r/b is the expectation of a softmax over REG_MAX bins,
    scaled by the anchor's stride; boxes are anchor_point -+ (l,t)/(r,b).
    """
    n, a, _ = box_dist.shape
    anchors, strides = make_anchors(input_size)   # (A, 2), (A, 1)
    dist = box_dist.astype(jnp.float32).reshape(n, a, 4, REG_MAX)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    ltrb = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)  # (N, A, 4) in stride units
    ltrb = ltrb * strides[None, :, :]
    x1y1 = anchors[None] - ltrb[..., :2]
    x2y2 = anchors[None] + ltrb[..., 2:]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    return boxes, jax.nn.sigmoid(cls_logits.astype(jnp.float32))
