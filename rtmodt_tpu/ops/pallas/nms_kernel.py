"""Pallas TPU kernel: fused IoU + exact greedy NMS suppression.

One kernel computes the (K, K) IoU matrix in VMEM and runs the sequential
greedy suppression loop in-register - no HBM round trip for the IoU matrix
and no per-iteration XLA dispatch overhead (the costs that made the pure-XLA
formulations of SURVEY.md N3 expensive).  K is the static candidate-pool
size (<= ~1024 fits VMEM comfortably: K*K f32 @ K=512 is 1 MB).

Semantics are identical to ``ops.nms._greedy_suppress``: candidates sorted by
descending score; box j is kept iff no kept earlier box overlaps it more than
``iou_thresh``.  Zero-score (padding) candidates never suppress.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, keep_ref, iou_scratch, *, iou_thresh: float):
    boxes = boxes_ref[:]                      # (K, 4) f32 in VMEM
    scores = scores_ref[:]                    # (K, 1)
    k = boxes.shape[0]

    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = (x2 - x1) * (y2 - y1)              # (K, 1)

    ix = jnp.maximum(jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)
    iy = jnp.maximum(jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
    inter = ix * iy
    union = area + area.T - inter
    iou_scratch[:] = inter / (union + 1e-7)   # (K, K)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    valid = (scores > 0.0).astype(jnp.int32)

    # keep is carried as int32 (Mosaic cannot truncate stores to i1;
    # bool VMEM writes fail with 'Unsupported target bitwidth for truncation')
    def body(i, keep):
        # keep (K, 1) int32 0/1; row i suppresses later overlaps if kept
        alive = (jnp.sum(jnp.where(row_ids == i, keep * valid, 0)) > 0)
        row = iou_scratch[pl.ds(i, 1), :].reshape(k, 1)       # iou[i, :] column-shaped
        suppress = (row > iou_thresh) & (row_ids > i)
        return jnp.where(alive & suppress, 0, keep)

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k, 1), jnp.int32))
    keep_ref[:] = keep * valid


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def pallas_greedy_suppress(boxes: jnp.ndarray, scores: jnp.ndarray,
                           iou_thresh: float, interpret: bool = False) -> jnp.ndarray:
    """boxes (K, 4) f32 sorted by descending score, scores (K,) -> keep (K,) bool."""
    k = boxes.shape[0]
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thresh=iou_thresh),
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), scores.astype(jnp.float32).reshape(k, 1))
    return keep[:, 0] != 0
