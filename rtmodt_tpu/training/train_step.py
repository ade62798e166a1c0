"""Sharded YOLOv8 training step (AdamW + cosine, bf16 compute, dp mesh).

The reference shells out to the ultralytics CLI for training (``tools/
train.py:20-41``); this is the framework's own JAX loop: one jitted
forward+loss+backward+update program, data-parallel over the ``"data"`` mesh
axis (batch sharded, params replicated, XLA all-reduces the grads over ICI).
Matches the reference's hyperparameter surface (``config/training.yaml``):
AdamW lr0/lrf, cosine schedule, warmup epochs, weight decay, loss gains.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from rtmodt_tpu.training.loss import yolo_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class Batch(NamedTuple):
    images: jnp.ndarray     # (B, S, S, 3) float in [0,1] or uint8
    gt_boxes: jnp.ndarray   # (B, M, 4) xyxy input pixels
    gt_labels: jnp.ndarray  # (B, M) i32
    gt_mask: jnp.ndarray    # (B, M) bool


def make_schedule(lr0: float, lrf: float, total_steps: int,
                  warmup_steps: int) -> optax.Schedule:
    """Linear warmup then cosine decay to lr0*lrf (ultralytics convention)."""
    warmup = optax.linear_schedule(0.0, lr0, max(warmup_steps, 1))
    cosine = optax.cosine_decay_schedule(lr0, max(total_steps - warmup_steps, 1),
                                         alpha=lrf)
    return optax.join_schedules([warmup, cosine], [max(warmup_steps, 1)])


def make_optimizer(schedule: optax.Schedule, weight_decay: float = 0.0005,
                   clip_norm: float = 10.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=0.937, b2=0.999, weight_decay=weight_decay,
                    mask=lambda p: jax.tree.map(lambda x: x.ndim > 1, p)),
    )


def create_train_state(model: Any, tx: optax.GradientTransformation,
                       input_size: int, rng: jax.Array,
                       init_variables: Any | None = None) -> TrainState:
    if init_variables is None:
        # keep rng + init on one backend (mixing accelerator arrays into CPU
        # computations degrades transfer throughput under remote-TPU runtimes)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            cpu_rng = jax.device_put(jax.device_get(rng))
            init_variables = model.init(
                cpu_rng, jnp.zeros((1, input_size, input_size, 3), jnp.float32),
                train=False)
    params = init_variables["params"]
    batch_stats = init_variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params), jnp.int32(0))


def train_step(
    state: TrainState,
    batch: Batch,
    *,
    model: Any,
    tx: optax.GradientTransformation,
    input_size: int,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
) -> tuple[TrainState, dict[str, jnp.ndarray]]:
    """One jittable optimization step. Shard ``batch`` on dim 0 over the
    ``data`` axis and replicate ``state``; XLA handles the grad all-reduce."""

    images = batch.images
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0

    def loss_fn(params):
        (box_dist, cls_logits), mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"])
        lb = yolo_loss(box_dist, cls_logits, batch.gt_boxes, batch.gt_labels,
                       batch.gt_mask, input_size, box_gain, cls_gain, dfl_gain)
        return lb.total, (lb, mutated["batch_stats"])

    (loss, (lb, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": loss, "box_loss": lb.box, "cls_loss": lb.cls,
        "dfl_loss": lb.dfl, "num_fg": lb.num_fg,
        "grad_norm": optax.global_norm(grads),
    }
    return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics


def make_sharded_train_step(model: Any, tx: optax.GradientTransformation,
                            input_size: int, mesh, **gains):
    """jit the train step over a mesh: batch sharded on 'data', state
    replicated. Returns (jitted_fn, shard_batch_fn)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    step = partial(train_step, model=model, tx=tx, input_size=input_size, **gains)
    jitted = jax.jit(
        step,
        in_shardings=(repl, Batch(data, data, data, data)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    def put_batch(batch: Batch) -> Batch:
        return Batch(*(jax.device_put(x, data) for x in batch))

    return jitted, put_batch
