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
@click.option("--qat-steps", default=0, type=int,
              help="after training: fold BN and run N quantization-aware "
                   "fine-tune steps (quant/qat.py); saves qat_final.npz + "
                   "per-layer activation scales for int8 deployment")
@click.option("--compare-raw", is_flag=True, default=False,
              help="each validation also evaluates the RAW (non-EMA) params "
                   "and logs both, to quantify the EMA benefit")
def main(config_path, epochs, batch_size, imgsz, data_root, resume, max_steps,
         qat_steps, compare_raw):
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

    # EMA of params (ultralytics-style model averaging for eval/export).
    # Decay ramps in with an exp schedule so early EMA isn't dominated by
    # the random init (d_t = decay * (1 - exp(-t / 2000))).
    ema_decay = float(cfg.get("ema_decay", 0.0))
    ema_params = jax.device_put(jax.device_get(state.params)) if ema_decay else None
    ema_fn = jax.jit(lambda e, p, d: jax.tree.map(
        lambda a, b: d * a + (1.0 - d) * b, e, p))

    def run_validation(params, batch_stats, step):
        """Val mAP over the dataset's COCO GT (if present)."""
        gt_json = os.path.join(cfg["data"]["root"], "val_coco_gt.json")
        val_dir = os.path.join(cfg["data"]["root"], "images",
                               cfg["data"]["val_split"])
        if not (os.path.exists(gt_json) and os.path.isdir(val_dir)):
            logger.info("no val GT json found; skipping val mAP")
            return None
        import json as _json

        import cv2

        from rtmodt_tpu.evaluation.coco_eval import COCODetEval
        from rtmodt_tpu.models.yolov8 import decode_predictions
        from rtmodt_tpu.ops.letterbox import letterbox, unletterbox_boxes
        from rtmodt_tpu.ops.nms import batched_nms_fixed

        @jax.jit
        def val_detect(p, bs, frame):
            img, meta = letterbox(frame, s, dtype=jnp.float32)
            bd, cl = model.apply({"params": p, "batch_stats": bs},
                                 img[None], train=False)
            boxes, scores = decode_predictions(bd, cl, s)
            res = batched_nms_fixed(boxes[0], scores[0], 0.001, 0.6, 300, 1000)
            return res._replace(boxes=unletterbox_boxes(res.boxes, meta))

        with open(gt_json) as f:
            gt = _json.load(f)
        preds = []
        for im in gt["images"]:
            frame = cv2.imread(os.path.join(val_dir, im["file_name"]))
            if frame is None:
                continue
            r = jax.device_get(val_detect(params, batch_stats,
                                          jnp.asarray(frame)))
            for i in range(int(r.count)):
                x1, y1, x2, y2 = (float(v) for v in r.boxes[i])
                preds.append({"image_id": im["id"],
                              "category_id": int(r.classes[i]) + 1,
                              "bbox": [x1, y1, x2 - x1, y2 - y1],
                              "score": float(r.scores[i])})
        result = COCODetEval(gt, preds).evaluate(0.5)
        logger.info(f"val @ step {step}: mAP50={result['mAP_50']:.4f} "
                    f"recall={result['recall']:.4f}")
        return result

    gstep = int(jax.device_get(state.step))
    val_every = steps_per_epoch * max(1, int(cfg.get("val_interval", 1)))
    best_map = -1.0
    no_improve = 0
    patience = int(cfg.get("patience", 0))
    t0 = time.perf_counter()
    try:
        for batch in ds.batches(bsz):
            state, metrics = step_fn(state, put_batch(batch))
            if ema_decay:
                import math as _math

                d = ema_decay * (1.0 - _math.exp(-(gstep + 1) / 2000.0))
                ema_params = ema_fn(ema_params, state.params, d)
            gstep += 1
            if gstep % 50 == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                rate = bsz * 50 / (time.perf_counter() - t0)
                t0 = time.perf_counter()
                logger.info(f"step {gstep}/{total_steps} "
                            f"loss={m['loss']:.3f} box={m['box_loss']:.3f} "
                            f"cls={m['cls_loss']:.3f} dfl={m['dfl_loss']:.3f} "
                            f"fg={int(m['num_fg'])} {rate:.1f} img/s")
            if gstep % val_every == 0:
                eval_params = ema_params if ema_decay else state.params
                r = run_validation(eval_params, state.batch_stats, gstep)
                if compare_raw and ema_decay and r is not None:
                    raw = run_validation(state.params, state.batch_stats, gstep)
                    logger.info(
                        f"val @ step {gstep}: EMA mAP50={r['mAP_50']:.4f} "
                        f"vs raw mAP50={raw['mAP_50']:.4f} "
                        f"(delta {r['mAP_50'] - raw['mAP_50']:+.4f})")
                if r is not None:
                    if r["mAP_50"] > best_map:
                        best_map, no_improve = r["mAP_50"], 0
                    else:
                        no_improve += 1
                    ckpt.save(gstep, state, metrics={"map50": r["mAP_50"]})
                    if patience and no_improve >= patience:
                        logger.info(f"early stop: no val improvement for "
                                    f"{patience} evals")
                        break
            elif gstep % (steps_per_epoch * cfg["checkpoint"]["save_period"]) == 0:
                ckpt.save(gstep, state)
            if max_steps and gstep >= max_steps:
                logger.info("max-steps reached")
                break
            if gstep >= total_steps:
                break
    except KeyboardInterrupt:
        logger.info("interrupted")
    ckpt.save(gstep, state)
    if ema_decay:
        from rtmodt_tpu.models.weights import save_npz

        save_npz({"params": jax.device_get(ema_params),
                  "batch_stats": jax.device_get(state.batch_stats)},
                 os.path.join(cfg["checkpoint"]["dir"], "ema_final.npz"))
    ckpt.close()
    logger.info(f"training done at step {gstep} (best mAP50={best_map:.4f})")

    if qat_steps > 0:
        # fold BN into the convs, then fine-tune THROUGH int8 rounding with
        # frozen activation scales (quant/qat.py); the saved scales feed
        # ptq.quantize_convs at deployment so the deployed program computes
        # exactly what QAT optimized.
        from rtmodt_tpu.models.weights import fuse_bn, save_npz
        from rtmodt_tpu.quant.qat import qat_finetune

        eval_params = ema_params if ema_decay else state.params
        fused = fuse_bn({"params": jax.device_get(eval_params),
                         "batch_stats": jax.device_get(state.batch_stats)})
        fused_model = build_model(cfg["model"], cfg["num_classes"],
                                  dtype=jnp.float32, fused=True)

        def qat_batches():
            while True:
                yield from ds.batches(bsz)

        qat_lr = float(cfg.get("qat_lr", cfg["optimizer"]["lr0"] * 0.01))
        new_params, scales = qat_finetune(
            fused_model, fused["params"], qat_batches(), s,
            steps=qat_steps, lr=qat_lr)
        out = os.path.join(cfg["checkpoint"]["dir"], "qat_final.npz")
        save_npz({"params": jax.device_get(new_params)}, out)
        np.savez(os.path.join(cfg["checkpoint"]["dir"], "qat_act_scales.npz"),
                 **{k.replace("/", "|"): np.float32(v)
                    for k, v in scales.items()})
        logger.info(f"QAT checkpoint saved: {out} (+ qat_act_scales.npz)")


if __name__ == "__main__":
    main()
