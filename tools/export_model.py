#!/usr/bin/env python
"""Model export tool.

The reference exports through ultralytics to ONNX / TensorRT engines
(reference ``tools/export_model.py:17-40``).  TPU-native equivalents:

  * ``npz``       - framework-native flat weights (fast load, portable);
  * ``orbax``     - checkpoint directory (training interop);
  * ``stablehlo`` - the compiled-graph analog of ONNX: serializes the jitted
    detect program via ``jax.export`` (StableHLO bytes + MLIR text), which any
    XLA-compatible runtime can reload and run without Python model code.

Also converts ultralytics ``.pt`` checkpoints into any of the above.
"""

from __future__ import annotations

import os
import sys

import click

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@click.command()
@click.option("--weights", "-w", default=None,
              help="source weights (.pt/.npz/orbax dir); default random init")
@click.option("--model", default="yolov8s")
@click.option("-f", "--format", "fmt", default="npz",
              type=click.Choice(["npz", "orbax", "stablehlo"]))
@click.option("--imgsz", default=640, type=int)
@click.option("--half/--no-half", default=True,
              help="bf16 compute (--no-half exports fp32)")
@click.option("--batch", default=1, type=int)
@click.option("--out", "-o", default=None, help="output path")
def main(weights, model, fmt, imgsz, half, batch, out):
    from rtmodt_tpu.config.loader import DetectionConfig
    from rtmodt_tpu.detection.detector import Detector
    from rtmodt_tpu.models import weights as W
    from rtmodt_tpu.utils.logging import logger

    det = Detector(DetectionConfig(model=model, weights=weights, input_size=imgsz,
                                   half=half), warmup=False)
    out = out or f"{model}_{imgsz}.{ 'npz' if fmt == 'npz' else fmt }"

    if fmt == "npz":
        W.save_npz(det.params, out)
    elif fmt == "orbax":
        W.save_orbax(det.params, out)
    else:  # stablehlo
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        dtype = jnp.bfloat16 if half else jnp.float32
        spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), dtype)

        def forward(img):
            return det.model.apply(det.params, img, train=False)

        exported = jexport.export(jax.jit(forward))(spec)
        with open(out, "wb") as f:
            f.write(exported.serialize())
        with open(out + ".mlir", "w") as f:
            f.write(exported.mlir_module())
    logger.info(f"exported {model} ({fmt}) -> {out}")
    click.echo(out)


if __name__ == "__main__":
    main()
