#!/usr/bin/env python
"""CLI entry point for the live pipeline.

Flag parity with reference ``tools/run_pipeline.py:40-43``:
``-c/--config``, ``-s/--source``, ``--display/--no-display`` - plus
``--max-frames`` and ``--save-video`` conveniences.
"""

from __future__ import annotations

import os
import sys

import click

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtmodt_tpu.config import load_config, default_config_path  # noqa: E402
from rtmodt_tpu.utils.logging import logger  # noqa: E402


@click.command()
@click.option("-c", "--config", "config_path", default=None,
              help="YAML config path (default: packaged default.yaml)")
@click.option("-s", "--source", multiple=True,
              help="override ingestion.source (RTSP URL / file / webcam "
                   "index); repeat for multi-camera (runs the sharded "
                   "multi-stream pipeline, one SPMD program over the mesh)")
@click.option("--display/--no-display", default=False, help="show annotated window")
@click.option("--max-frames", default=None, type=int, help="stop after N frames")
@click.option("--save-video", is_flag=True, default=False,
              help="write annotated video to visualization.save_path")
@click.option("--mjpeg-port", default=None, type=int,
              help="serve the annotated stream as MJPEG on this port "
                   "(headless live view; 0 = OS-picked port)")
@click.option("--resume-state", "state_path", default=None,
              help="pipeline snapshot path: restore tracker IDs + zone "
                   "dwell/cooldown state from it if present, and keep it "
                   "updated (periodic + on clean exit) so a killed 24/7 "
                   "run resumes where it left off")
@click.option("--state-interval", default=300, type=int,
              help="snapshot every N consumed frames (with --resume-state)")
def main(config_path, source, display, max_frames, save_video, mjpeg_port,
         state_path, state_interval):
    overrides = {}
    if len(source) == 1:
        overrides["ingestion"] = {"source": source[0]}
    if save_video:
        overrides["visualization"] = {"save_video": True}
    if mjpeg_port is not None:
        # the monitor streams ANNOTATED frames, so it implies visualization
        overrides.setdefault("visualization", {}).update(
            {"mjpeg_port": mjpeg_port, "enabled": True})
    if len(source) > 1:
        overrides["parallel"] = {"num_streams": len(source)}
    cfg = load_config(config_path or default_config_path(), overrides)

    os.makedirs(cfg.system.log_dir, exist_ok=True)
    logger.remove()
    import sys as _sys
    logger.add(_sys.stderr, level=cfg.system.log_level)
    logger.add(os.path.join(cfg.system.log_dir, "pipeline.log"),
               level="DEBUG", rotation="50 MB")

    if len(source) > 1:
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        # --display/--save-video tile the S annotated streams into one
        # mosaic frame (parallel/multistream.py::MosaicAnnotator)
        pipe = MultiStreamPipeline(cfg)
        summary = pipe.run(list(source), max_frames=max_frames,
                           display=display, state_path=state_path,
                           state_interval=state_interval)
    else:
        from rtmodt_tpu.runtime.pipeline import Pipeline

        pipe = Pipeline(cfg)
        skip = 0
        if state_path and os.path.exists(state_path):
            skip = pipe.load_runtime_state(state_path)
        summary = pipe.run(display=display, max_frames=max_frames,
                           state_path=state_path,
                           state_interval=state_interval,
                           skip_frames=skip)
        if pipe.events is not None and summary is not None:
            summary = dict(summary)
            summary["zone_counts"] = pipe.events.zone_counts()
    if summary:
        click.echo("\n=== final profile ===")
        for k, v in sorted(summary.items()):
            # multi-camera summaries carry non-scalar fields too
            # (per_stream_frames, dead_streams)
            click.echo(f"  {k}: {v:.2f}" if isinstance(v, float)
                       else f"  {k}: {v}")


if __name__ == "__main__":
    main()
