"""Orbax checkpointing for training (save/restore/best-by-mAP).

Fills the reference's checkpoint story (ultralytics ``save_period``/``best``
handling, reference config/training.yaml + SURVEY.md 5.4) with orbax - and
extends it: the live pipeline's tracker state can also be serialized for
stream-resume (a capability the reference lacks entirely)."""

from __future__ import annotations

import os
from typing import Any

import jax

from rtmodt_tpu.utils.logging import logger


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=lambda m: m.get("map50", 0.0), best_mode="max"),
        )

    def save(self, step: int, state: Any, metrics: dict[str, float] | None = None) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)),
                       metrics=metrics or {})
        logger.info(f"checkpoint saved @ step {step}")

    def restore(self, step: int | None = None, template: Any | None = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(jax.device_get(template)))
        return self._mgr.restore(step)

    @property
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
