"""Pipeline snapshot/resume for 24/7 streams (SURVEY.md 5.4 "new capability").

The reference's tracker/zone state is in-memory only and dies with the
process (reference ``tools/run_pipeline.py:119-166`` rebuilds everything on
restart, losing track IDs, dwell timers and cooldowns).  This module
serializes the full host-visible pipeline state into ONE ``.npz`` written
atomically (tmp + rename), so a killed process resumes with:

  * every tracker slot (boxes, Kalman state, ids, ages, ``next_id``, trails,
    appearance galleries for deepsort/botsort) exactly as it was;
  * every zone dwell timer / cooldown / per-zone analytics count;
  * the events-JSONL byte offset at snapshot time (downstream consumers can
    separate pre- and post-resume alerts);
  * ``frames_done`` - for FILE sources the resuming pipeline fast-forwards
    past already-processed frames so stream-time dwell clocks line up
    exactly (live sources just continue from the current frame).

Format: npz with ``tracker/<field>`` arrays (``MultiObjectTracker.
state_arrays``) + a ``meta`` JSON string (engine state via
``ZoneEventEngine.state_dict``, algorithm tag, frame counters).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from rtmodt_tpu.utils.logging import logger

_VERSION = 1


def save_snapshot(path: str, tracker, events=None, *,
                  frames_done: int = 0, last_ts: float = 0.0) -> None:
    """Atomically write one resume snapshot; never corrupts a prior one."""
    meta: dict[str, Any] = {
        "version": _VERSION,
        "algorithm": tracker.algorithm,
        "frames_done": int(frames_done),
        "last_ts": float(last_ts),
        "events": events.state_dict() if events is not None else None,
    }
    payload = {f"tracker/{k}": v for k, v in tracker.state_arrays().items()}
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, meta=np.asarray(json.dumps(meta)), **payload)
    os.replace(tmp, path)


def load_snapshot(path: str, tracker, events=None) -> dict[str, Any]:
    """Restore tracker (+ zone engine) state; returns the snapshot meta
    (``frames_done``, ``last_ts``, ...).  Raises on algorithm mismatch - a
    bytetrack snapshot restored into a deepsort tracker would silently
    misinterpret the state pytree."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("version") != _VERSION:
            raise ValueError(
                f"snapshot {path} has version {meta.get('version')}; "
                f"this build reads version {_VERSION}")
        if meta["algorithm"] != tracker.algorithm:
            raise ValueError(
                f"snapshot {path} was taken with tracking.algorithm="
                f"{meta['algorithm']!r}; the running pipeline uses "
                f"{tracker.algorithm!r} - refusing to misinterpret the "
                "state pytree")
        tracker.load_state_arrays(
            {k[len("tracker/"):]: z[k] for k in z.files
             if k.startswith("tracker/")})
    if events is not None and meta.get("events") is not None:
        events.load_state_dict(meta["events"])
    logger.info(f"resumed pipeline state from {path} "
                f"(frames_done={meta['frames_done']}, "
                f"algorithm={meta['algorithm']})")
    return meta
