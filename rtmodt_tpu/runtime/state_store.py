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
        if meta.get("kind") is not None:
            raise ValueError(
                f"snapshot {path} is a {meta['kind']!r} snapshot; refusing "
                "to restore it into a single-stream pipeline (its arrays "
                "carry a leading stream axis)")
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
    elif (events is None) != (meta.get("events") is None):
        # one side has zone state and the other doesn't: dwell timers /
        # cooldowns / analytics are dropped - say so, don't lose them
        # silently (an operator who toggled events.enabled between runs)
        logger.warning(
            f"snapshot {path} "
            + ("carries zone-engine state but zones are disabled in this "
               "run; dwell/cooldown/analytics state is discarded"
               if events is None else
               "has no zone-engine state but zones are enabled in this "
               "run; dwell timers start cold"))
    logger.info(f"resumed pipeline state from {path} "
                f"(frames_done={meta['frames_done']}, "
                f"algorithm={meta['algorithm']})")
    return meta


# ----------------------------------------------------------------------
# multi-camera snapshots (MultiStreamPipeline.run)
# ----------------------------------------------------------------------

def save_multistream_snapshot(path: str, msp, engines=None, *,
                              per_stream_frames: list[int],
                              last_meta: list, dead: list) -> None:
    """Snapshot the S-camera SPMD pipeline: the batched (S-leading) tracker
    state pytree exactly as it sits on the mesh, the per-stream GMC carry
    when camera-motion compensation is on, every per-stream zone engine's
    dwell/cooldown/analytics state, and the per-stream frame counters a
    resuming run fast-forwards file sources by.  Same atomic-write contract
    as :func:`save_snapshot`; call only at a drained pipeline-window
    boundary (every submitted chunk consumed) so the device tracker state
    and the host engine state describe the same frames."""
    import jax

    meta: dict[str, Any] = {
        "version": _VERSION,
        "kind": "multistream",
        "algorithm": msp.cfg.tracking.algorithm,
        "num_streams": int(msp.num_streams),
        "per_stream_frames": [int(n) for n in per_stream_frames],
        "last_meta": [[int(f), float(t)] for f, t in last_meta],
        "dead": [bool(d) for d in dead],
        "engines": ([e.state_dict() for e in engines]
                    if engines is not None else None),
        "gmc": bool(msp._gmc_on),
    }
    host = jax.device_get(msp.state)
    payload = {f"tracker/{k}": np.asarray(v)
               for k, v in host._asdict().items()}
    if msp._gmc_on and msp._gmc_carry is not None:
        grids, valid = jax.device_get(msp._gmc_carry)
        payload["gmc/grids"] = np.asarray(grids)
        payload["gmc/valid"] = np.asarray(valid)
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, meta=np.asarray(json.dumps(meta)), **payload)
    os.replace(tmp, path)


def load_multistream_snapshot(path: str, msp, engines=None) -> dict[str, Any]:
    """Restore a multi-camera snapshot into ``msp`` (and the per-stream
    ``engines``); returns the meta dict (``per_stream_frames`` drives the
    per-stream file fast-forward).  Refuses algorithm / stream-count /
    state-shape mismatches - a snapshot from a different configuration
    would silently misinterpret the batched state pytree."""
    import jax

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("version") != _VERSION:
            raise ValueError(
                f"snapshot {path} has version {meta.get('version')}; "
                f"this build reads version {_VERSION}")
        if meta.get("kind") != "multistream":
            raise ValueError(
                f"snapshot {path} is a single-stream snapshot; refusing to "
                "restore it into a multi-camera pipeline")
        if meta["algorithm"] != msp.cfg.tracking.algorithm:
            raise ValueError(
                f"snapshot {path} was taken with tracking.algorithm="
                f"{meta['algorithm']!r}; the running pipeline uses "
                f"{msp.cfg.tracking.algorithm!r}")
        if meta["num_streams"] != msp.num_streams:
            raise ValueError(
                f"snapshot {path} holds {meta['num_streams']} streams; the "
                f"running pipeline has {msp.num_streams}")
        cls = type(msp.state)
        cur = jax.device_get(msp.state)._asdict()
        fields = {}
        for k in cls._fields:
            arr = z[f"tracker/{k}"]
            if arr.shape != cur[k].shape or arr.dtype != cur[k].dtype:
                raise ValueError(
                    f"snapshot field {k!r} is {arr.shape}/{arr.dtype}; the "
                    f"running pipeline expects {cur[k].shape}/{cur[k].dtype} "
                    "(max_tracks / embed_dim config mismatch?)")
            fields[k] = arr
        msp.state = jax.device_put(cls(**{
            k: jnp_like(v) for k, v in fields.items()}), msp._stream_shard)
        if msp._gmc_on:
            if meta.get("gmc") and "gmc/grids" in z.files:
                msp._gmc_carry = (
                    jax.device_put(z["gmc/grids"], msp._stream_shard),
                    jax.device_put(z["gmc/valid"], msp._stream_shard))
            else:
                logger.warning(
                    f"snapshot {path} has no GMC carry; compensation "
                    "restarts cold (first frame per stream uncompensated)")
                msp._gmc_reset()
    if (engines is None) != (meta.get("engines") is None):
        logger.warning(
            f"snapshot {path} "
            + ("carries zone-engine state but zones are disabled in this "
               "run; dwell/cooldown/analytics state is discarded"
               if engines is None else
               "has no zone-engine state but zones are enabled in this "
               "run; dwell timers start cold"))
    if engines is not None and meta.get("engines") is not None:
        if len(meta["engines"]) != len(engines):
            raise ValueError(
                f"snapshot {path} holds {len(meta['engines'])} zone engines "
                f"for {len(engines)} streams")
        for eng, st in zip(engines, meta["engines"]):
            eng.load_state_dict(st)
    logger.info(
        f"resumed multi-stream state from {path} "
        f"(per_stream_frames={meta['per_stream_frames']}, "
        f"algorithm={meta['algorithm']})")
    return meta


def jnp_like(v):
    """np -> jnp leaf (kept out of module import time: state_store must
    import without jax for lightweight tooling)."""
    import jax.numpy as jnp

    return jnp.asarray(v)
