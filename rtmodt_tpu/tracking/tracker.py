"""Public tracker façade: `MultiObjectTracker` + `Track`.

API-parity with reference ``src/tracking/tracker.py:200-259``: same
constructor dispatch, same ``update(detections) -> list[Track]`` call, same
per-ID centroid trails capped at ``trail_length``.  Capability extensions:
``deepsort`` actually works here (the reference raises NotImplementedError,
tracker.py:212-214) - an appearance-embedding tracker whose ROI crop, embed
and association all run on device (``deepsort.py``) - ``botsort`` fuses
motion and appearance costs BoT-SORT-style (``botsort.py``), and ``ocsort``
adds an observation-centric tracker for occlusion-heavy scenes
(``ocsort.py``), all in the same fixed-slot jittable formulation.

ByteTrack execution backends:
  * ``assignment: greedy`` (default) - the jittable device state machine in
    ``bytetrack.py`` (fixed slots, batched Kalman, on-device greedy matching);
  * ``assignment: lapjv`` - host NumPy ByteTrack with the optimal C++ JV
    solver (``host_bytetrack.py``).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rtmodt_tpu.config.loader import ByteTrackConfig
from rtmodt_tpu.tracking.bytetrack import (
    TrackState,
    bytetrack_update,
    init_track_state,
)
from rtmodt_tpu.utils.logging import logger


@dataclass
class Track:
    """One tracked object (same fields as reference tracker.py:27-37)."""

    track_id: int
    xyxy: np.ndarray               # (4,) float32
    confidence: float
    class_id: int
    class_name: str = ""
    age: int = 0
    time_since_update: int = 0
    trail: list[tuple[int, int]] = field(default_factory=list)


class MultiObjectTracker:
    """High-level tracker wrapping the ByteTrack backends."""

    def __init__(self, algorithm: str = "bytetrack", trail_length: int = 30, **kwargs):
        self.algorithm = algorithm.lower()
        if self.algorithm not in ("bytetrack", "deepsort", "botsort", "ocsort"):
            raise ValueError(f"Unknown tracker: {self.algorithm}")

        self._trail_map: dict[int, list[tuple[int, int]]] = defaultdict(list)
        self._trail_maxlen = trail_length
        # trail garbage collection: ids absent long past any possible
        # re-match are dropped so 24/7 streams don't accumulate a graveyard
        self._frame_count = 0
        self._trail_seen: dict[int, int] = {}
        self._host = None
        self._embed_fns: dict = {}
        self._setup_gmc(kwargs.get("gmc"))

        if self.algorithm in ("deepsort", "botsort"):
            from rtmodt_tpu.config.loader import BotSortConfig, DeepSortConfig
            from rtmodt_tpu.models.embedder import init_embedder
            from rtmodt_tpu.tracking.deepsort import (
                deepsort_update, init_deepsort_state)

            if self.algorithm == "deepsort":
                cfg_cls, update_fn = DeepSortConfig, deepsort_update
            else:
                from rtmodt_tpu.tracking.botsort import botsort_update
                cfg_cls, update_fn = BotSortConfig, botsort_update
            ds = kwargs.get(self.algorithm, kwargs)
            if isinstance(ds, cfg_cls):
                self.cfg = ds
            else:
                known = {f for f in cfg_cls.__dataclass_fields__}
                self.cfg = cfg_cls(**{k: v for k, v in ds.items() if k in known})
            weights = self.cfg.embedder
            if weights in ("random", "none"):
                weights = ""               # explicit opt-out of the fallback
            elif not weights:
                # weights fallback chain (same idea as the detector's): an
                # in-repo trained checkpoint beats random init when present
                default_npz = (Path(__file__).resolve().parents[2]
                               / "checkpoints" / "embedder.npz")
                if default_npz.exists():
                    weights = str(default_npz)
            try:
                self.embedder, self.embedder_params = init_embedder(
                    tuple(self.cfg.crop_hw), self.cfg.embed_dim, weights)
                if weights and not self.cfg.embedder:
                    logger.info(f"{self.algorithm}: using shipped embedder "
                                f"weights {weights}")
            except Exception as e:
                # corrupt/truncated npz raises OSError/BadZipFile, shape or
                # key mismatches ValueError - all fall back for the implicit
                # default path, but an explicitly configured path fails loud
                if self.cfg.embedder not in ("", "random", "none"):
                    raise
                logger.warning(f"shipped embedder weights unusable ({e}); "
                               "falling back to random init")
                self.embedder, self.embedder_params = init_embedder(
                    tuple(self.cfg.crop_hw), self.cfg.embed_dim, "")
            self.state = init_deepsort_state(self.cfg.max_tracks, self.cfg.embed_dim)
            # raw (un-jitted) partial for the fused/packed/chunked pipeline
            # programs; the facade's own step jits it standalone
            self.appearance_update = partial(update_fn, cfg=self.cfg)
            self._step = jax.jit(self.appearance_update)
            logger.info(f"Tracker initialised: {self.algorithm} "
                        f"(embed_dim={self.cfg.embed_dim})")
            return

        if self.algorithm == "ocsort":
            from rtmodt_tpu.config.loader import OCSortConfig
            from rtmodt_tpu.tracking.ocsort import (init_ocsort_state,
                                                    ocsort_update)

            oc = kwargs.get("ocsort", kwargs)
            if isinstance(oc, OCSortConfig):
                self.cfg = oc
            else:
                known = {f for f in OCSortConfig.__dataclass_fields__}
                self.cfg = OCSortConfig(**{k: v for k, v in oc.items() if k in known})
            self.state = init_ocsort_state(self.cfg.max_tracks, self.cfg.delta_t)
            self._step = jax.jit(partial(ocsort_update, cfg=self.cfg))
            logger.info(f"Tracker initialised: ocsort (min_hits="
                        f"{self.cfg.min_hits}, delta_t={self.cfg.delta_t}, "
                        f"use_byte={self.cfg.use_byte})")
            return

        bt = kwargs.get("bytetrack", kwargs)
        if isinstance(bt, ByteTrackConfig):
            self.cfg = bt
        else:
            known = {f for f in ByteTrackConfig.__dataclass_fields__}
            self.cfg = ByteTrackConfig(**{k: v for k, v in bt.items() if k in known})

        if self.cfg.assignment == "lapjv":
            from rtmodt_tpu.tracking.host_bytetrack import HostByteTrack
            self._host = HostByteTrack(self.cfg)
            self._step = None
        else:
            self.state: TrackState = init_track_state(self.cfg.max_tracks)
            self._step = jax.jit(partial(bytetrack_update, cfg=self.cfg))
        logger.info(f"Tracker initialised: {self.algorithm} "
                    f"({self.cfg.assignment}/{self.cfg.motion_model})")

    # ------------------------------------------------------------------
    def _setup_gmc(self, gmc) -> None:
        """Camera-motion compensation state (``tracking.gmc``, ops/gmc.py).

        When enabled, ``update(detections, frame)`` estimates the dominant
        scene translation between consecutive frames by phase correlation
        and shifts the whole track state into current-frame coordinates
        before association - the BoT-SORT insight, done with two tiny FFTs
        on device instead of a host OpenCV sparse-flow pass."""
        from rtmodt_tpu.config.loader import GMCConfig

        if gmc is None or isinstance(gmc, GMCConfig):
            self.gmc_cfg = gmc or GMCConfig()
        else:
            known = GMCConfig.__dataclass_fields__
            self.gmc_cfg = GMCConfig(**{k: v for k, v in gmc.items()
                                        if k in known})
        self._gmc_prev = None
        if self.gmc_cfg.method == "none":
            return
        from rtmodt_tpu.ops.gmc import compensate, luma_grid, phase_shift

        cfg = self.gmc_cfg

        @jax.jit
        def grid_fn(frame):
            return luma_grid(frame, cfg.grid)

        @jax.jit
        def shift_fn(prev, cur, scale_xy):
            s, conf = phase_shift(prev, cur, cfg.min_ratio,
                                  cfg.max_shift_frac)
            return s * scale_xy, conf

        self._gmc_grid_fn = grid_fn
        self._gmc_shift_fn = shift_fn
        self._gmc_comp = jax.jit(compensate)
        logger.info(f"Tracker GMC enabled: phase correlation on a "
                    f"{cfg.grid}x{cfg.grid} luma grid")

    def _gmc_apply(self, frame: np.ndarray) -> None:
        """Estimate camera motion vs the previous frame and compensate the
        track state (no-op on the first frame / after reset)."""
        cur = self._gmc_grid_fn(jax.device_put(frame))
        if self._gmc_prev is not None:
            h, w = frame.shape[:2]
            scale = np.asarray([w / self.gmc_cfg.grid,
                                h / self.gmc_cfg.grid], np.float32)
            shift, _ = self._gmc_shift_fn(self._gmc_prev, cur, scale)
            self.state = self._gmc_comp(self.state, shift)
        self._gmc_prev = cur

    # ------------------------------------------------------------------
    def embed_fn(self, normalized: bool = False):
        """Jitted (image, boxes) -> (D, E) embedding helper for deepsort.

        ``normalized=False``: image is raw uint8 BGR in [0, 255] (the façade
        standalone path); ``normalized=True``: image is the letterboxed RGB
        float in [0, 1] already on device (the fused pipeline path).  The
        embedder's input convention is RGB [0, 255].
        """
        key = normalized
        if key in self._embed_fns:
            return self._embed_fns[key]
        from rtmodt_tpu.ops.roi import crop_and_resize

        crop_hw = tuple(self.cfg.crop_hw)
        model, params = self.embedder, self.embedder_params

        @jax.jit
        def fn(image, boxes):
            crops = crop_and_resize(image, boxes, crop_hw)
            crops = crops * 255.0 if normalized else crops[..., ::-1]
            return model.apply(params, crops)

        self._embed_fns[key] = fn
        return fn

    def state_arrays(self) -> dict:
        """Tracker state as a flat dict of host numpy arrays (the snapshot
        payload; see also ``runtime/state_store.py`` which composes this
        with the zone-engine state into one pipeline snapshot)."""
        import numpy as np

        if self._host is not None:
            raise NotImplementedError("host-tracker state save not supported")
        host = jax.device_get(self.state)
        n = len(self._trail_map)
        trail_data = np.asarray(
            [t + [(-1, -1)] * (self._trail_maxlen - len(t))
             for t in self._trail_map.values()], np.int64)
        out = {k: np.asarray(v) for k, v in host._asdict().items()}
        out["trail_ids"] = np.asarray(list(self._trail_map.keys()), np.int64)
        # explicit shape: reshape(-1) cannot infer a dim on the
        # empty (fresh/reset) tracker
        out["trail_data"] = trail_data.reshape(
            n, self._trail_maxlen if n else 0, 2)
        return out

    def load_state_arrays(self, z) -> None:
        """Inverse of :meth:`state_arrays`; ``z`` is any mapping of arrays
        (an open ``np.load`` handle or a plain dict)."""
        from rtmodt_tpu.tracking.bytetrack import TrackState
        from rtmodt_tpu.tracking.deepsort import DeepSortState
        from rtmodt_tpu.tracking.ocsort import OCSortState

        cls = {"deepsort": DeepSortState,
               "botsort": DeepSortState,     # botsort shares the pytree
               "ocsort": OCSortState}.get(self.algorithm, TrackState)
        fields = {k: jnp.asarray(z[k]) for k in cls._fields}
        self.state = cls(**fields)
        self._trail_map.clear()
        for tid, trail in zip(z["trail_ids"], z["trail_data"]):
            pts = [(int(x), int(y)) for x, y in trail if x >= 0]
            self._trail_map[int(tid)] = pts

    def save_state(self, path: str) -> None:
        """Serialize tracker state for stream-resume - a capability the
        reference lacks (its tracker state dies with the process,
        SURVEY.md 5.4)."""
        import numpy as np

        np.savez(path, **self.state_arrays())

    def load_state(self, path: str) -> None:
        import numpy as np

        with np.load(path) as z:
            self.load_state_arrays(z)

    def reset(self) -> None:
        self._trail_map.clear()
        self._gmc_prev = None
        if self._host is not None:
            self._host._tracks.clear()
            self._host._next_id = 1
        elif self.algorithm in ("deepsort", "botsort"):
            from rtmodt_tpu.tracking.deepsort import init_deepsort_state
            self.state = init_deepsort_state(self.cfg.max_tracks, self.cfg.embed_dim)
        elif self.algorithm == "ocsort":
            from rtmodt_tpu.tracking.ocsort import init_ocsort_state
            self.state = init_ocsort_state(self.cfg.max_tracks, self.cfg.delta_t)
        else:
            self.state = init_track_state(self.cfg.max_tracks)

    def update(self, detections, frame: np.ndarray | None = None) -> list[Track]:
        """Reference-compatible API: Detections in, active Track list out.

        ``frame`` (BGR uint8) is required for ``deepsort`` - appearance
        embeddings are computed on device from ROI crops of it.
        """
        names = getattr(detections, "class_names", [])
        if self._host is not None:
            raw = self._host.update(detections.xyxy, detections.confidence,
                                    detections.class_id)
            self._prune_trails()
            return [self._to_track(r, names) for r in raw]

        if self.gmc_cfg.method != "none" and frame is not None:
            self._gmc_apply(frame)

        d = len(detections)
        # pad to power-of-two buckets (min 8): a fresh XLA trace/compile per
        # DISTINCT detection count would make varying-D video unusably slow
        pad = max(8, 1 << (d - 1).bit_length()) if d else 8
        boxes = np.zeros((pad, 4), np.float32)
        conf = np.zeros((pad,), np.float32)
        cls = np.full((pad,), -1, np.int32)
        valid = np.zeros((pad,), bool)
        boxes[:d] = detections.xyxy
        conf[:d] = detections.confidence
        cls[:d] = detections.class_id
        valid[:d] = True
        if self.algorithm in ("deepsort", "botsort"):
            if frame is None:
                raise ValueError(f"{self.algorithm} requires the frame for "
                                 "appearance embeddings: "
                                 "update(detections, frame)")
            feats = self.embed_fn()(jax.device_put(frame), boxes)
            self.state, outputs = self._step(self.state, boxes, conf, cls,
                                             valid, feats)
        else:
            self.state, outputs = self._step(self.state, boxes, conf, cls, valid)
        return self.tracks_from_outputs(outputs, names)

    def tracks_chunk_from_outputs(self, host_outputs, names: list[str],
                                  with_indices: bool = False):
        """Bulk host conversion for a CHUNK of TrackOutputs (leading K axis):
        one vectorized visibility pass, Track objects built only for visible
        slots. Cheaper than K separate ``tracks_from_outputs`` calls.

        With ``with_indices=True`` also returns, per frame, the slot indices
        (in track order) - used to align device-computed per-slot data such
        as zone masks with the Track list."""
        visible = np.asarray(host_outputs.visible)          # (K, S)
        track_id = np.asarray(host_outputs.track_id)
        boxes = np.asarray(host_outputs.boxes)
        conf = np.asarray(host_outputs.confidence)
        cls = np.asarray(host_outputs.class_id)
        age = np.asarray(host_outputs.age)
        tsu = np.asarray(host_outputs.tsu)
        out: list[list[Track]] = []
        indices: list[np.ndarray] = []
        for f in range(visible.shape[0]):
            idx = np.where(visible[f])[0]
            idx = idx[np.argsort(track_id[f, idx])] if len(idx) else idx
            frame_tracks = [self._to_track({
                "track_id": int(track_id[f, i]),
                "xyxy": boxes[f, i],
                "confidence": float(conf[f, i]),
                "class_id": int(cls[f, i]),
                "age": int(age[f, i]),
                "time_since_update": int(tsu[f, i]),
            }, names) for i in idx]
            out.append(frame_tracks)
            indices.append(idx)
            self._prune_trails()
        return (out, indices) if with_indices else out

    def tracks_from_outputs(self, outputs, names: list[str]) -> list[Track]:
        """Build host Track objects from a step's TrackOutputs (device or host
        arrays). Fetches only the compact output leaves, never the full state."""
        host = jax.device_get(outputs)
        visible = np.asarray(host.visible)
        self._prune_trails()
        idx = np.where(visible)[0]
        out: list[Track] = []
        for i in idx[np.argsort(host.track_id[idx])] if len(idx) else []:
            r = {
                "track_id": int(host.track_id[i]),
                "xyxy": np.asarray(host.boxes[i], np.float32),
                "confidence": float(host.confidence[i]),
                "class_id": int(host.class_id[i]),
                "age": int(host.age[i]),
                "time_since_update": int(host.tsu[i]),
            }
            out.append(self._to_track(r, names))
        return out

    def _prune_trails(self) -> None:
        """Drop trails of ids unseen for far longer than any re-match window
        (ZoneEventEngine does the same for its occupancy maps)."""
        self._frame_count += 1
        if self._frame_count % 512:
            return
        buffer = getattr(self.cfg, "track_buffer", None) or getattr(
            self.cfg, "max_age", 30)
        horizon = max(600, 4 * int(buffer))
        dead = [tid for tid, seen in self._trail_seen.items()
                if self._frame_count - seen > horizon]
        for tid in dead:
            self._trail_seen.pop(tid, None)
            self._trail_map.pop(tid, None)

    def _to_track(self, r: dict, names: list[str]) -> Track:
        tid = r["track_id"]
        self._trail_seen[tid] = self._frame_count
        cx = int((r["xyxy"][0] + r["xyxy"][2]) / 2)
        cy = int((r["xyxy"][1] + r["xyxy"][3]) / 2)
        trail = self._trail_map[tid]
        trail.append((cx, cy))
        if len(trail) > self._trail_maxlen:
            trail.pop(0)
        cid = r["class_id"]
        return Track(
            track_id=tid,
            xyxy=np.asarray(r["xyxy"], np.float32),
            confidence=r["confidence"],
            class_id=cid,
            class_name=names[cid] if 0 <= cid < len(names) else "",
            age=r["age"],
            time_since_update=r["time_since_update"],
            trail=list(trail),
        )
