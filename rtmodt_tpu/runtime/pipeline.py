"""The live pipeline: decode -> detect -> track -> events -> render.

TPU-native inversion of the reference main loop (``tools/run_pipeline.py:
119-166``): instead of five host stages with a GPU round-trip in the middle,
the hot path is jitted XLA programs fed by a reader thread.

Execution modes:
  * per-stage (``profiling.per_stage: true``): preprocess / inference / nms /
    tracking as separate jitted programs with sync timing between them -
    same stage taxonomy as the reference profiler, comparable numbers.
    Intermediate tensors STAY ON DEVICE between stages; only the final
    visible-track arrays come back to the host.
  * fused: ONE jitted detect+track step per frame (lowest latency).
  * chunked (``parallel.chunk_size > 1`` or the ``submit_chunk*`` APIs):
    K frames per ``lax.scan`` dispatch with the model batched across the
    chunk and only the tracker scanning - maximum throughput; frames travel
    as packed planar I420 through the planar stem (see ops/planar_stem.py).

Reference-bug fixes carried here (SURVEY.md 3.6): frames are consumed by id
(no silent duplicate re-processing), the video writer uses the real frame
size/fps, and the profiler also records true end-to-end frame time.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtmodt_tpu.config.loader import PipelineConfig
from rtmodt_tpu.detection.detector import Detector
from rtmodt_tpu.events.zone_engine import ZoneEventEngine
from rtmodt_tpu.ops.letterbox import letterbox, letterbox_meta, unletterbox_boxes
from rtmodt_tpu.ops.nms import batched_nms_fixed, batched_nms_from_logits
from rtmodt_tpu.profiling.latency_profiler import LatencyProfiler
from rtmodt_tpu.tracking.bytetrack import bytetrack_update, init_track_state
from rtmodt_tpu.tracking.tracker import MultiObjectTracker
from rtmodt_tpu.utils.logging import logger
from rtmodt_tpu.visualization.renderer import FrameRenderer


from rtmodt_tpu.ops.gmc import gmc_step as _gmc_step


def _host_cpus() -> int:
    """Cores actually available to this process (cgroup-aware where the
    platform supports it) - the x24 auto-upgrade decision input."""
    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:      # non-Linux
        return os.cpu_count() or 1


class Pipeline:
    """Orchestrates one stream end-to-end. Use ``run()`` for the CLI loop or
    ``step(frame, frame_id, ts)`` to drive it frame-by-frame."""

    def __init__(self, cfg: PipelineConfig, warmup_shape: tuple[int, int] | None = None):
        from rtmodt_tpu.utils.jax_setup import setup_jax

        setup_jax(platform="cpu" if cfg.system.device == "cpu" else None)
        self.cfg = cfg
        self.detector = Detector(cfg.detection, warmup=False)
        self.tracker = MultiObjectTracker(
            cfg.tracking.algorithm,
            trail_length=cfg.tracking.trail_length,
            bytetrack=cfg.tracking.bytetrack,
            deepsort=cfg.tracking.deepsort,
            botsort=cfg.tracking.botsort,
            ocsort=cfg.tracking.ocsort,
            gmc=cfg.tracking.gmc,
        )
        # appearance trackers (deepsort, botsort) need per-detection ROI
        # embeddings inside the jitted step and share the same update
        # signature (tracking/deepsort.py, tracking/botsort.py)
        self._is_appearance = self.tracker.algorithm in ("deepsort", "botsort")
        # motion-only tracker update shared by the fused/packed/chunked
        # programs (bytetrack and ocsort have the same step signature;
        # deepsort needs appearance features and keeps its own builders)
        if self.tracker.algorithm == "ocsort":
            from rtmodt_tpu.tracking.ocsort import ocsort_update

            self._mot_update = partial(ocsort_update, cfg=cfg.tracking.ocsort)
            self._mot_repr = repr(cfg.tracking.ocsort)
        else:
            self._mot_update = partial(bytetrack_update,
                                       cfg=cfg.tracking.bytetrack)
            self._mot_repr = repr(cfg.tracking.bytetrack)
        self.events: Optional[ZoneEventEngine] = (
            ZoneEventEngine.from_config(cfg.events,
                                        trail_length=cfg.tracking.trail_length)
            if cfg.events.enabled and cfg.events.zones
            else None
        )
        # With ``events.device_masks`` on, zone containment is computed ON
        # DEVICE over the chunk's track slots (one tiny jitted dispatch per
        # chunk); the host engine only does dwell/cooldown bookkeeping.
        self._mask_fn = None
        if self.events is not None and cfg.events.device_masks:
            from rtmodt_tpu.ops.polygon import pad_polygons, points_in_polygons

            polys = jnp.asarray(pad_polygons(
                [z.polygon.tolist() for z in self.events.zones],
                cfg.events.max_vertices))

            @jax.jit
            def mask_fn(boxes):
                """(..., S, 4) slot boxes -> (..., S, Z) containment bools."""
                cents = (boxes[..., 0:2] + boxes[..., 2:4]) * 0.5
                flat = cents.reshape(-1, 2)
                m = points_in_polygons(flat, polys)
                return m.reshape(cents.shape[:-1] + (polys.shape[0],))

            self._mask_fn = mask_fn
        self.profiler = LatencyProfiler(
            enabled=cfg.profiling.enabled,
            warmup_frames=cfg.profiling.warmup_frames,
            log_interval=cfg.profiling.log_interval,
        )
        v = cfg.visualization
        # mjpeg_port implies visualization (the live monitor streams
        # ANNOTATED frames), matching MultiStreamPipeline's semantics -
        # config-only mjpeg_port must behave the same on both paths
        self.renderer = FrameRenderer(
            show_boxes=v.show_boxes, show_labels=v.show_labels,
            show_trails=v.show_trails, show_zones=v.show_zones,
            show_hud=v.show_hud, trail_length=v.trail_length,
        ) if (v.enabled or v.mjpeg_port is not None) else None

        # camera-motion compensation (tracking.gmc, ops/gmc.py): every
        # jitted detect+track program estimates the scene translation vs
        # the previous frame from the SAME luma it already has on device
        # and shifts the track state before association.  The carry is the
        # previous frame's (G, G) luma grid + a validity scalar (0.0 until
        # the first frame has been seen).
        self._gmc_on = cfg.tracking.gmc.method == "phase"
        self._gmc_repr = repr(cfg.tracking.gmc)
        self._gmc_carry = None
        self._gmc_reset()
        self._per_stage = cfg.profiling.per_stage
        self._trace_state = {"frames_left": 0, "active": False}
        self._stage_fns: dict[tuple[int, int], Any] = {}
        self._fused_fns: dict[tuple[int, int], Any] = {}
        self._front_pack: Any = None       # precomputed s2d front kernels
        self._front_pack_key: int | None = None
        self._chunk_fns: dict[tuple[int, int, int], Any] = {}
        self._track_fn = jax.jit(self._mot_update)
        if warmup_shape:
            self.warmup(warmup_shape)

    # ------------------------------------------------------------------
    # jitted stage builders (cached per input resolution)
    # ------------------------------------------------------------------
    def _stages_for(self, h: int, w: int):
        key = (h, w)
        if key in self._stage_fns:
            return self._stage_fns[key]
        dcfg = self.cfg.detection
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask

        @jax.jit
        def pre_fn(frame_u8):
            img, _ = letterbox(frame_u8, dcfg.input_size, dtype=dtype)
            return img

        @jax.jit
        def fwd_fn(params, img):
            return model.apply(params, img[None], train=False)

        @jax.jit
        def nms_fn(raw):
            box_dist, cls_logits = raw
            res = batched_nms_from_logits(
                box_dist[0], cls_logits[0], dcfg.input_size,
                dcfg.conf_threshold, dcfg.iou_threshold,
                dcfg.max_detections, dcfg.nms_candidates, class_mask, dcfg.agnostic_nms,
                impl=dcfg.nms_impl, topk=dcfg.topk_impl,
            )
            meta = letterbox_meta(h, w, dcfg.input_size)
            return res._replace(boxes=unletterbox_boxes(res.boxes, meta))

        self._stage_fns[key] = (pre_fn, fwd_fn, nms_fn)
        return self._stage_fns[key]

    def _fused_deepsort_for(self, h: int, w: int):
        """ONE jitted program: letterbox -> YOLO -> NMS -> ROI crop ->
        appearance embed -> DeepSORT/BoT-SORT associate/update.  The
        detection patches and embeddings never exist on the host."""
        key = (self.tracker.algorithm, h, w)
        if key in self._fused_fns:
            return self._fused_fns[key]
        from rtmodt_tpu.ops.roi import crop_and_resize

        app_update = self.tracker.appearance_update
        dcfg = self.cfg.detection
        dscfg = self.tracker.cfg
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        embedder = self.tracker.embedder
        emb_params = self.tracker.embedder_params
        crop_hw = tuple(dscfg.crop_hw)
        donate = (1,) if self.cfg.parallel.donate_state else ()
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (w / gcfg.grid, h / gcfg.grid)

        @partial(jax.jit, donate_argnums=donate)
        def step_fn(params, state, frame_u8, gmc_grid=None, gmc_valid=None):
            if gmc_on:          # static at trace time
                state, carry = _gmc_step(state, frame_u8,
                                         (gmc_grid, gmc_valid), gcfg, scale_xy)
            img, meta = letterbox(frame_u8, dcfg.input_size, dtype=dtype)
            box_dist, cls_logits = model.apply(params, img[None], train=False)
            res = batched_nms_from_logits(
                box_dist[0], cls_logits[0], dcfg.input_size,
                dcfg.conf_threshold, dcfg.iou_threshold,
                dcfg.max_detections, dcfg.nms_candidates, class_mask,
                dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl,
            )
            # crop from the letterboxed image while boxes are still in its
            # coordinates; embedder convention is RGB [0, 255]
            crops = crop_and_resize(img.astype(jnp.float32), res.boxes, crop_hw) * 255.0
            feats = embedder.apply(emb_params, crops)
            res = res._replace(boxes=unletterbox_boxes(res.boxes, meta))
            state, outputs = app_update(
                state, res.boxes, res.scores, res.classes, res.valid, feats)
            if gmc_on:
                return state, outputs, res, carry
            return state, outputs, res

        self._fused_fns[key] = step_fn
        return step_fn

    def _fused_for(self, h: int, w: int):
        if self._is_appearance:
            return self._fused_deepsort_for(h, w)
        key = (h, w)
        if key in self._fused_fns:
            return self._fused_fns[key]
        dcfg = self.cfg.detection
        mot_update = self._mot_update
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        donate = (1,) if self.cfg.parallel.donate_state else ()
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (w / gcfg.grid, h / gcfg.grid)

        @partial(jax.jit, donate_argnums=donate)
        def step_fn(params, state, frame_u8, gmc_grid=None, gmc_valid=None):
            if gmc_on:          # static at trace time
                state, carry = _gmc_step(state, frame_u8,
                                         (gmc_grid, gmc_valid), gcfg, scale_xy)
            img, meta = letterbox(frame_u8, dcfg.input_size, dtype=dtype)
            box_dist, cls_logits = model.apply(params, img[None], train=False)
            res = batched_nms_from_logits(
                box_dist[0], cls_logits[0], dcfg.input_size,
                dcfg.conf_threshold, dcfg.iou_threshold,
                dcfg.max_detections, dcfg.nms_candidates, class_mask, dcfg.agnostic_nms,
                impl=dcfg.nms_impl, topk=dcfg.topk_impl,
            )
            res = res._replace(boxes=unletterbox_boxes(res.boxes, meta))
            state, outputs = mot_update(
                state, res.boxes, res.scores, res.classes, res.valid)
            if gmc_on:
                return state, outputs, res, carry
            return state, outputs, res

        self._fused_fns[key] = step_fn
        return step_fn

    def _gmc_reset(self) -> None:
        """(Re)initialize the camera-motion carry: zero grid + valid=0, so
        the first frame after init/warmup/reset never compensates."""
        if self._gmc_on:
            g = self.cfg.tracking.gmc.grid
            self._gmc_carry = (jnp.zeros((g, g), jnp.float32),
                               jnp.float32(0.0))

    def _run_prog(self, fn, *args):
        """Invoke a jitted detect+track program, threading the GMC carry
        as trailing (grid, valid) args / trailing carry output when on."""
        if self._gmc_on:
            *rest, carry = fn(*args, *self._gmc_carry)
            self._gmc_carry = carry
            return rest
        return fn(*args)

    def _gmc_stage_fn(self):
        """Standalone jitted GMC step for per-stage mode (the fused paths
        inline _gmc_step into their programs instead)."""
        if getattr(self, "_gmc_stage", None) is None:
            gcfg = self.cfg.tracking.gmc

            @jax.jit
            def fn(state, frame, grid, valid, scale_xy):
                return _gmc_step(state, frame, (grid, valid), gcfg, scale_xy)

            self._gmc_stage = fn
        return self._gmc_stage

    def _get_front_pack(self):
        """Precomputed packed s2d-front kernels, cached per weight set
        (ops/s2d_front.py::precompute_front).  None in int8 mode (the
        quant interceptor wraps the Flax modules the front bypasses)."""
        if self.cfg.detection.quant != "none":
            return None
        if self._front_pack_key != self.detector.params_version:
            from rtmodt_tpu.ops.s2d_front import precompute_front

            self._front_pack = jax.jit(precompute_front)(self.detector.params)
            self._front_pack_key = self.detector.params_version
        return self._front_pack

    def _packed_fused_for(self, src_h: int, src_w: int):
        """Single-frame fused step over PLANAR I420 input - the low-latency
        twin of ``_packed_chunk_for`` (7.5x less transfer than the BGR fused
        path, one dispatch per frame).  Takes the SINGLE (ch*3/2, cw) packed
        I420 buffer ``pack_i420`` emits - one host->device put per frame;
        through a high-latency link each extra put costs a full round trip,
        so the plane split happens on device (free slicing under jit).

        Appearance trackers (deepsort/botsort) ride the same program: ROI
        crops come straight from the padded Y/U/V planes
        (``ops.roi.crop_yuv_rgb``) into the embedder, like the chunked
        appearance path - the RGB frame never exists."""
        key = ("i420_fused", self.tracker.algorithm, src_h, src_w)
        if key in self._fused_fns:
            return self._fused_fns[key]
        from rtmodt_tpu.ops.planar_stem import pad_planes
        from rtmodt_tpu.ops.s2d_front import apply_front, s2d_front_apply_packed
        from rtmodt_tpu.ops.yuv import (content_dims, packed_meta,
                                       unletterbox_boxes_packed)

        dcfg = self.cfg.detection
        mot_update = self._mot_update
        is_app = self._is_appearance
        if is_app:
            from rtmodt_tpu.ops.roi import crop_yuv_rgb

            app_update = self.tracker.appearance_update
            embedder = self.tracker.embedder
            emb_params = self.tracker.embedder_params
            crop_hw = tuple(self.tracker.cfg.crop_hw)
            mot_repr = repr(self.tracker.cfg)
        else:
            mot_repr = self._mot_repr
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        donate = (2,) if self.cfg.parallel.donate_state else ()
        size = dcfg.input_size
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        pad_left, pad_top = meta.pad_left, meta.pad_top
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        # grid units -> content px (cw/G) -> source px (src_w/cw) = src_w/G
        scale_xy = (src_w / gcfg.grid, src_h / gcfg.grid)

        n_chroma = (ch // 2) * (cw // 2)

        def step_fn(params, front_pack, state, yuv, gmc_grid=None,
                    gmc_valid=None):
            # front_pack: precomputed packed front kernels (None in int8
            # mode) - per-frame steps must not repack weights every frame
            y = yuv[:ch]
            chroma = yuv[ch:].reshape(-1)
            u = chroma[:n_chroma].reshape(ch // 2, cw // 2)
            v = chroma[n_chroma:2 * n_chroma].reshape(ch // 2, cw // 2)
            if gmc_on:
                # luma is the content Y, pooled to half res so per-frame
                # and chunked/x6 paths all see identical grids
                from rtmodt_tpu.ops.gmc import half_res_luma

                state, carry = _gmc_step(state, half_res_luma(y),
                                         (gmc_grid, gmc_valid),
                                         gcfg, scale_xy)
            yp, up, vp = pad_planes(y[None], u[None], v[None], size,
                                    pad_left, pad_top)
            if front_pack is not None:
                feats = s2d_front_apply_packed(front_pack, yp, up, vp,
                                               dtype=dtype)
                box_dist, cls_logits = model.apply(params, feats, train=False,
                                                   skip_front=True)
            else:
                box_dist, cls_logits = apply_front(params, model, yp, up, vp,
                                                   dcfg.quant, dtype)
            res = batched_nms_from_logits(
                box_dist[0], cls_logits[0], size,
                dcfg.conf_threshold, dcfg.iou_threshold,
                dcfg.max_detections, dcfg.nms_candidates, class_mask,
                dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl)
            if is_app:
                # crop while boxes are still in model-input coordinates
                # (same convention as _packed_chunk_deepsort_for)
                crops = crop_yuv_rgb(yp[0].astype(jnp.float32),
                                     up[0].astype(jnp.float32),
                                     vp[0].astype(jnp.float32),
                                     res.boxes, crop_hw)
                feats = embedder.apply(emb_params, crops)
                res = res._replace(
                    boxes=unletterbox_boxes_packed(res.boxes, meta))
                state, outputs = app_update(
                    state, res.boxes, res.scores, res.classes, res.valid,
                    feats)
            else:
                res = res._replace(
                    boxes=unletterbox_boxes_packed(res.boxes, meta))
                state, outputs = mot_update(
                    state, res.boxes, res.scores, res.classes, res.valid)
            if gmc_on:
                return state, outputs, res, carry
            return state, outputs, res

        def build():
            return jax.jit(step_fn, donate_argnums=donate)

        # the live path's cold-start is dominated by tracing this program;
        # serialize it once (runtime/aot_cache.py) so restarts and latency
        # benches skip straight to the persistently-cached XLA compile
        from rtmodt_tpu.runtime.aot_cache import aot_cached

        def example_args():
            yuv0 = np.zeros((ch + ch // 2, cw), np.uint8)
            base = (self.detector.params, self._get_front_pack(),
                    self.tracker.state, yuv0)
            if gmc_on:
                return base + (np.zeros((gcfg.grid, gcfg.grid), np.float32),
                               np.float32(0.0))
            return base

        sig = jax.tree.map(lambda x: (tuple(x.shape), str(x.dtype)),
                           (self.detector.params, self._get_front_pack()))
        self._fused_fns[key] = aot_cached(
            ("pipe_fused_packed", repr(dcfg), mot_repr, self._gmc_repr,
             src_h, src_w,
             donate, sig),
            build, example_args)
        return self._fused_fns[key]

    def step_packed(self, frame_bgr: np.ndarray, frame_id: int,
                    timestamp: float | None = None):
        """Low-latency per-frame path over packed transport: host packs ONE
        frame to planar I420 (~0.4 MB), device runs the fused step."""
        self._maybe_trace()
        from rtmodt_tpu.ops.yuv import pack_i420

        h, w = frame_bgr.shape[:2]
        yuv, _ = pack_i420(frame_bgr, self.cfg.detection.input_size)
        fn = self._packed_fused_for(h, w)
        p = self.profiler
        p.tick("inference")
        self.tracker.state, outputs, res = self._run_prog(
            fn, self.detector.params, self._get_front_pack(),
            self.tracker.state, jax.device_put(yuv))
        tracks = self.tracker.tracks_from_outputs(outputs, self.detector.class_names)
        p.tock("inference")
        p.tick("events")
        events = self.events.process(tracks, frame_id, timestamp) if self.events else []
        p.tock("events")
        return tracks, events, res

    def _chunk_for(self, h: int, w: int, k: int):
        """Jitted K-frame streaming step: ``lax.scan`` of the fused detect+track
        body over a (K, H, W, 3) frame chunk, carrying tracker state through.

        Semantically identical to K sequential per-frame steps, but costs ONE
        dispatch + ONE host sync per K frames - this is what keeps the TPU fed
        when host<->device latency is high (SURVEY.md 7 hard part 3).
        """
        key = (h, w, k)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        dcfg = self.cfg.detection
        mot_update = self._mot_update
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        donate = (1,) if self.cfg.parallel.donate_state else ()
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (w / gcfg.grid, h / gcfg.grid)

        @partial(jax.jit, donate_argnums=donate)
        def chunk_fn(params, state, frames_u8, gmc_grid=None, gmc_valid=None):
            def body(st_carry, frame_u8):
                if gmc_on:      # static at trace time
                    st, gc = st_carry
                    st, gc = _gmc_step(st, frame_u8, gc, gcfg, scale_xy)
                else:
                    st = st_carry
                img, meta = letterbox(frame_u8, dcfg.input_size, dtype=dtype)
                box_dist, cls_logits = model.apply(params, img[None], train=False)
                res = batched_nms_from_logits(
                    box_dist[0], cls_logits[0], dcfg.input_size,
                    dcfg.conf_threshold, dcfg.iou_threshold,
                    dcfg.max_detections, dcfg.nms_candidates, class_mask,
                    dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl,
                )
                res = res._replace(boxes=unletterbox_boxes(res.boxes, meta))
                st, outputs = mot_update(
                    st, res.boxes, res.scores, res.classes, res.valid)
                return ((st, gc) if gmc_on else st), (outputs, res)

            init = (state, (gmc_grid, gmc_valid)) if gmc_on else state
            fin, (outs, ress) = jax.lax.scan(body, init, frames_u8)
            if gmc_on:
                state, carry = fin
                return state, outs, ress, carry
            return fin, outs, ress

        self._chunk_fns[key] = chunk_fn
        return chunk_fn

    def _packed_chunk_for(self, src_h: int, src_w: int, k: int):
        """K-frame streaming step over PLANAR I420 input (``ops.yuv``).

        Structure exploits what is and is not sequential: detection has no
        frame-to-frame dependency, so preprocessing, the model forward, DFL
        decode and NMS all run BATCHED over the K frames (bigger convs, MXU-
        friendly); only the ByteTrack update scans sequentially - it is the
        sole true recurrence.  The host ships 12-bit/px decoder-native frames
        at model content size (7.5x less link traffic than BGR 720p).
        """
        key = ("i420", src_h, src_w, k)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        from rtmodt_tpu.ops.planar_stem import pad_planes
        from rtmodt_tpu.ops.s2d_front import apply_front
        from rtmodt_tpu.ops.yuv import (content_dims, packed_meta,
                                       unletterbox_boxes_packed)

        dcfg = self.cfg.detection
        mot_update = self._mot_update
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        donate = (1,) if self.cfg.parallel.donate_state else ()
        size = dcfg.input_size
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        pad_left, pad_top = meta.pad_left, meta.pad_top
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (src_w / gcfg.grid, src_h / gcfg.grid)

        def chunk(params, state, y, u, v, gmc_grid=None, gmc_valid=None):
            # planar front: the (S, S, 3) image tensor never exists; the
            # first four blocks run in space-to-depth layout (ops/s2d_front)
            yp, up, vp = pad_planes(y, u, v, size, pad_left, pad_top)
            box_dist, cls_logits = apply_front(params, model, yp, up, vp,
                                               dcfg.quant, dtype)

            def one_nms(bd, cl):
                res = batched_nms_from_logits(
                    bd, cl, size, dcfg.conf_threshold, dcfg.iou_threshold,
                    dcfg.max_detections, dcfg.nms_candidates, class_mask,
                    dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl)
                return res._replace(boxes=unletterbox_boxes_packed(res.boxes, meta))

            ress = jax.vmap(one_nms)(box_dist, cls_logits)   # parallel across frames

            if gmc_on:          # static at trace time
                from rtmodt_tpu.ops.gmc import half_res_luma, luma_grid

                # luma grids for all K frames batched (content Y planes),
                # pooled to half res first so the grids are numerically
                # identical to the x6 transport's parity-channel mean
                grids = jax.vmap(
                    lambda yy: luma_grid(half_res_luma(yy), gcfg.grid))(y)

                def body(st_carry, xs):
                    res, grid_t = xs
                    st, gc = st_carry
                    st, gc = _gmc_step(st, grid_t, gc, gcfg, scale_xy)
                    st, outputs = mot_update(
                        st, res.boxes, res.scores, res.classes, res.valid)
                    return (st, gc), outputs

                (state, carry), outs = jax.lax.scan(
                    body, (state, (gmc_grid, gmc_valid)), (ress, grids))
                return state, outs, ress, carry

            def body(st, res):
                st, outputs = mot_update(
                    st, res.boxes, res.scores, res.classes, res.valid)
                return st, outputs

            state, outs = jax.lax.scan(body, state, ress)
            return state, outs, ress

        def build():
            return jax.jit(chunk, donate_argnums=donate)

        # tracing the scan-over-K tracker program costs tens of seconds per
        # process; serialize it once so later cold-starts (bench passes,
        # CLI restarts) deserialize in milliseconds (runtime/aot_cache.py)
        from rtmodt_tpu.runtime.aot_cache import aot_cached

        def example_args():
            y0 = np.zeros((k, ch, cw), np.uint8)
            u0 = np.zeros((k, ch // 2, cw // 2), np.uint8)
            base = (self.detector.params, self.tracker.state, y0, u0,
                    u0.copy())
            if gmc_on:
                return base + (np.zeros((gcfg.grid, gcfg.grid), np.float32),
                               np.float32(0.0))
            return base

        param_sig = jax.tree.map(
            lambda x: (tuple(x.shape), str(x.dtype)), self.detector.params)
        self._chunk_fns[key] = aot_cached(
            ("pipe_packed", repr(dcfg), self._mot_repr, self._gmc_repr,
             src_h, src_w, k, donate, param_sig),
            build, example_args)
        return self._chunk_fns[key]

    def _x6_transport(self) -> bool:
        """Whether the chunk path ships a space-to-depth layout
        (ops/yuv.py::planes_to_x6 / planes_to_x24) instead of planar
        I420.  Same link bytes; moves the s2d lane shuffle from the
        device VPU (~0.065 ms/frame, docs/PERF_NOTES.md) to a strided
        host copy on the ingest worker.  ``packed`` auto-selects it where
        the s2d front runs (quant off, motion trackers); ``i420`` pins
        the planar layout; appearance trackers keep planes for their ROI
        crops."""
        t = self.cfg.parallel.transport
        if t in ("x6", "x24"):
            return True
        return (t == "packed" and self.cfg.detection.quant == "none"
                and not self._is_appearance)

    def _s2d_level(self, src_h: int, src_w: int) -> int:
        """Space-to-depth transport level for this source geometry: 2 =
        x24 (double s2d - the 24-lane stem, round-5 trace win), 1 = x6,
        0 = planar.  x24 needs content dims and letterbox pads divisible
        by 4 so the second blocking commutes with padding; ``packed``
        auto-upgrades to the highest eligible level, ``x6`` pins level 1,
        ``x24`` pins level 2 (and raises on ineligible geometry rather
        than silently changing layout)."""
        from rtmodt_tpu.ops.yuv import content_dims, packed_meta

        if not self._x6_transport():
            return 0
        t = self.cfg.parallel.transport
        size = self.cfg.detection.input_size
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        ok24 = (ch % 4 == 0 and cw % 4 == 0
                and meta.pad_left % 4 == 0 and meta.pad_top % 4 == 0)
        if t == "x6":
            return 1
        if t == "x24":
            if not ok24:
                raise ValueError(
                    f"parallel.transport=x24 pinned but source {src_w}x"
                    f"{src_h} -> content {cw}x{ch} (pads {meta.pad_left},"
                    f"{meta.pad_top}) is not divisible by 4; use "
                    "transport=packed for auto-selection")
            return 2
        # auto: x24 trades host CPU (the second-octave strided repack,
        # ~1.9 ms/frame at 720p) for device time (-4.5%); on a 1-core
        # host the host is the scarcer resource and the ingest pool
        # would cap e2e throughput, so auto upgrades only when the host
        # has cores to spare (pin transport=x24 to override)
        return 2 if ok24 and _host_cpus() >= 2 else 1

    def _packed_chunk_x6_for(self, src_h: int, src_w: int, k: int,
                             level: int = 1):
        """s2d-transport twin of ``_packed_chunk_for``: consumes the host
        space-to-depth tensor - (K, ch/2, cw/2, 6) at level 1 (x6) or
        (K, ch/4, cw/4, 24) at level 2 (x24, the 24-lane stem) - no
        device-side lane shuffle; GMC luma grids come from the Y parity
        channels, numerically identical to the i420 path's half-res
        pooled grids (ops/gmc.py::half_res_luma, tested by
        tests/test_gmc.py's transport A/B)."""
        key = ("x6" if level == 1 else "x24", src_h, src_w, k)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        from rtmodt_tpu.ops.planar_stem import pad_x24, pad_x6
        from rtmodt_tpu.ops.s2d_front import apply_front_x24, apply_front_x6
        from rtmodt_tpu.ops.yuv import (content_dims, packed_meta,
                                       unletterbox_boxes_packed)

        pad_fn = pad_x6 if level == 1 else pad_x24
        front_fn = apply_front_x6 if level == 1 else apply_front_x24

        dcfg = self.cfg.detection
        mot_update = self._mot_update
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        donate = (1,) if self.cfg.parallel.donate_state else ()
        size = dcfg.input_size
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        pad_left, pad_top = meta.pad_left, meta.pad_top
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (src_w / gcfg.grid, src_h / gcfg.grid)

        def chunk(params, state, x6, gmc_grid=None, gmc_valid=None):
            x6p = pad_fn(x6, size, pad_left, pad_top, dtype=dtype)
            box_dist, cls_logits = front_fn(params, model, x6p, dtype)

            def one_nms(bd, cl):
                res = batched_nms_from_logits(
                    bd, cl, size, dcfg.conf_threshold, dcfg.iou_threshold,
                    dcfg.max_detections, dcfg.nms_candidates, class_mask,
                    dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl)
                return res._replace(boxes=unletterbox_boxes_packed(res.boxes, meta))

            ress = jax.vmap(one_nms)(box_dist, cls_logits)

            if gmc_on:
                from rtmodt_tpu.ops.gmc import (luma_grid, s2d_half_luma,
                                                x24_half_luma)

                # half-res luma from the Y parity channels: same content
                # the i420 path pools, identical grids at either level
                hl = s2d_half_luma if level == 1 else x24_half_luma
                luma = jax.vmap(hl)(x6)
                grids = jax.vmap(lambda yy: luma_grid(yy, gcfg.grid))(luma)

                def body(st_carry, xs):
                    res, grid_t = xs
                    st, gc = st_carry
                    st, gc = _gmc_step(st, grid_t, gc, gcfg, scale_xy)
                    st, outputs = mot_update(
                        st, res.boxes, res.scores, res.classes, res.valid)
                    return (st, gc), outputs

                (state, carry), outs = jax.lax.scan(
                    body, (state, (gmc_grid, gmc_valid)), (ress, grids))
                return state, outs, ress, carry

            def body(st, res):
                st, outputs = mot_update(
                    st, res.boxes, res.scores, res.classes, res.valid)
                return st, outputs

            state, outs = jax.lax.scan(body, state, ress)
            return state, outs, ress

        def build():
            return jax.jit(chunk, donate_argnums=donate)

        from rtmodt_tpu.runtime.aot_cache import aot_cached

        def example_args():
            x0 = (np.zeros((k, ch // 2, cw // 2, 6), np.uint8) if level == 1
                  else np.zeros((k, ch // 4, cw // 4, 24), np.uint8))
            base = (self.detector.params, self.tracker.state, x0)
            if gmc_on:
                return base + (np.zeros((gcfg.grid, gcfg.grid), np.float32),
                               np.float32(0.0))
            return base

        param_sig = jax.tree.map(
            lambda x: (tuple(x.shape), str(x.dtype)), self.detector.params)
        self._chunk_fns[key] = aot_cached(
            ("pipe_packed_x6" if level == 1 else "pipe_packed_x24",
             repr(dcfg), self._mot_repr, self._gmc_repr,
             src_h, src_w, k, donate, param_sig),
            build, example_args)
        return self._chunk_fns[key]

    def _packed_chunk_deepsort_for(self, src_h: int, src_w: int, k: int):
        """Appearance-tracker twin of ``_packed_chunk_for``: same batched
        planar detection, plus per-frame ROI crops taken DIRECTLY from the
        Y/U/V planes (``ops.roi.crop_yuv_rgb`` - color conversion happens per
        crop, the RGB frame never exists) feeding the appearance embedder;
        the DeepSORT/BoT-SORT update is the only sequential part."""
        key = ("i420", self.tracker.algorithm, src_h, src_w, k)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        from rtmodt_tpu.ops.planar_stem import pad_planes
        from rtmodt_tpu.ops.s2d_front import apply_front
        from rtmodt_tpu.ops.roi import crop_yuv_rgb
        from rtmodt_tpu.ops.yuv import (content_dims, packed_meta,
                                       unletterbox_boxes_packed)

        app_update = self.tracker.appearance_update
        dcfg = self.cfg.detection
        dscfg = self.tracker.cfg
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        embedder = self.tracker.embedder
        emb_params = self.tracker.embedder_params
        crop_hw = tuple(dscfg.crop_hw)
        donate = (1,) if self.cfg.parallel.donate_state else ()
        size = dcfg.input_size
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        pad_left, pad_top = meta.pad_left, meta.pad_top

        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (src_w / gcfg.grid, src_h / gcfg.grid)

        @partial(jax.jit, donate_argnums=donate)
        def chunk_fn(params, state, y, u, v, gmc_grid=None, gmc_valid=None):
            yp, up, vp = pad_planes(y, u, v, size, pad_left, pad_top)
            box_dist, cls_logits = apply_front(params, model, yp, up, vp,
                                               dcfg.quant, dtype)

            def per_frame(bd, cl, ypi, upi, vpi):
                res_lb = batched_nms_from_logits(
                    bd, cl, size, dcfg.conf_threshold, dcfg.iou_threshold,
                    dcfg.max_detections, dcfg.nms_candidates, class_mask,
                    dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl)
                crops = crop_yuv_rgb(ypi.astype(jnp.float32),
                                     upi.astype(jnp.float32),
                                     vpi.astype(jnp.float32),
                                     res_lb.boxes, crop_hw)
                emb = embedder.apply(emb_params, crops)
                res = res_lb._replace(boxes=unletterbox_boxes_packed(res_lb.boxes, meta))
                return res, emb

            ress, embs = jax.vmap(per_frame)(box_dist, cls_logits, yp, up, vp)

            if gmc_on:          # static at trace time
                from rtmodt_tpu.ops.gmc import half_res_luma, luma_grid

                # half-res pool first: transport-independent grids (see
                # the packed path above / ops/gmc.py::half_res_luma)
                grids = jax.vmap(
                    lambda yy: luma_grid(half_res_luma(yy), gcfg.grid))(y)

                def body(st_carry, xs):
                    res, emb, grid_t = xs
                    st, gc = st_carry
                    st, gc = _gmc_step(st, grid_t, gc, gcfg, scale_xy)
                    st, outputs = app_update(
                        st, res.boxes, res.scores, res.classes, res.valid, emb)
                    return (st, gc), outputs

                (state, carry), outs = jax.lax.scan(
                    body, (state, (gmc_grid, gmc_valid)), (ress, embs, grids))
                return state, outs, ress, carry

            def body(st, xs):
                res, emb = xs
                st, outputs = app_update(
                    st, res.boxes, res.scores, res.classes, res.valid, emb)
                return st, outputs

            state, outs = jax.lax.scan(body, state, (ress, embs))
            return state, outs, ress

        self._chunk_fns[key] = chunk_fn
        return chunk_fn

    def submit_chunk_packed(self, frames_bgr: np.ndarray):
        """Pack a (K, H, W, 3) BGR chunk to planar I420 on host, async-submit."""
        from rtmodt_tpu.ops.yuv import pack_i420_planar

        k, h, w = frames_bgr.shape[:3]
        planes = [pack_i420_planar(frames_bgr[i], self.cfg.detection.input_size)[0]
                  for i in range(k)]
        y = np.stack([p[0] for p in planes])
        u = np.stack([p[1] for p in planes])
        v = np.stack([p[2] for p in planes])
        return self.submit_packed_yuv((y, u, v), h, w)

    def submit_packed_yuv(self, planes, src_h: int, src_w: int):
        """Async-submit a packed chunk: (y (K,ch,cw), u, v) uint8 planes,
        or - when an s2d transport is active - optionally the pre-packed
        space-to-depth tensor itself ((K, ch/2, cw/2, 6) x6 or
        (K, ch/4, cw/4, 24) x24, built on an ingest worker via
        ``ops.yuv.planes_to_x6`` / ``planes_to_x24``), skipping the
        main-thread rearrangement.  A pre-packed tensor's channel count
        must match the level ``_s2d_level`` selects for this geometry."""
        pre_s2d = isinstance(planes, np.ndarray)
        if pre_s2d:
            if not self._x6_transport():
                raise ValueError("pre-packed s2d tensor submitted but the "
                                 "active transport is not s2d (appearance "
                                 "tracker, int8, or a pinned i420/bgr "
                                 "layout)")
            k = planes.shape[0]
        else:
            y, u, v = planes
            k = y.shape[0]
        if self._is_appearance:
            chunk_fn = self._packed_chunk_deepsort_for(src_h, src_w, k)
            dev_args = (jax.device_put(y), jax.device_put(u),
                        jax.device_put(v))
        elif self._x6_transport():
            from rtmodt_tpu.ops.yuv import planes_to_x24, planes_to_x6

            level = self._s2d_level(src_h, src_w)
            if pre_s2d:
                # a worker-built tensor picks its own level: x6 stays
                # valid even where auto would upgrade to x24 (the caller
                # may not have checked divisibility); a mismatch against
                # a PINNED level is an error
                got = {6: 1, 24: 2}.get(int(planes.shape[-1]))
                t = self.cfg.parallel.transport
                if (got is None or (got == 2 and level != 2)
                        or (t == "x6" and got != 1)
                        or (t == "x24" and got != 2)):
                    raise ValueError(
                        f"pre-packed tensor has {planes.shape[-1]} "
                        f"channels; transport={t!r} with this geometry "
                        f"expects {'6 (x6)' if level == 1 else '6 or 24'}")
                level = got
            chunk_fn = self._packed_chunk_x6_for(src_h, src_w, k,
                                                 level=level)
            pack = planes_to_x6 if level == 1 else planes_to_x24
            dev_args = (jax.device_put(
                planes if pre_s2d else pack(y, u, v)),)
        else:
            chunk_fn = self._packed_chunk_for(src_h, src_w, k)
            dev_args = (jax.device_put(y), jax.device_put(u),
                        jax.device_put(v))
        self.tracker.state, outs, ress = self._run_prog(
            chunk_fn, self.detector.params, self.tracker.state, *dev_args)
        # prefetch only the track outputs; raw detections (ress) stay on
        # device unless the caller actually fetches them
        for leaf in jax.tree.leaves(outs):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return outs, ress

    def submit_chunk(self, frames: np.ndarray):
        """Async-submit a (K, H, W, 3) uint8 frame chunk; returns device
        futures (outputs, res) with a leading K axis. No host sync."""
        k, h, w = frames.shape[:3]
        chunk_fn = self._chunk_for(h, w, k)
        self.tracker.state, outs, ress = self._run_prog(
            chunk_fn, self.detector.params, self.tracker.state,
            jax.device_put(frames))
        for leaf in jax.tree.leaves((outs, ress)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return outs, ress

    # ------------------------------------------------------------------
    def warmup(self, shape_hw: tuple[int, int], iters: int = 3) -> None:
        h, w = shape_hw
        dummy = np.zeros((h, w, 3), np.uint8)
        t0 = time.perf_counter()
        state = self.tracker.state if self.tracker._host is None else init_track_state(
            self.cfg.tracking.bytetrack.max_tracks)
        if self._per_stage:
            pre, fwd, nms = self._stages_for(h, w)
            for _ in range(iters):
                img = pre(jax.device_put(dummy))
                raw = fwd(self.detector.params, img)
                res = nms(raw)
                if self.tracker._host is None:
                    if self._is_appearance:
                        feats = self.tracker.embed_fn()(jax.device_put(dummy),
                                                        res.boxes)
                        state, _ = self.tracker._step(
                            state, res.boxes, res.scores, res.classes,
                            res.valid, feats)
                    else:
                        state, _ = self._track_fn(state, res.boxes, res.scores,
                                                  res.classes, res.valid)
                jax.block_until_ready(res)
        elif self._use_packed_transport():
            from rtmodt_tpu.ops.yuv import pack_i420

            yuv, _ = pack_i420(dummy, self.cfg.detection.input_size)
            step = self._packed_fused_for(h, w)
            for _ in range(iters):
                state, outputs, res = self._run_prog(
                    step, self.detector.params, self._get_front_pack(),
                    state, jax.device_put(yuv))
                jax.block_until_ready(outputs.visible)
        elif self.tracker._host is not None:
            # host-tracker (lapjv) mode: step() runs the per-stage device
            # programs + host association - warm THOSE, not the fused
            # device-tracker program it never uses
            pre, fwd, nms = self._stages_for(h, w)
            for _ in range(iters):
                res = nms(fwd(self.detector.params, pre(jax.device_put(dummy))))
                jax.block_until_ready(res)
        else:
            step = self._fused_for(h, w)
            for _ in range(iters):
                state, outputs, res = self._run_prog(
                    step, self.detector.params, state, jax.device_put(dummy))
                jax.block_until_ready(outputs.visible)
        if self.tracker._host is None:
            # warmup exists to COMPILE, not to track: discard any phantom
            # tracks born from the dummy frames (they would otherwise arrive
            # pre-confirmed at stream start and pollute early ids/events),
            # and rebuild state because donated buffers are now invalid
            self.tracker.reset()
            self._gmc_reset()      # dummy-frame grids must not compensate
        logger.info(f"pipeline warmup {w}x{h} done in {time.perf_counter() - t0:.1f}s")

    # ------------------------------------------------------------------
    def _maybe_trace(self) -> None:
        """Device-level tracing (SURVEY.md 5.1: the jax.profiler analog of
        the reference's CUDA-event timing): with ``profiling.trace_dir`` set,
        capture the first ``trace_frames`` post-warmup frames into a trace
        viewable in TensorBoard/Perfetto."""
        tcfg = self.cfg.profiling
        ts = self._trace_state
        if not tcfg.trace_dir:
            return
        if not ts["active"] and ts["frames_left"] == 0 and not ts.get("done"):
            os.makedirs(tcfg.trace_dir, exist_ok=True)
            jax.profiler.start_trace(tcfg.trace_dir)
            ts["active"] = True
            ts["frames_left"] = tcfg.trace_frames
            logger.info(f"jax.profiler trace started -> {tcfg.trace_dir}")
        elif ts["active"]:
            ts["frames_left"] -= 1
            if ts["frames_left"] <= 0:
                jax.profiler.stop_trace()
                ts["active"] = False
                ts["done"] = True
                logger.info("jax.profiler trace captured")

    def step(self, frame: np.ndarray, frame_id: int, timestamp: float | None = None):
        """Process one frame. Returns (tracks, events, nms_result)."""
        self._maybe_trace()
        p = self.profiler
        h, w = frame.shape[:2]
        names = self.detector.class_names

        if self._per_stage and self.tracker._host is None:
            pre, fwd, nms = self._stages_for(h, w)
            p.tick("preprocess")
            fdev = jax.device_put(frame)
            img = pre(fdev)
            p.tock("preprocess", sync_on=img)
            p.tick("inference")
            raw = fwd(self.detector.params, img)
            p.tock("inference", sync_on=raw)
            p.tick("nms")
            res = nms(raw)
            p.tock("nms", sync_on=res)
            p.tick("tracking")
            if self._gmc_on:
                # per-stage mode keeps GMC as its own small dispatch on the
                # already-transferred source frame (diagnostic path)
                g = self.cfg.tracking.gmc.grid
                self.tracker.state, self._gmc_carry = self._gmc_stage_fn()(
                    self.tracker.state, fdev, *self._gmc_carry,
                    np.asarray([w / g, h / g], np.float32))
            if self._is_appearance:
                feats = self.tracker.embed_fn()(jax.device_put(frame), res.boxes)
                self.tracker.state, outputs = self.tracker._step(
                    self.tracker.state, res.boxes, res.scores, res.classes,
                    res.valid, feats)
            else:
                self.tracker.state, outputs = self._track_fn(
                    self.tracker.state, res.boxes, res.scores, res.classes, res.valid)
            tracks = self.tracker.tracks_from_outputs(outputs, names)
            p.tock("tracking")
        elif self.tracker._host is not None:
            # host-tracker mode (lapjv): detect on device, track on host
            pre, fwd, nms = self._stages_for(h, w)
            p.tick("preprocess")
            img = pre(jax.device_put(frame))
            p.tock("preprocess", sync_on=img)
            p.tick("inference")
            raw = fwd(self.detector.params, img)
            p.tock("inference", sync_on=raw)
            p.tick("nms")
            res = nms(raw)
            host_res = jax.device_get(res)
            p.tock("nms")
            p.tick("tracking")
            n = int(host_res.count)
            from rtmodt_tpu.detection.detector import Detections
            dets = Detections(np.asarray(host_res.boxes[:n], np.float32),
                              np.asarray(host_res.scores[:n], np.float32),
                              np.asarray(host_res.classes[:n], np.int32), names)
            tracks = self.tracker.update(dets)
            res = host_res
            p.tock("tracking")
        else:
            step_fn = self._fused_for(h, w)
            p.tick("inference")
            self.tracker.state, outputs, res = self._run_prog(
                step_fn, self.detector.params, self.tracker.state,
                jax.device_put(frame))
            tracks = self.tracker.tracks_from_outputs(outputs, names)
            p.tock("inference")

        p.tick("events")
        events = self.events.process(tracks, frame_id, timestamp) if self.events else []
        p.tock("events")
        return tracks, events, res

    # ------------------------------------------------------------------
    def submit(self, frame: np.ndarray):
        """Fused-mode async submit: enqueue one frame's detect+track step and
        return device futures (outputs, res) WITHOUT any host sync.  Pair with
        ``MultiObjectTracker.tracks_from_outputs`` when the result is needed.
        This is what hides host<->device latency behind device compute."""
        h, w = frame.shape[:2]
        step_fn = self._fused_for(h, w)
        self.tracker.state, outputs, res = self._run_prog(
            step_fn, self.detector.params, self.tracker.state,
            jax.device_put(frame))
        # start the device->host copies in the background
        for leaf in jax.tree.leaves((outputs, res)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return outputs, res

    def submit_packed_frame(self, frame: np.ndarray):
        """Packed-transport twin of :meth:`submit`: host packs the frame to
        planar I420 (~7.5x fewer bytes over the link than BGR, ONE put) and
        the fused step consumes the planes through the space-to-depth front."""
        from rtmodt_tpu.ops.yuv import pack_i420

        self._maybe_trace()
        h, w = frame.shape[:2]
        yuv, _ = pack_i420(frame, self.cfg.detection.input_size)
        step_fn = self._packed_fused_for(h, w)
        self.tracker.state, outputs, res = self._run_prog(
            step_fn, self.detector.params, self._get_front_pack(),
            self.tracker.state, jax.device_put(yuv))
        for leaf in jax.tree.leaves((outputs, res)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return outputs, res

    def _use_packed_transport(self) -> bool:
        """Packed planar transport applies to every fused device-tracker
        path, appearance trackers included (their ROI crops come from the
        Y/U/V planes); per-stage and host-tracker modes keep the BGR
        stages the reference profiler mirrors."""
        return (self.cfg.parallel.transport in ("packed", "x6", "x24",
                                                "i420")
                and not self._per_stage
                and self.tracker._host is None)

    # ------------------------------------------------------------------
    def save_runtime_state(self, path: str, frames_done: int = 0,
                           last_ts: float = 0.0) -> None:
        """Snapshot tracker + zone-engine state for kill-and-resume
        (runtime/state_store.py; SURVEY.md 5.4 new capability).  Call only
        when no frames are in flight - the device tracker state must
        describe exactly ``frames_done`` consumed frames."""
        from rtmodt_tpu.runtime.state_store import save_snapshot

        save_snapshot(path, self.tracker, self.events,
                      frames_done=frames_done, last_ts=last_ts)

    def load_runtime_state(self, path: str) -> int:
        """Restore a snapshot; returns its ``frames_done`` (the caller
        fast-forwards a FILE source past that many frames so stream-time
        dwell clocks line up exactly)."""
        from rtmodt_tpu.runtime.state_store import load_snapshot

        return int(load_snapshot(path, self.tracker, self.events)["frames_done"])

    def run_chunked(self, source: str | int | None = None,
                    max_frames: int | None = None,
                    state_path: str | None = None,
                    state_interval: int = 300,
                    skip_frames: int = 0) -> dict[str, float]:
        """Throughput loop for file/offline sources: frames batch into
        ``parallel.chunk_size`` packed-I420 chunks (`lax.scan` dispatches),
        with a ``pipeline_depth`` window of in-flight chunks.  Tracks and
        zone events are produced for EVERY frame, in order."""
        from collections import deque

        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader
        from rtmodt_tpu.ops.yuv import pack_chunk

        icfg = self.cfg.ingestion
        k = max(2, self.cfg.parallel.chunk_size)
        depth = max(0, self.cfg.parallel.pipeline_depth)
        reader = RTSPReader(
            source if source is not None else icfg.source,
            backend=icfg.backend,
            reconnect_delay_sec=icfg.reconnect_delay_sec,
            max_reconnects=icfg.max_reconnects,
            resolution=tuple(icfg.resolution) if icfg.resolution else None,
        )
        names = self.detector.class_names
        p = self.profiler
        inflight: deque = deque()
        frames_done = 0
        last_id = 0

        use_dm = self._mask_fn is not None
        # transport=bgr is the debug escape from the packed/s2d-front path;
        # deepsort's chunk program needs the planes (ROI crops), so it
        # always ships packed
        use_bgr = (self.cfg.parallel.transport == "bgr"
                   and not self._is_appearance)

        last_ts_done = [0.0]

        def consume(entry):
            nonlocal frames_done
            metas, outs, masks = entry
            import jax as _jax

            host = _jax.device_get(outs)
            n = len(metas)   # < K only for the padded final chunk
            last_ts_done[0] = float(metas[-1][1])
            if self.events:
                # vectorized chunk consume: the dwell/cooldown state machine
                # runs as array ops over the whole (K, S) output block - no
                # per-frame Track objects (see ZoneEventEngine.process_chunk)
                inside = (np.asarray(_jax.device_get(masks))[:n]
                          if use_dm else None)
                self.events.process_chunk(
                    np.asarray(host.track_id)[:n], np.asarray(host.class_id)[:n],
                    np.asarray(host.boxes)[:n], np.asarray(host.visible)[:n],
                    [m[0] for m in metas],
                    np.asarray([m[1] for m in metas], np.float64),
                    inside=inside, class_names=names)
            for _ in metas:
                p.end_frame()
                frames_done += 1

        skipped = 0
        snaps_done = 0
        with reader:
            buf: list = []
            metas: list = []
            while True:
                frame, fid, ts = reader.read_new(last_id, timeout=2.0)
                if frame is None:
                    if reader.is_eof:
                        break
                    continue
                last_id = fid
                if skipped < skip_frames and reader._is_file:
                    # resume fast-forward: these frames were consumed by the
                    # run that wrote the snapshot; decode-and-drop keeps the
                    # file's stream clock aligned with the restored dwell
                    # timers (state_store.py)
                    skipped += 1
                    continue
                buf.append(frame)
                metas.append((fid, ts))
                if len(buf) == k:
                    self._maybe_trace()   # trace_frames counts chunk dispatches here
                    p.tick("inference")
                    if use_bgr:
                        outs, _res = self.submit_chunk(np.stack(buf))
                    else:
                        planes, _ = pack_chunk(np.stack(buf),
                                               self.cfg.detection.input_size)
                        outs, _res = self.submit_packed_yuv(planes,
                                                            *buf[0].shape[:2])
                    masks = None
                    if use_dm:
                        masks = self._mask_fn(outs.boxes)
                        masks.copy_to_host_async()
                    p.tock("inference")
                    inflight.append((metas, outs, masks))
                    buf, metas = [], []
                    if len(inflight) > depth:
                        consume(inflight.popleft())
                    if (state_path
                            and frames_done // state_interval > snaps_done):
                        # drain first: the snapshot must describe a tracker
                        # that has seen exactly frames_done frames, not the
                        # in-flight window beyond them
                        while inflight:
                            consume(inflight.popleft())
                        # frames_done counts this process's consumption;
                        # the snapshot records position in the FILE, which
                        # includes frames a previous run already consumed
                        self.save_runtime_state(state_path,
                                                skipped + frames_done,
                                                last_ts_done[0])
                        snaps_done = frames_done // state_interval
                if max_frames and frames_done + len(inflight) * k + len(buf) >= max_frames:
                    break
            if buf:
                # leftover partial chunk: pad with the last frame and reuse
                # the ALREADY-COMPILED chunk program (consume slices outputs
                # to the real frames). Running self.step() here would trace
                # a brand-new single-frame program just for the tail - tens
                # of seconds of compile for < chunk_size frames. The padded
                # duplicates only touch post-stream tracker state.
                frames_arr = np.stack(buf + [buf[-1]] * (k - len(buf)))
                p.tick("inference")
                if use_bgr:
                    outs, _res = self.submit_chunk(frames_arr)
                else:
                    planes, _ = pack_chunk(frames_arr,
                                           self.cfg.detection.input_size)
                    outs, _res = self.submit_packed_yuv(planes,
                                                        *buf[0].shape[:2])
                masks = None
                if use_dm:
                    masks = self._mask_fn(outs.boxes)
                    masks.copy_to_host_async()
                p.tock("inference")
                inflight.append((metas, outs, masks))
            while inflight:
                consume(inflight.popleft())
        if state_path:
            self.save_runtime_state(state_path, skipped + frames_done,
                                    last_ts_done[0])
        logger.info(f"chunked run processed {frames_done} frames")
        p.print_summary()
        return p.summary()

    def run(self, source: str | int | None = None, display: bool = False,
            max_frames: int | None = None,
            state_path: str | None = None,
            state_interval: int = 300,
            skip_frames: int = 0) -> dict[str, float]:
        """The full CLI loop (reference run_pipeline.py:119-166).

        ``state_path`` enables kill-and-resume snapshots (tracker slots +
        zone dwell/cooldown state; runtime/state_store.py): written every
        ``state_interval`` consumed frames and at clean exit.  On resume the
        caller passes the snapshot's ``frames_done`` as ``skip_frames`` so a
        FILE source fast-forwards past already-processed frames.
        """
        import cv2

        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader

        if (self.cfg.parallel.chunk_size > 1 and not display
                and not self.cfg.visualization.save_video
                and self.renderer is None and self.tracker._host is None
                and not self._per_stage):
            # (deepsort included: its chunk program takes appearance crops
            #  straight from the Y/U/V planes, ops/roi.py::crop_yuv_rgb;
            #  per_stage mode needs the per-frame stage programs, so the
            #  chunked fast path - which only times an aggregate - is skipped)
            return self.run_chunked(source, max_frames,
                                    state_path=state_path,
                                    state_interval=state_interval,
                                    skip_frames=skip_frames)

        icfg = self.cfg.ingestion
        reader = RTSPReader(
            source if source is not None else icfg.source,
            backend=icfg.backend,
            reconnect_delay_sec=icfg.reconnect_delay_sec,
            max_reconnects=icfg.max_reconnects,
            resolution=tuple(icfg.resolution) if icfg.resolution else None,
            target_fps=icfg.target_fps,
        )
        writer = None
        vcfg = self.cfg.visualization
        monitor = None
        if vcfg.mjpeg_port is not None and self.renderer is not None:
            from rtmodt_tpu.serving.monitor import LiveMonitor

            monitor = LiveMonitor(vcfg.mjpeg_port)
        zones = self.events.get_zone_polygons() if self.events else []
        names = self.detector.class_names
        depth = (self.cfg.parallel.pipeline_depth
                 if (not self._per_stage and self.tracker._host is None) else 0)
        from collections import deque
        inflight: deque = deque()
        last_id = 0
        frames = 0
        p = self.profiler
        warmed = False

        def consume(entry) -> bool:
            """Host-side half of one frame: tracks, events, render, write."""
            nonlocal writer
            frame, fid, ts, outputs = entry
            p.tick("tracking")
            tracks = self.tracker.tracks_from_outputs(outputs, names)
            p.tock("tracking")
            p.tick("events")
            events = self.events.process(tracks, fid, ts) if self.events else []
            p.tock("events")
            del events
            consumed[0] += 1
            last_ts_done[0] = float(ts)
            if self.renderer is not None:
                p.tick("visualization")
                self.renderer.render(frame, tracks, zones, fps=p.current_fps,
                                     latency_ms=p.summary().get("total_mean_ms", 0.0))
                p.tock("visualization")
            p.end_frame()
            if monitor is not None:
                monitor.publish(frame)
            if vcfg.save_video:
                if writer is None:
                    os.makedirs(os.path.dirname(vcfg.save_path) or ".", exist_ok=True)
                    fps_out = reader.fps if reader.fps > 0 else 25.0
                    writer = cv2.VideoWriter(
                        vcfg.save_path, cv2.VideoWriter_fourcc(*vcfg.codec),
                        fps_out, (frame.shape[1], frame.shape[0]))
                writer.write(frame)
            if display:
                cv2.imshow(vcfg.window_name, frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    return False
            return True

        skipped = 0
        consumed = [0]        # frames fully consumed (tracks+events done)
        last_ts_done = [0.0]
        snaps_done = 0
        try:
            with reader:
                while True:
                    p.tick("decode")
                    frame, fid, ts = reader.read_new(last_id, timeout=2.0)
                    p.tock("decode")
                    if frame is None:
                        if reader.is_eof:
                            logger.info("end of stream")
                            break
                        continue
                    last_id = fid
                    if skipped < skip_frames and reader._is_file:
                        # resume fast-forward (see run_chunked)
                        skipped += 1
                        continue
                    if not warmed:
                        self.warmup(frame.shape[:2])
                        warmed = True

                    if depth > 0:
                        # async submit; consume the oldest once the window is full
                        p.tick("inference")
                        outputs, _res = (self.submit_packed_frame(frame)
                                         if self._use_packed_transport()
                                         else self.submit(frame))
                        p.tock("inference")
                        inflight.append((frame, fid, ts, outputs))
                        if len(inflight) > depth:
                            if not consume(inflight.popleft()):
                                break
                    else:
                        tracks, events, _ = (
                            self.step_packed(frame, fid, ts)
                            if self._use_packed_transport()
                            else self.step(frame, fid, ts))
                        consumed[0] += 1
                        last_ts_done[0] = float(ts)
                        if self.renderer is not None:
                            p.tick("visualization")
                            self.renderer.render(frame, tracks, zones, fps=p.current_fps,
                                                 latency_ms=p.summary().get("total_mean_ms", 0.0))
                            p.tock("visualization")
                        p.end_frame()
                        if monitor is not None:
                            monitor.publish(frame)
                        if vcfg.save_video:
                            if writer is None:
                                os.makedirs(os.path.dirname(vcfg.save_path) or ".", exist_ok=True)
                                fps_out = reader.fps if reader.fps > 0 else 25.0
                                writer = cv2.VideoWriter(
                                    vcfg.save_path, cv2.VideoWriter_fourcc(*vcfg.codec),
                                    fps_out, (frame.shape[1], frame.shape[0]))
                            writer.write(frame)
                        if display:
                            cv2.imshow(vcfg.window_name, frame)
                            if cv2.waitKey(1) & 0xFF == ord("q"):
                                break
                    frames += 1
                    if (state_path
                            and consumed[0] // state_interval > snaps_done):
                        # drain the window first: the snapshot's tracker
                        # state must describe exactly the consumed frames
                        while inflight:
                            if not consume(inflight.popleft()):
                                break
                        self.save_runtime_state(state_path,
                                                skipped + consumed[0],
                                                last_ts_done[0])
                        snaps_done = consumed[0] // state_interval
                    if max_frames and frames >= max_frames:
                        break
                while inflight:  # drain the pipeline window
                    if not consume(inflight.popleft()):
                        break
                if state_path:
                    self.save_runtime_state(state_path, skipped + consumed[0],
                                            last_ts_done[0])
        except KeyboardInterrupt:
            logger.info("interrupted")
        finally:
            if monitor is not None:
                monitor.close()
            if writer is not None:
                writer.release()
            if display:
                cv2.destroyAllWindows()
        p.print_summary()
        return p.summary()
