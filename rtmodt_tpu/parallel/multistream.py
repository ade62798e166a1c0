"""Multi-stream detect+track across the device mesh.

The TPU-native scaling axis this workload actually has (SURVEY.md 2.3): N
concurrent camera streams batched on a leading stream axis, sharded over the
mesh's ``data`` dimension with ``NamedSharding`` - the TPU analog of "N
independent GPU processes", but as ONE SPMD program.  Per-stream tracker
state is a batched pytree carried across steps; XLA partitions the whole
detect+track program per device with zero collectives on the hot path
(streams are independent), so throughput scales linearly over ICI-connected
chips.

Layouts:
  * ``step(frames (S, H, W, 3))``          - one frame per stream;
  * ``step_chunk(frames (T, S, H, W, 3))`` - scan over T, vmap over S
    (transfer-amortized streaming, same as the single-stream chunk mode).
"""

from __future__ import annotations


from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtmodt_tpu.config.loader import PipelineConfig
from rtmodt_tpu.detection.detector import Detector
from rtmodt_tpu.ops.letterbox import letterbox, unletterbox_boxes
from rtmodt_tpu.ops.nms import batched_nms_from_logits
from rtmodt_tpu.tracking.bytetrack import (
    TrackState,
    bytetrack_update,
    init_track_state,
)
from rtmodt_tpu.utils.logging import logger


class MosaicAnnotator:
    """Host-side annotated output for multi-camera mode: renders each
    stream's tracks onto its BGR frame (same FrameRenderer as the single-
    stream pipeline, SURVEY.md N7) and tiles the S streams into one mosaic
    frame for ``--display`` / ``--save-video``.

    Keeps per-stream centroid trails (track IDs are independent per
    stream, so one trail map per stream) and a per-stream blank tile for
    dead/short slots.  Stateless across resolutions: the tile size is
    fixed by the first frame seen.
    """

    def __init__(self, vcfg, names: list[str], num_streams: int):
        from rtmodt_tpu.visualization.renderer import FrameRenderer

        # visualization.enabled=false still tiles the raw streams (parity
        # with the single-stream run(), which writes/displays unannotated
        # frames then) - it just skips the track/zone/label drawing
        self.annotate = vcfg.enabled
        self.renderer = FrameRenderer(
            show_boxes=vcfg.show_boxes, show_labels=vcfg.show_labels,
            show_trails=vcfg.show_trails, show_zones=vcfg.show_zones,
            show_hud=False,  # the per-tile HUD is the stream label; the
        )                    # aggregate FPS goes on the mosaic itself
        self.show_hud = vcfg.show_hud and vcfg.enabled
        self.names = names
        self.s = num_streams
        self.cols = int(np.ceil(np.sqrt(num_streams)))
        self.rows = int(np.ceil(num_streams / self.cols))
        self.trail_len = vcfg.trail_length
        self._trails: list[dict[int, list[tuple[int, int]]]] = [
            {} for _ in range(num_streams)]
        # trail garbage collection (same policy as the facade's
        # _prune_trails): ids unseen far past any re-match window are
        # dropped so 24/7 multi-camera runs don't accumulate a graveyard
        self._frame_count = [0] * num_streams
        self._trail_seen: list[dict[int, int]] = [
            {} for _ in range(num_streams)]

    def _prune_trails(self, si: int) -> None:
        self._frame_count[si] += 1
        if self._frame_count[si] % 512:
            return
        horizon = max(600, 4 * self.trail_len)
        seen = self._trail_seen[si]
        dead = [tid for tid, last in seen.items()
                if self._frame_count[si] - last > horizon]
        for tid in dead:
            seen.pop(tid, None)
            self._trails[si].pop(tid, None)

    def tracks_for(self, host, t: int, si: int) -> list:
        """Host TrackOutputs (T, S, K, ...) slice -> Track list with trails."""
        from rtmodt_tpu.tracking.tracker import Track

        vis = np.asarray(host.visible[t, si])
        trails = self._trails[si]
        self._prune_trails(si)
        out = []
        for i in np.where(vis)[0]:
            tid = int(host.track_id[t, si, i])
            self._trail_seen[si][tid] = self._frame_count[si]
            box = np.asarray(host.boxes[t, si, i], np.float32)
            cx = int((box[0] + box[2]) / 2)
            cy = int((box[1] + box[3]) / 2)
            trail = trails.setdefault(tid, [])
            trail.append((cx, cy))
            # explicit length form: del trail[:-0] would be a no-op at
            # trail_length == 0
            del trail[:max(0, len(trail) - self.trail_len)]
            cid = int(host.class_id[t, si, i])
            out.append(Track(
                track_id=tid, xyxy=box,
                confidence=float(host.confidence[t, si, i]),
                class_id=cid,
                class_name=(self.names[cid]
                            if 0 <= cid < len(self.names) else str(cid)),
                age=int(host.age[t, si, i]),
                time_since_update=int(host.tsu[t, si, i]),
                trail=list(trail)))
        return out

    def mosaic(self, host, t: int, bgr_row: list, zones, fps: float
               ) -> np.ndarray:
        """Render frame t of a chunk: annotate every stream's tile (dead
        slots get a black tile) and tile them into one (rows*H, cols*W) BGR
        frame with per-tile stream labels + an aggregate-FPS HUD."""
        import cv2

        shape = next(f.shape for f in bgr_row if f is not None)
        tiles = []
        for si in range(self.s):
            f = bgr_row[si]
            f = np.zeros(shape, np.uint8) if f is None else f
            if self.annotate:
                self.renderer.render(f, self.tracks_for(host, t, si), zones)
                cv2.putText(f, f"cam{si}", (8, 24), cv2.FONT_HERSHEY_SIMPLEX,
                            0.7, (80, 220, 80), 2, cv2.LINE_AA)
            tiles.append(f)
        blank = np.zeros(shape, np.uint8)
        tiles += [blank] * (self.rows * self.cols - self.s)
        grid = np.vstack([np.hstack(tiles[r * self.cols:(r + 1) * self.cols])
                          for r in range(self.rows)])
        if self.show_hud and fps > 0:
            cv2.putText(grid, f"{fps:.1f} FPS aggregate", (8, grid.shape[0] - 12),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2,
                        cv2.LINE_AA)
        return grid


def init_multistream_state(num_streams: int, max_tracks: int,
                           init_one=init_track_state, **init_kw):
    """Batched tracker state: every leaf gains a leading stream axis."""
    one = init_one(max_tracks, **init_kw)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (num_streams,) + x.shape), one)


class MultiStreamPipeline:
    """Runs S streams as one SPMD detect+track program over the mesh."""

    def __init__(self, cfg: PipelineConfig, num_streams: int | None = None,
                 mesh: Mesh | None = None):
        from rtmodt_tpu.utils.jax_setup import setup_jax

        setup_jax(platform="cpu" if cfg.system.device == "cpu" else None)
        self.cfg = cfg
        self.num_streams = num_streams or cfg.parallel.num_streams
        if mesh is None:
            from rtmodt_tpu.parallel.mesh import create_mesh

            n_dev = jax.device_count()
            use = n_dev if self.num_streams % n_dev == 0 else 1
            mesh = create_mesh(use)
        self.mesh = mesh
        if self.num_streams % mesh.devices.size != 0:
            raise ValueError(f"num_streams={self.num_streams} must be divisible "
                             f"by mesh size {mesh.devices.size}")
        self.detector = Detector(cfg.detection, warmup=False)
        # tracker dispatch (same policy as runtime/pipeline.py): bytetrack
        # and ocsort share the motion-only step signature and run per-stream
        # under vmap; deepsort carries its appearance embedder into the SPMD
        # program (per-stream ROI crops + embed inside the same XLA program)
        from functools import partial as _partial
        algo = cfg.tracking.algorithm
        self._is_appearance = algo in ("deepsort", "botsort")
        self._embedder = None
        self._ds_cfg = None
        self._app_update = None
        if algo == "ocsort":
            from rtmodt_tpu.tracking.ocsort import (init_ocsort_state,
                                                    ocsort_update)

            occ = cfg.tracking.ocsort
            self._mot_update = _partial(ocsort_update, cfg=occ)
            self._mot_repr = repr(occ)
            self.state = init_multistream_state(
                self.num_streams, occ.max_tracks,
                init_one=init_ocsort_state, delta_t=occ.delta_t)
        elif algo in ("deepsort", "botsort"):
            from rtmodt_tpu.tracking.deepsort import init_deepsort_state
            from rtmodt_tpu.tracking.tracker import MultiObjectTracker

            # the facade resolves the embedder weights chain (shipped
            # checkpoint by default, `embedder: random` opts out) and the
            # algorithm's update function (deepsort_update / botsort_update)
            facade = MultiObjectTracker(
                algo, trail_length=cfg.tracking.trail_length,
                **{algo: getattr(cfg.tracking, algo)})
            self._embedder = facade.embedder
            self._emb_params_host = facade.embedder_params
            self._ds_cfg = facade.cfg
            self._app_update = facade.appearance_update
            self._mot_update = None
            self._mot_repr = repr(self._ds_cfg)
            self.state = init_multistream_state(
                self.num_streams, self._ds_cfg.max_tracks,
                init_one=init_deepsort_state,
                embed_dim=self._ds_cfg.embed_dim)
        else:
            self._mot_update = _partial(bytetrack_update,
                                        cfg=cfg.tracking.bytetrack)
            self._mot_repr = repr(cfg.tracking.bytetrack)
            self.state = init_multistream_state(
                self.num_streams, cfg.tracking.bytetrack.max_tracks)
        self._stream_shard = NamedSharding(mesh, P("data"))
        self._repl = NamedSharding(mesh, P())
        self.state = jax.device_put(self.state, self._stream_shard)
        self.params = jax.device_put(self.detector.params, self._repl)
        self.emb_params = (jax.device_put(self._emb_params_host, self._repl)
                           if self._is_appearance else None)
        # per-stream camera-motion compensation (tracking.gmc, ops/gmc.py):
        # each stream carries its own previous luma grid + validity scalar,
        # sharded along the stream axis with the tracker state, and the
        # phase-correlation step rides the same SPMD program
        self._gmc_on = cfg.tracking.gmc.method == "phase"
        self._gmc_repr = repr(cfg.tracking.gmc)
        self._gmc_carry = None
        self._gmc_reset()
        self._jitted: dict[Any, Any] = {}
        logger.info(f"multi-stream pipeline: {self.num_streams} streams over "
                    f"{mesh.devices.size} device(s)")

    # ------------------------------------------------------------------
    def _gmc_reset(self) -> None:
        """(Re)initialize the per-stream GMC carry: zero grids + valid=0,
        so the first frame of every stream never compensates."""
        if self._gmc_on:
            g = self.cfg.tracking.gmc.grid
            self._gmc_carry = (
                jax.device_put(jnp.zeros((self.num_streams, g, g),
                                         jnp.float32), self._stream_shard),
                jax.device_put(jnp.zeros((self.num_streams,), jnp.float32),
                               self._stream_shard))

    def _run_prog(self, fn, *args):
        """Invoke a jitted multi-stream program, threading the GMC carry
        as trailing (grids, valid) args / trailing carry output when on."""
        if self._gmc_on:
            *rest, carry = fn(*args, *self._gmc_carry)
            self._gmc_carry = carry
            return rest
        return fn(*args)

    # ------------------------------------------------------------------
    def _frame_body(self, params, state, frame_u8):
        """Per-stream fused body (unbatched; vmapped by callers)."""
        dcfg = self.cfg.detection
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        img, meta = letterbox(frame_u8, dcfg.input_size, dtype=dtype)
        box_dist, cls_logits = self.detector.model.apply(params, img[None], train=False)
        res = batched_nms_from_logits(
            box_dist[0], cls_logits[0], dcfg.input_size,
            dcfg.conf_threshold, dcfg.iou_threshold,
            dcfg.max_detections, dcfg.nms_candidates,
            self.detector._class_mask, dcfg.agnostic_nms,
            impl=dcfg.nms_impl, topk=dcfg.topk_impl)
        if self._is_appearance:
            from rtmodt_tpu.ops.roi import crop_and_resize

            # crop while boxes are still in letterbox coordinates
            # (same convention as pipeline.py::_fused_deepsort_for)
            crops = crop_and_resize(img.astype(jnp.float32), res.boxes,
                                    tuple(self._ds_cfg.crop_hw)) * 255.0
            feats = self._embedder.apply(self.emb_params, crops)
            res = res._replace(boxes=unletterbox_boxes(res.boxes, meta))
            state, outputs = self._app_update(
                state, res.boxes, res.scores, res.classes, res.valid, feats)
        else:
            res = res._replace(boxes=unletterbox_boxes(res.boxes, meta))
            state, outputs = self._mot_update(
                state, res.boxes, res.scores, res.classes, res.valid)
        return state, outputs, res

    def _step_for(self, h: int, w: int):
        key = ("step", h, w)
        if key not in self._jitted:
            gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
            scale_xy = (w / gcfg.grid, h / gcfg.grid)

            if gmc_on:
                from rtmodt_tpu.ops.gmc import gmc_step

                def step(params, state, frames, gmc_grids, gmc_valid):
                    def one(st, fr, pg, pv):
                        st, (cg, cv) = gmc_step(st, fr, (pg, pv), gcfg,
                                                scale_xy)
                        st, outs, ress = self._frame_body(params, st, fr)
                        return st, outs, ress, cg, cv

                    state, outs, ress, cg, cv = jax.vmap(one)(
                        state, frames, gmc_grids, gmc_valid)
                    return state, outs, ress, (cg, cv)

                in_sh = (self._repl,) + (self._stream_shard,) * 4
                out_sh = (self._stream_shard,) * 3 + (
                    (self._stream_shard, self._stream_shard),)
            else:
                def step(params, state, frames):
                    return jax.vmap(
                        lambda st, fr: self._frame_body(params, st, fr)
                    )(state, frames)

                in_sh = (self._repl, self._stream_shard, self._stream_shard)
                out_sh = (self._stream_shard,) * 3

            self._jitted[key] = jax.jit(
                step, in_shardings=in_sh, out_shardings=out_sh,
                donate_argnums=(1,),
            )
        return self._jitted[key]

    def _chunk_for(self, h: int, w: int, t: int):
        key = ("chunk", h, w, t)
        if key not in self._jitted:
            ts_shard = NamedSharding(self.mesh, P(None, "data"))
            gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
            scale_xy = (w / gcfg.grid, h / gcfg.grid)

            if gmc_on:
                from rtmodt_tpu.ops.gmc import gmc_step

                def chunk(params, state, frames_tshw, gmc_grids, gmc_valid):
                    def body(st_carry, frames_s):
                        st, (pg, pv) = st_carry

                        def one(ss, fr, gp, gv):
                            ss, (cg, cv) = gmc_step(ss, fr, (gp, gv), gcfg,
                                                    scale_xy)
                            ss, outs, ress = self._frame_body(params, ss, fr)
                            return ss, outs, ress, cg, cv

                        st, outs, ress, cg, cv = jax.vmap(one)(
                            st, frames_s, pg, pv)
                        return (st, (cg, cv)), (outs, ress)

                    (state, carry), (outs, ress) = jax.lax.scan(
                        body, (state, (gmc_grids, gmc_valid)), frames_tshw)
                    return state, outs, ress, carry

                in_sh = (self._repl, self._stream_shard, ts_shard,
                         self._stream_shard, self._stream_shard)
                out_sh = (self._stream_shard, ts_shard, ts_shard,
                          (self._stream_shard, self._stream_shard))
            else:
                def chunk(params, state, frames_tshw):
                    def body(st, frames_s):
                        st, outs, ress = jax.vmap(
                            lambda s, f: self._frame_body(params, s, f)
                        )(st, frames_s)
                        return st, (outs, ress)

                    state, (outs, ress) = jax.lax.scan(body, state, frames_tshw)
                    return state, outs, ress

                in_sh = (self._repl, self._stream_shard, ts_shard)
                out_sh = (self._stream_shard, ts_shard, ts_shard)

            self._jitted[key] = jax.jit(
                chunk, in_shardings=in_sh, out_shardings=out_sh,
                donate_argnums=(1,),
            )
        return self._jitted[key]

    def _packed_chunk_for(self, src_h: int, src_w: int, t: int):
        """Planar-I420, batched-model streaming chunk over (T, S) frames.

        Same structure as the optimized single-stream path (pipeline.py):
        planar stem on Y/U/V planes, ONE model call batched over all T*S
        frames, NMS vmapped in parallel, and only the per-stream tracker
        scanning over T.  S stays sharded over the mesh throughout; the
        (T*S) reshape keeps the batch dimension partitioned.
        """
        key = ("packed", src_h, src_w, t)
        if key in self._jitted:
            return self._jitted[key]
        from rtmodt_tpu.ops.planar_stem import pad_planes
        from rtmodt_tpu.ops.s2d_front import apply_front
        from rtmodt_tpu.ops.yuv import (content_dims, packed_meta,
                                       unletterbox_boxes_packed)

        dcfg = self.cfg.detection
        mot_update = self._mot_update
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        size = dcfg.input_size
        s_streams = self.num_streams
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        pad_left, pad_top = meta.pad_left, meta.pad_top
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (src_w / gcfg.grid, src_h / gcfg.grid)

        def chunk(params, state, y, u, v, gmc_grids=None, gmc_valid=None):
            n = t * s_streams
            yf = y.reshape(n, *y.shape[2:])
            uf = u.reshape(n, *u.shape[2:])
            vf = v.reshape(n, *v.shape[2:])
            yp, up, vp = pad_planes(yf, uf, vf, size, pad_left, pad_top)
            bd, cl = apply_front(params, model, yp, up, vp, dcfg.quant, dtype)

            def one_nms(bdi, cli):
                res = batched_nms_from_logits(
                    bdi, cli, size, dcfg.conf_threshold, dcfg.iou_threshold,
                    dcfg.max_detections, dcfg.nms_candidates, class_mask,
                    dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl)
                return res._replace(boxes=unletterbox_boxes_packed(res.boxes, meta))

            ress = jax.vmap(one_nms)(bd, cl)
            ress = jax.tree.map(
                lambda a: a.reshape(t, s_streams, *a.shape[1:]), ress)

            if gmc_on:          # static at trace time
                from rtmodt_tpu.ops.gmc import (gmc_step, half_res_luma,
                                                luma_grid)

                # luma grids for all T*S content-Y planes, batched with the
                # rest of the per-frame work; half-res pool first so grids
                # match the x6 transport's parity-channel mean exactly
                grids = jax.vmap(
                    lambda yy: luma_grid(half_res_luma(yy), gcfg.grid))(yf)
                grids = grids.reshape(t, s_streams, gcfg.grid, gcfg.grid)

                def body(st_carry, xs):
                    st, (pg, pv) = st_carry
                    res_s, grid_s = xs

                    def one(ss, rr, gp, gv, gc):
                        ss, (cg, cv) = gmc_step(ss, gc, (gp, gv), gcfg,
                                                scale_xy)
                        ss, outs = mot_update(
                            ss, rr.boxes, rr.scores, rr.classes, rr.valid)
                        return ss, outs, cg, cv

                    st, outs, cg, cv = jax.vmap(one)(st, res_s, pg, pv, grid_s)
                    return (st, (cg, cv)), outs

                (state, carry), outs = jax.lax.scan(
                    body, (state, (gmc_grids, gmc_valid)), (ress, grids))
                return state, outs, ress, carry

            def body(st, res_s):
                st, outs = jax.vmap(
                    lambda ss, rr: mot_update(
                        ss, rr.boxes, rr.scores, rr.classes, rr.valid)
                )(st, res_s)
                return st, outs

            state, outs = jax.lax.scan(body, state, ress)
            return state, outs, ress

        ts_shard = NamedSharding(self.mesh, P(None, "data"))
        in_sh = (self._repl, self._stream_shard, ts_shard, ts_shard, ts_shard)
        out_sh = (self._stream_shard, ts_shard, ts_shard)
        if gmc_on:
            in_sh += (self._stream_shard, self._stream_shard)
            out_sh += ((self._stream_shard, self._stream_shard),)

        def build():
            return jax.jit(
                chunk, in_shardings=in_sh, out_shardings=out_sh,
                donate_argnums=(1,),
            )

        # tracing this program (scan over T of a vmapped tracker) costs
        # ~100 s per process; the AOT cache makes later cold-starts
        # millisecond-scale (runtime/aot_cache.py)
        from rtmodt_tpu.runtime.aot_cache import aot_cached

        def example_args():
            y0 = np.zeros((t, s_streams, ch, cw), np.uint8)
            u0 = np.zeros((t, s_streams, ch // 2, cw // 2), np.uint8)
            base = (self.params, self.state, y0, u0, u0.copy())
            if gmc_on:
                return base + (
                    np.zeros((s_streams, gcfg.grid, gcfg.grid), np.float32),
                    np.zeros((s_streams,), np.float32))
            return base

        # the key must pin the full traced signature - including the params
        # tree's avals (e.g. f32 vs bf16 deploy storage changes the program)
        param_sig = jax.tree.map(
            lambda x: (tuple(x.shape), str(x.dtype)), self.params)
        self._jitted[key] = aot_cached(
            ("msp_packed", repr(dcfg), self._mot_repr, self._gmc_repr,
             s_streams, tuple(self.mesh.shape.items()), src_h, src_w, t,
             param_sig),
            build, example_args)
        return self._jitted[key]

    def _x6_transport(self) -> bool:
        """Whether chunks ship a space-to-depth layout instead of planar
        I420 (same decision rule as ``Pipeline._x6_transport``: auto
        under ``packed`` where the s2d front runs - quant off, motion
        trackers whose programs never need the Y/U/V planes back)."""
        tr = self.cfg.parallel.transport
        if tr in ("x6", "x24"):
            return True
        return (tr == "packed" and self.cfg.detection.quant == "none"
                and not self._is_appearance)

    def _s2d_level(self, src_h: int, src_w: int) -> int:
        """Same decision as ``Pipeline._s2d_level``: 2 = x24 where
        content dims and pads divide by 4, 1 = x6, 0 = planar."""
        from rtmodt_tpu.ops.yuv import content_dims, packed_meta

        if not self._x6_transport():
            return 0
        tr = self.cfg.parallel.transport
        size = self.cfg.detection.input_size
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        ok24 = (ch % 4 == 0 and cw % 4 == 0
                and meta.pad_left % 4 == 0 and meta.pad_top % 4 == 0)
        if tr == "x6":
            return 1
        if tr == "x24":
            if not ok24:
                raise ValueError(
                    f"parallel.transport=x24 pinned but source {src_w}x"
                    f"{src_h} geometry is not divisible by 4; use "
                    "transport=packed for auto-selection")
            return 2
        from rtmodt_tpu.runtime.pipeline import _host_cpus

        return 2 if ok24 and _host_cpus() >= 2 else 1

    def _packed_chunk_x6_for(self, src_h: int, src_w: int, t: int,
                             level: int = 1):
        """s2d-transport twin of ``_packed_chunk_for``: consumes the host
        space-to-depth tensor ((T, S, ch/2, cw/2, 6) x6 or (T, S, ch/4,
        cw/4, 24) x24) - the device-side lane shuffle disappears and GMC
        luma grids come from the Y parity channels, numerically identical
        to the i420 path's half-res pooled grids (ops/gmc.py).  Streams
        stay sharded over ``data``."""
        key = ("x6" if level == 1 else "x24", src_h, src_w, t)
        if key in self._jitted:
            return self._jitted[key]
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
        size = dcfg.input_size
        s_streams = self.num_streams
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        pad_left, pad_top = meta.pad_left, meta.pad_top
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (src_w / gcfg.grid, src_h / gcfg.grid)

        def chunk(params, state, x6, gmc_grids=None, gmc_valid=None):
            n = t * s_streams
            x6f = x6.reshape(n, *x6.shape[2:])
            x6p = pad_fn(x6f, size, pad_left, pad_top, dtype=dtype)
            bd, cl = front_fn(params, model, x6p, dtype)

            def one_nms(bdi, cli):
                res = batched_nms_from_logits(
                    bdi, cli, size, dcfg.conf_threshold, dcfg.iou_threshold,
                    dcfg.max_detections, dcfg.nms_candidates, class_mask,
                    dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl)
                return res._replace(boxes=unletterbox_boxes_packed(res.boxes, meta))

            ress = jax.vmap(one_nms)(bd, cl)
            ress = jax.tree.map(
                lambda a: a.reshape(t, s_streams, *a.shape[1:]), ress)

            if gmc_on:          # static at trace time
                from rtmodt_tpu.ops.gmc import (gmc_step, luma_grid,
                                                s2d_half_luma,
                                                x24_half_luma)

                # half-res luma from the Y parity channels: the same
                # content the i420 path pools, identical at either level
                hl = s2d_half_luma if level == 1 else x24_half_luma
                luma = jax.vmap(hl)(x6f)
                grids = jax.vmap(lambda yy: luma_grid(yy, gcfg.grid))(luma)
                grids = grids.reshape(t, s_streams, gcfg.grid, gcfg.grid)

                def body(st_carry, xs):
                    st, (pg, pv) = st_carry
                    res_s, grid_s = xs

                    def one(ss, rr, gp, gv, gc):
                        ss, (cg, cv) = gmc_step(ss, gc, (gp, gv), gcfg,
                                                scale_xy)
                        ss, outs = mot_update(
                            ss, rr.boxes, rr.scores, rr.classes, rr.valid)
                        return ss, outs, cg, cv

                    st, outs, cg, cv = jax.vmap(one)(st, res_s, pg, pv, grid_s)
                    return (st, (cg, cv)), outs

                (state, carry), outs = jax.lax.scan(
                    body, (state, (gmc_grids, gmc_valid)), (ress, grids))
                return state, outs, ress, carry

            def body(st, res_s):
                st, outs = jax.vmap(
                    lambda ss, rr: mot_update(
                        ss, rr.boxes, rr.scores, rr.classes, rr.valid)
                )(st, res_s)
                return st, outs

            state, outs = jax.lax.scan(body, state, ress)
            return state, outs, ress

        ts_shard = NamedSharding(self.mesh, P(None, "data"))
        in_sh = (self._repl, self._stream_shard, ts_shard)
        out_sh = (self._stream_shard, ts_shard, ts_shard)
        if gmc_on:
            in_sh += (self._stream_shard, self._stream_shard)
            out_sh += ((self._stream_shard, self._stream_shard),)

        def build():
            return jax.jit(
                chunk, in_shardings=in_sh, out_shardings=out_sh,
                donate_argnums=(1,),
            )

        from rtmodt_tpu.runtime.aot_cache import aot_cached

        def example_args():
            x0 = (np.zeros((t, s_streams, ch // 2, cw // 2, 6), np.uint8)
                  if level == 1
                  else np.zeros((t, s_streams, ch // 4, cw // 4, 24),
                                np.uint8))
            base = (self.params, self.state, x0)
            if gmc_on:
                return base + (
                    np.zeros((s_streams, gcfg.grid, gcfg.grid), np.float32),
                    np.zeros((s_streams,), np.float32))
            return base

        param_sig = jax.tree.map(
            lambda x: (tuple(x.shape), str(x.dtype)), self.params)
        self._jitted[key] = aot_cached(
            ("msp_packed_x6" if level == 1 else "msp_packed_x24",
             repr(dcfg), self._mot_repr, self._gmc_repr,
             s_streams, tuple(self.mesh.shape.items()), src_h, src_w, t,
             param_sig),
            build, example_args)
        return self._jitted[key]

    def _packed_chunk_deepsort_for(self, src_h: int, src_w: int, t: int):
        """Appearance-tracker twin of ``_packed_chunk_for``: the per-frame
        NMS is followed by ROI crops taken directly from the padded Y/U/V
        planes (``ops.roi.crop_yuv_rgb`` - the RGB frame never exists)
        feeding the appearance embedder, all inside the same sharded
        program; only the per-stream DeepSORT/BoT-SORT update scans over T.
        Embedder params ride as a replicated argument next to the detector
        params."""
        key = ("packed_app", self.cfg.tracking.algorithm, src_h, src_w, t)
        if key in self._jitted:
            return self._jitted[key]
        from rtmodt_tpu.ops.planar_stem import pad_planes
        from rtmodt_tpu.ops.roi import crop_yuv_rgb
        from rtmodt_tpu.ops.s2d_front import apply_front
        from rtmodt_tpu.ops.yuv import (content_dims, packed_meta,
                                       unletterbox_boxes_packed)

        app_update = self._app_update
        dcfg = self.cfg.detection
        dscfg = self._ds_cfg
        embedder = self._embedder
        crop_hw = tuple(dscfg.crop_hw)
        dtype = jnp.bfloat16 if dcfg.half else jnp.float32
        model = self.detector.model
        class_mask = self.detector._class_mask
        size = dcfg.input_size
        s_streams = self.num_streams
        ch, cw = content_dims(src_h, src_w, size)
        meta = packed_meta(src_h, src_w, size)
        pad_left, pad_top = meta.pad_left, meta.pad_top
        gmc_on, gcfg = self._gmc_on, self.cfg.tracking.gmc
        scale_xy = (src_w / gcfg.grid, src_h / gcfg.grid)

        def chunk(params, emb_params, state, y, u, v,
                  gmc_grids=None, gmc_valid=None):
            n = t * s_streams
            yf = y.reshape(n, *y.shape[2:])
            uf = u.reshape(n, *u.shape[2:])
            vf = v.reshape(n, *v.shape[2:])
            yp, up, vp = pad_planes(yf, uf, vf, size, pad_left, pad_top)
            bd, cl = apply_front(params, model, yp, up, vp, dcfg.quant, dtype)

            def per_frame(bdi, cli, ypi, upi, vpi):
                res_lb = batched_nms_from_logits(
                    bdi, cli, size, dcfg.conf_threshold, dcfg.iou_threshold,
                    dcfg.max_detections, dcfg.nms_candidates, class_mask,
                    dcfg.agnostic_nms, impl=dcfg.nms_impl, topk=dcfg.topk_impl)
                crops = crop_yuv_rgb(ypi.astype(jnp.float32),
                                     upi.astype(jnp.float32),
                                     vpi.astype(jnp.float32),
                                     res_lb.boxes, crop_hw)
                emb = embedder.apply(emb_params, crops)
                res = res_lb._replace(
                    boxes=unletterbox_boxes_packed(res_lb.boxes, meta))
                return res, emb

            ress, embs = jax.vmap(per_frame)(bd, cl, yp, up, vp)
            ress = jax.tree.map(
                lambda a: a.reshape(t, s_streams, *a.shape[1:]), ress)
            embs = embs.reshape(t, s_streams, *embs.shape[1:])

            if gmc_on:          # static at trace time
                from rtmodt_tpu.ops.gmc import (gmc_step, half_res_luma,
                                                luma_grid)

                # half-res pool first: transport-independent grids
                grids = jax.vmap(
                    lambda yy: luma_grid(half_res_luma(yy), gcfg.grid))(yf)
                grids = grids.reshape(t, s_streams, gcfg.grid, gcfg.grid)

                def body(st_carry, xs):
                    st, (pg, pv) = st_carry
                    res_s, emb_s, grid_s = xs

                    def one(ss, rr, ee, gp, gv, gc):
                        ss, (cg, cv) = gmc_step(ss, gc, (gp, gv), gcfg,
                                                scale_xy)
                        ss, outs = app_update(
                            ss, rr.boxes, rr.scores, rr.classes, rr.valid, ee)
                        return ss, outs, cg, cv

                    st, outs, cg, cv = jax.vmap(one)(
                        st, res_s, emb_s, pg, pv, grid_s)
                    return (st, (cg, cv)), outs

                (state, carry), outs = jax.lax.scan(
                    body, (state, (gmc_grids, gmc_valid)),
                    (ress, embs, grids))
                return state, outs, ress, carry

            def body(st, xs):
                res_s, emb_s = xs
                st, outs = jax.vmap(
                    lambda ss, rr, ee: app_update(
                        ss, rr.boxes, rr.scores, rr.classes, rr.valid, ee)
                )(st, res_s, emb_s)
                return st, outs

            state, outs = jax.lax.scan(body, state, (ress, embs))
            return state, outs, ress

        ts_shard = NamedSharding(self.mesh, P(None, "data"))
        in_sh = (self._repl, self._repl, self._stream_shard,
                 ts_shard, ts_shard, ts_shard)
        out_sh = (self._stream_shard, ts_shard, ts_shard)
        if gmc_on:
            in_sh += (self._stream_shard, self._stream_shard)
            out_sh += ((self._stream_shard, self._stream_shard),)

        def build():
            return jax.jit(
                chunk, in_shardings=in_sh, out_shardings=out_sh,
                donate_argnums=(2,),
            )

        from rtmodt_tpu.runtime.aot_cache import aot_cached

        def example_args():
            y0 = np.zeros((t, s_streams, ch, cw), np.uint8)
            u0 = np.zeros((t, s_streams, ch // 2, cw // 2), np.uint8)
            base = (self.params, self.emb_params, self.state,
                    y0, u0, u0.copy())
            if gmc_on:
                return base + (
                    np.zeros((s_streams, gcfg.grid, gcfg.grid), np.float32),
                    np.zeros((s_streams,), np.float32))
            return base

        param_sig = jax.tree.map(
            lambda x: (tuple(x.shape), str(x.dtype)),
            (self.params, self.emb_params))
        self._jitted[key] = aot_cached(
            ("msp_packed_ds", repr(dcfg), self._mot_repr, self._gmc_repr,
             s_streams, tuple(self.mesh.shape.items()), src_h, src_w, t,
             param_sig),
            build, example_args)
        return self._jitted[key]

    def submit_chunk_packed(self, planes, src_h: int, src_w: int):
        """Async-submit packed chunks: (y (T,S,ch,cw), u, v) uint8 planes,
        or - with an s2d transport active - the pre-packed space-to-depth
        tensor from an ingest worker ((T, S, ch/2, cw/2, 6) x6 or
        (T, S, ch/4, cw/4, 24) x24, matching ``_s2d_level``)."""
        if isinstance(planes, np.ndarray):
            if not self._x6_transport():
                raise ValueError("pre-packed s2d tensor submitted but the "
                                 "active transport is not s2d")
            level = self._s2d_level(src_h, src_w)
            got = {6: 1, 24: 2}.get(int(planes.shape[-1]))
            tr = self.cfg.parallel.transport
            if (got is None or (got == 2 and level != 2)
                    or (tr == "x6" and got != 1)
                    or (tr == "x24" and got != 2)):
                raise ValueError(
                    f"pre-packed tensor has {planes.shape[-1]} channels; "
                    f"transport={tr!r} with this geometry expects "
                    f"{'6 (x6)' if level == 1 else '6 or 24'}")
            level = got
            t = planes.shape[0]
            sh = NamedSharding(self.mesh, P(None, "data"))
            fn = self._packed_chunk_x6_for(src_h, src_w, t, level=level)
            self.state, outs, ress = self._run_prog(
                fn, self.params, self.state, jax.device_put(planes, sh))
            return outs, ress
        y, u, v = planes
        t = y.shape[0]
        sh = NamedSharding(self.mesh, P(None, "data"))
        if self._is_appearance:
            dev = (jax.device_put(y, sh), jax.device_put(u, sh),
                   jax.device_put(v, sh))
            fn = self._packed_chunk_deepsort_for(src_h, src_w, t)
            self.state, outs, ress = self._run_prog(
                fn, self.params, self.emb_params, self.state, *dev)
        elif self._x6_transport():
            from rtmodt_tpu.ops.yuv import planes_to_x24, planes_to_x6

            level = self._s2d_level(src_h, src_w)
            pack = planes_to_x6 if level == 1 else planes_to_x24
            s = y.shape[1]
            x6 = pack(y.reshape(t * s, *y.shape[2:]),
                      u.reshape(t * s, *u.shape[2:]),
                      v.reshape(t * s, *v.shape[2:]))
            x6 = x6.reshape(t, s, *x6.shape[1:])
            fn = self._packed_chunk_x6_for(src_h, src_w, t, level=level)
            self.state, outs, ress = self._run_prog(
                fn, self.params, self.state, jax.device_put(x6, sh))
        else:
            dev = (jax.device_put(y, sh), jax.device_put(u, sh),
                   jax.device_put(v, sh))
            fn = self._packed_chunk_for(src_h, src_w, t)
            self.state, outs, ress = self._run_prog(
                fn, self.params, self.state, *dev)
        return outs, ress

    # ------------------------------------------------------------------
    def run(self, sources: list, max_frames: int | None = None,
            chunk_size: int | None = None, display: bool = False,
            state_path: str | None = None,
            state_interval: int = 300) -> dict:
        """End-to-end multi-camera loop - the scale-out analog of
        ``Pipeline.run_chunked`` (one camera) for S cameras on one SPMD
        program.

        One reader+packer thread per stream decodes and packs frames to
        planar I420; the main loop assembles time-aligned (T, S) chunks,
        submits ONE sharded program per chunk (streams ride the mesh's
        ``data`` axis), and consumes tracker outputs with the vectorized
        per-stream event engines (``ZoneEventEngine.process_chunk``).

        ``sources``: S video paths / RTSP URLs / webcam indices (len must
        equal ``num_streams``).  Returns a summary dict with aggregate and
        per-stream FPS.  Streams must share one resolution (static shapes).

        Degraded mode: a stream that ends (file EOF) or dies (reconnects
        exhausted, decoder error) does NOT stop the others - the SPMD
        program keeps its static (T, S) shape and the dead slot is fed
        blank frames (its tracker slots age out and its zone occupancy
        drains naturally, like a camera going black).  The run ends when
        every stream is done; ``dead_streams`` and per-stream frame counts
        are reported in the summary.

        ``state_path`` enables kill-and-resume snapshots, the multi-camera
        analog of ``Pipeline.run`` (runtime/state_store.py): the batched
        S-leading tracker state, per-stream GMC carry, and every stream's
        zone dwell/cooldown/analytics state are written atomically every
        ``state_interval`` consumed frames (at drained pipeline-window
        boundaries, so device and host state describe the same frames) and
        at clean exit.  If the snapshot already exists at start, it is
        restored and each FILE source fast-forwards past that stream's
        already-consumed frames so stream-time dwell clocks line up.
        """
        import os
        import queue
        import threading
        import time as _time
        from collections import deque

        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader
        from rtmodt_tpu.ops.yuv import content_dims, packed_meta, pack_i420_planar

        s_streams = self.num_streams
        if len(sources) != s_streams:
            raise ValueError(f"{len(sources)} sources for {s_streams} streams")
        t_chunk = chunk_size or max(2, self.cfg.parallel.chunk_size)
        depth = max(0, self.cfg.parallel.pipeline_depth)
        icfg = self.cfg.ingestion
        ecfg = self.cfg.events
        engines = None
        if ecfg.enabled and ecfg.zones:
            engines = [
                ZoneEventEngine.from_config(
                    ecfg, trail_length=self.cfg.tracking.trail_length)
                for _ in range(s_streams)]
            for si, eng in enumerate(engines):
                eng.extra_metadata = {"stream": si}
        names = self.detector.class_names

        # kill-and-resume: restore the batched tracker state + per-stream
        # engine state BEFORE the ingest threads start, so each file source
        # knows how many frames to fast-forward past
        skip_frames = [0] * s_streams
        resume_meta = None
        if state_path and os.path.exists(state_path):
            from rtmodt_tpu.runtime.state_store import (
                load_multistream_snapshot)

            resume_meta = load_multistream_snapshot(state_path, self, engines)
            skip_frames = [int(n) for n in resume_meta["per_stream_frames"]]

        # annotated mosaic output (display and/or video file): opt-in, so
        # the headless hot path never retains BGR frames on host
        vcfg = self.cfg.visualization
        render_on = display or vcfg.save_video or vcfg.mjpeg_port is not None
        annot = MosaicAnnotator(vcfg, names, s_streams) if render_on else None
        monitor = None
        if vcfg.mjpeg_port is not None:
            from rtmodt_tpu.serving.monitor import LiveMonitor

            monitor = LiveMonitor(vcfg.mjpeg_port)
        writer = None
        render_zones = (engines[0].get_zone_polygons()
                        if (render_on and engines) else [])

        qs: list[queue.Queue] = [queue.Queue(maxsize=3 * t_chunk)
                                 for _ in range(s_streams)]
        stop = threading.Event()
        fps_by_stream = [30.0] * s_streams   # measured per stream by ingest

        def ingest(si: int):
            """Decode + pack one stream; None sentinel marks EOF/stop."""
            try:
                with RTSPReader(sources[si], backend=icfg.backend,
                                reconnect_delay_sec=icfg.reconnect_delay_sec,
                                max_reconnects=icfg.max_reconnects,
                                resolution=(tuple(icfg.resolution)
                                            if icfg.resolution else None)) as rd:
                    if rd.fps and rd.fps > 0:
                        fps_by_stream[si] = float(rd.fps)
                    last_id = 0
                    # resume fast-forward: decode-and-drop the frames a
                    # prior run already consumed, so fid/ts (the stream
                    # clock the zone engines dwell on) continue exactly.
                    # FILE sources only (same gate as pipeline.py): a live
                    # RTSP/webcam source resumes from the current frame -
                    # dropping skip_frames at capture rate would stall
                    # resume for the prior run's entire duration, and live
                    # ts is wall time anyway (docs/OPERATIONS.md)
                    dropped = 0
                    while (dropped < skip_frames[si] and rd._is_file
                           and not stop.is_set()):
                        frame, fid, ts = rd.read_new(last_id, timeout=2.0)
                        if frame is None:
                            if rd.is_eof:
                                break
                            continue
                        last_id = fid
                        dropped += 1
                    while not stop.is_set():
                        frame, fid, ts = rd.read_new(last_id, timeout=2.0)
                        if frame is None:
                            if rd.is_eof:
                                break
                            continue
                        last_id = fid
                        planes, _ = pack_i420_planar(
                            frame, self.cfg.detection.input_size)
                        item = (planes, frame.shape[:2], fid, ts,
                                frame if render_on else None)
                        while not stop.is_set():   # bounded put, stop-aware
                            try:
                                qs[si].put(item, timeout=0.5)
                                break
                            except queue.Full:
                                continue
            except Exception as e:  # surfaced via the sentinel + log
                logger.error(f"stream {si} ingest failed: {e}")
            try:
                qs[si].put_nowait(None)
            except queue.Full:
                pass

        workers = [threading.Thread(target=ingest, args=(si,), daemon=True)
                   for si in range(s_streams)]
        for wk in workers:
            wk.start()

        size = self.cfg.detection.input_size
        inflight: deque = deque()
        frames_done = 0
        n_chunks = 0
        src_hw = None
        y = u = v = None
        t_start = None

        def consume(entry) -> bool:
            """Host half of one chunk: events + optional mosaic render.
            Returns False when the display window requests quit."""
            nonlocal frames_done, writer
            metas, outs, n_real, bgrs = entry
            host = jax.device_get(outs)
            if engines is not None:
                tid = np.asarray(host.track_id)
                cid = np.asarray(host.class_id)
                bxs = np.asarray(host.boxes)
                vis = np.asarray(host.visible)
                for si in range(s_streams):
                    engines[si].process_chunk(
                        tid[:, si], cid[:, si], bxs[:, si], vis[:, si],
                        [m[si][0] for m in metas],
                        np.asarray([m[si][1] for m in metas], np.float64),
                        class_names=names)
            frames_done += n_real
            if annot is not None:
                import cv2

                elapsed = (_time.perf_counter() - t_start) if t_start else 0.0
                fps_now = frames_done / elapsed if elapsed > 0 else 0.0
                for t, row in enumerate(bgrs):
                    if all(f is None for f in row):
                        continue  # trailing all-blank rows of the last chunk
                    grid = annot.mosaic(host, t, row, render_zones, fps_now)
                    if monitor is not None:
                        monitor.publish(grid)
                    if vcfg.save_video:
                        if writer is None:
                            os.makedirs(os.path.dirname(vcfg.save_path)
                                        or ".", exist_ok=True)
                            fps_out = (fps_by_stream[0]
                                       if fps_by_stream[0] > 0 else 25.0)
                            writer = cv2.VideoWriter(
                                vcfg.save_path,
                                cv2.VideoWriter_fourcc(*vcfg.codec),
                                fps_out, (grid.shape[1], grid.shape[0]))
                        writer.write(grid)
                    if display:
                        cv2.imshow(vcfg.window_name, grid)
                        if cv2.waitKey(1) & 0xFF == ord("q"):
                            return False
            return True

        dead = [False] * s_streams
        last_meta = [(0, 0.0)] * s_streams   # per-stream (fid, ts) for blanks
        per_stream_frames = [0] * s_streams
        if resume_meta is not None:
            last_meta = [tuple(m) for m in resume_meta["last_meta"]]
            # cumulative across restarts: the NEXT snapshot's fast-forward
            # counts must cover this run's frames AND every prior run's
            per_stream_frames = [int(n)
                                 for n in resume_meta["per_stream_frames"]]
        last_snap = sum(per_stream_frames)
        aborted = False

        def snapshot() -> None:
            from rtmodt_tpu.runtime.state_store import (
                save_multistream_snapshot)

            save_multistream_snapshot(
                state_path, self, engines,
                per_stream_frames=per_stream_frames,
                last_meta=last_meta, dead=dead)

        try:
            while True:
                if max_frames and n_chunks * t_chunk >= max_frames:
                    break
                # gather one time-aligned (T, S) block; a stream hitting its
                # EOF sentinel goes dead and contributes blanks from then on
                block: list[list] = [[] for _ in range(s_streams)]
                for si in range(s_streams):
                    while not dead[si] and len(block[si]) < t_chunk:
                        try:
                            item = qs[si].get(timeout=2.0)
                        except queue.Empty:
                            if workers[si].is_alive():
                                continue
                            item = None   # worker died; sentinel was dropped
                        if item is None:  # EOF sentinel
                            dead[si] = True
                            logger.info(f"stream {si} ended; continuing "
                                        "degraded (blank frames)")
                            break
                        block[si].append(item)
                n_real = sum(len(b) for b in block)
                if n_real == 0:           # every stream done
                    break
                if src_hw is None:
                    src_hw = next(b for b in block if b)[0][1]
                    ch, cw = content_dims(*src_hw, size)
                # FRESH buffers per block: the previous block's device_put
                # may still be reading its host arrays (async transfer with
                # pipeline_depth > 0) - reusing them in place would corrupt
                # in-flight chunks
                y = np.empty((t_chunk, s_streams, ch, cw), np.uint8)
                u = np.empty((t_chunk, s_streams, ch // 2, cw // 2), np.uint8)
                v = np.empty((t_chunk, s_streams, ch // 2, cw // 2), np.uint8)
                metas = []
                bgrs = []
                for t in range(t_chunk):
                    row = []
                    brow = []
                    for si in range(s_streams):
                        bgr = None
                        if t < len(block[si]):
                            planes, hw, fid, ts, bgr = block[si][t]
                            if hw != src_hw:
                                raise ValueError(
                                    f"stream {si} resolution {hw} != {src_hw}; "
                                    "all streams must share one resolution")
                            y[t, si], u[t, si], v[t, si] = planes
                            last_meta[si] = (fid, ts)
                            per_stream_frames[si] += 1
                        else:             # dead/short slot: blank frame,
                            y[t, si] = 0  # fid/ts sequence continued so the
                            u[t, si] = 128  # zone engine's stream clock
                            v[t, si] = 128  # stays monotonic
                            fid = last_meta[si][0] + 1
                            ts = last_meta[si][1] + 1.0 / fps_by_stream[si]
                            last_meta[si] = (fid, ts)
                        row.append(last_meta[si])
                        brow.append(bgr)
                    metas.append(row)
                    bgrs.append(brow)
                outs, _ress = self.submit_chunk_packed((y, u, v), *src_hw)
                for leaf in jax.tree.leaves(outs):
                    if hasattr(leaf, "copy_to_host_async"):
                        leaf.copy_to_host_async()
                inflight.append((metas, outs, n_real, bgrs))
                n_chunks += 1
                if t_start is None:
                    t_start = _time.perf_counter()
                if len(inflight) > depth:
                    if not consume(inflight.popleft()):
                        inflight.clear()
                        aborted = True
                        break
                if (state_path
                        and sum(per_stream_frames) - last_snap
                        >= state_interval):
                    # drain the window first: the snapshot's tracker state
                    # (device, updated at submit) and engine state (host,
                    # updated at consume) must describe the same frames
                    while inflight:
                        if not consume(inflight.popleft()):
                            inflight.clear()
                            aborted = True
                            break
                    if aborted:
                        break
                    snapshot()
                    last_snap = sum(per_stream_frames)
            while inflight:
                if not consume(inflight.popleft()):
                    aborted = True
                    break
            if state_path and not aborted and t_start is not None:
                snapshot()   # clean-exit snapshot covers the whole run
        finally:
            stop.set()
            for q in qs:  # unblock any producer stuck on a full queue
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
            if monitor is not None:
                monitor.close()
            if writer is not None:
                writer.release()
                logger.info(f"mosaic video written: {vcfg.save_path}")
            if display:
                import cv2

                cv2.destroyAllWindows()
        wall = (_time.perf_counter() - t_start) if t_start else 0.0
        fps = frames_done / wall if wall > 0 else 0.0
        summary = {
            "frames": frames_done,
            "streams": s_streams,
            "fps_aggregate": round(fps, 1),
            "fps_per_stream": round(fps / s_streams, 1),
            "per_stream_frames": per_stream_frames,
            "dead_streams": [si for si, d in enumerate(dead) if d],
        }
        if engines is not None:
            summary["zone_counts"] = [eng.zone_counts() for eng in engines]
        logger.info(f"multi-stream run: {frames_done} frames over "
                    f"{s_streams} streams, {summary['fps_aggregate']} fps "
                    f"aggregate ({summary['fps_per_stream']}/stream)")
        return summary

    # ------------------------------------------------------------------
    def step(self, frames: np.ndarray):
        """frames (S, H, W, 3) uint8 -> (outputs, res) with leading S axis."""
        s, h, w = frames.shape[:3]
        assert s == self.num_streams
        fn = self._step_for(h, w)
        self.state, outs, ress = self._run_prog(
            fn, self.params, self.state,
            jax.device_put(frames, self._stream_shard))
        return outs, ress

    def step_chunk(self, frames: np.ndarray):
        """frames (T, S, H, W, 3) -> outputs with leading (T, S) axes."""
        t, s, h, w = frames.shape[:4]
        assert s == self.num_streams
        fn = self._chunk_for(h, w, t)
        sharded = jax.device_put(frames, NamedSharding(self.mesh, P(None, "data")))
        self.state, outs, ress = self._run_prog(
            fn, self.params, self.state, sharded)
        return outs, ress
