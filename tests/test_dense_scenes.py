"""Crowded-scene stress: NMS/assignment equivalence and tracker behavior at
64-128+ overlapping objects (VERDICT round-1 weakness #4: all prior
correctness evidence came from sparse 8-object scenes).

The parallel formulations' convergence-round claims ("2-4 rounds in real
scenes, K worst case" - ops/nms.py:41-56, ops/assignment.py:38-43) are
measured here with host replicas, and exactness against the sequential
oracles is property-tested exactly where chains get deep: dense clusters.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_boxes


def _np_iou(a, b):
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    aa = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    ab = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def _np_greedy_nms(boxes, scores, iou_thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        ious = _np_iou(boxes[i:i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= iou_thresh]
    return keep


def _fixpoint_rounds(boxes, scores, iou_thresh):
    """Host replica of ops/nms.py::_greedy_suppress counting rounds."""
    order = np.argsort(-scores, kind="stable")
    boxes, scores = boxes[order], scores[order]
    k = len(boxes)
    iou = _np_iou(boxes, boxes)
    conflict = np.triu(np.ones((k, k), bool), 1) & (iou > iou_thresh) \
        & (scores[:, None] > 0)
    keep = np.ones(k, bool)
    prev = None
    rounds = 0
    while prev is None or (keep != prev).any():
        prev = keep
        keep = ~np.any(conflict & keep[:, None], axis=0)
        rounds += 1
    return keep, rounds


def dense_cluster_scene(rng, n_objects, n_clusters=8, jitter=18.0,
                        w=640, h=640, size=60):
    """n_objects boxes piled into n_clusters tight groups - deep suppression
    chains (the adversarial case for chain-depth convergence)."""
    centers = rng.uniform(size, [w - size, h - size], (n_clusters, 2))
    cid = rng.integers(0, n_clusters, n_objects)
    c = centers[cid] + rng.normal(0, jitter, (n_objects, 2))
    wh = rng.uniform(size * 0.6, size * 1.4, (n_objects, 2))
    boxes = np.concatenate([c - wh / 2, c + wh / 2], axis=-1)
    # integer pixel coords: keeps IoU ratios away from f32-vs-f64 rounding
    # ambiguity at the suppression threshold (the equivalence property is
    # about ordering/chains, not about epsilon-threshold ties)
    return np.round(np.clip(boxes, 0, [w, h, w, h])).astype(np.float32)


class TestDenseNMS:
    @pytest.mark.parametrize("n", [64, 128, 256])
    def test_fixpoint_equals_sequential_in_clusters(self, rng, n):
        from rtmodt_tpu.ops import batched_nms_fixed

        for trial in range(4):
            boxes = dense_cluster_scene(rng, n)
            scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
            cs = scores[:, None]
            res = batched_nms_fixed(boxes, cs, 0.05, 0.5, max_det=n,
                                    num_candidates=n, agnostic=True)
            got = {tuple(np.round(b, 2)) for b, v in
                   zip(np.asarray(res.boxes), np.asarray(res.valid)) if v}
            want = {tuple(np.round(b, 2))
                    for b in boxes[_np_greedy_nms(boxes, scores, 0.5)]}
            assert got == want, f"n={n} trial={trial}"

    @pytest.mark.parametrize("n", [64, 128, 256])
    def test_round_count_stays_shallow(self, rng, n):
        """Convergence rounds grow with chain depth, not with N: even 256
        boxes piled into 8 clusters converge in far fewer than N rounds
        (this is what makes the parallel formulation viable on TPU)."""
        worst = 0
        for trial in range(4):
            boxes = dense_cluster_scene(rng, n)
            scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
            keep, rounds = _fixpoint_rounds(boxes, scores, 0.5)
            worst = max(worst, rounds)
            want = _np_greedy_nms(boxes, scores, 0.5)
            got_idx = np.argsort(-scores, kind="stable")[keep]
            assert set(got_idx.tolist()) == set(want)
        assert worst <= 12, f"convergence degraded: {worst} rounds for n={n}"

    def test_identical_boxes_pathological_pile(self, rng):
        """100 near-identical boxes on one spot: a single survivor, and the
        fixpoint must converge immediately (depth-1 chains)."""
        from rtmodt_tpu.ops import batched_nms_fixed

        n = 100
        base = np.array([100, 100, 220, 230], np.float32)
        boxes = base[None] + rng.normal(0, 0.8, (n, 4)).astype(np.float32)
        scores = rng.uniform(0.4, 1.0, n).astype(np.float32)
        res = batched_nms_fixed(boxes, scores[:, None], 0.05, 0.5,
                                max_det=n, num_candidates=n, agnostic=True)
        assert int(res.count) == 1
        _, rounds = _fixpoint_rounds(boxes, scores, 0.5)
        assert rounds <= 2

    def test_candidate_pool_saturation_contract(self, rng):
        """More gated anchors than num_candidates: the static top-k keeps
        the highest-scoring pool and NMS equals the oracle run on exactly
        that pool (documented contract of the fixed-shape design)."""
        from rtmodt_tpu.ops import batched_nms_fixed

        n, k_pool = 500, 300
        boxes = random_boxes(rng, n, w=640, h=640, min_size=10, max_size=60)
        scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
        res = batched_nms_fixed(boxes, scores[:, None], 0.05, 0.5,
                                max_det=100, num_candidates=k_pool,
                                agnostic=True)
        pool = np.argsort(-scores, kind="stable")[:k_pool]
        keep = _np_greedy_nms(boxes[pool], scores[pool], 0.5)
        want = {tuple(np.round(b, 2)) for b in boxes[pool][keep][:100]}
        got = {tuple(np.round(b, 2)) for b, v in
               zip(np.asarray(res.boxes), np.asarray(res.valid)) if v}
        # top-k by score + greedy-by-score: truncation to max_det keeps the
        # highest-score survivors, matching the oracle's first 100
        assert got <= want
        assert len(got) == min(100, len(keep))


class TestDenseAssignment:
    def _np_sequential_greedy(self, sim, threshold):
        sim = sim.copy().astype(np.float64)
        r, c = sim.shape
        row_to_col = np.full(r, -1, np.int64)
        while True:
            i, j = np.unravel_index(np.argmax(sim), sim.shape)
            if sim[i, j] < threshold:
                break
            row_to_col[i] = j
            sim[i, :] = -1e18
            sim[:, j] = -1e18
        return row_to_col

    @pytest.mark.parametrize("n", [64, 128])
    def test_mutual_best_equals_sequential_dense(self, rng, n):
        """Dense IoU-style cost from two crowded box sets (high overlap,
        many near-ties) - the adversarial regime for mutual-best rounds."""
        from rtmodt_tpu.ops.assignment import greedy_assign

        for trial in range(4):
            a = dense_cluster_scene(rng, n)
            b = a + rng.normal(0, 6.0, a.shape).astype(np.float32)
            sim = _np_iou(a, b).astype(np.float32)
            got = np.asarray(greedy_assign(jnp.asarray(sim), 0.1).row_to_col)
            want = self._np_sequential_greedy(sim, 0.1)
            np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

    def test_mutual_best_rounds_shallow_dense(self, rng):
        """Round count for 128x128 dense matrices stays far below min(R,C)."""
        from rtmodt_tpu.ops.assignment import greedy_assign  # noqa: F401

        n = 128
        a = dense_cluster_scene(rng, n)
        b = a + rng.normal(0, 6.0, a.shape).astype(np.float32)
        sim = _np_iou(a, b)
        rounds = 0
        s = np.where(sim >= 0.1, sim, -1e9)
        while s.max() >= 0.1 and rounds < n:
            rb = s.argmax(1)
            cb = s.argmax(0)
            mutual = (cb[rb] == np.arange(n)) & (s.max(1) >= 0.1)
            rows = np.where(mutual)[0]
            s[rows, :] = -1e9
            s[:, rb[rows]] = -1e9
            rounds += 1
        assert rounds <= 16, f"{rounds} rounds for 128x128 dense"


class TestDenseTracker:
    def _run_grid(self, cfg, velocity, n=128, frames=12, box=34.0):
        """Drive a translating n-object grid; returns per-frame object->id
        maps (asserting full visibility from frame 1 on)."""
        import jax.numpy as jnp  # noqa: F811

        from rtmodt_tpu.tracking.bytetrack import (
            bytetrack_update, init_track_state)

        gx, gy = np.meshgrid(np.arange(16), np.arange(8))
        c0 = np.stack([40 + gx.ravel() * 78.0, 60 + gy.ravel() * 84.0], -1)[:n]
        wh = np.full((n, 2), box)
        state = init_track_state(cfg.max_tracks)
        max_det = 160
        id_history = []
        for t in range(frames):
            c = c0 + t * np.asarray(velocity)
            boxes = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
            boxes_p = np.zeros((max_det, 4), np.float32)
            boxes_p[:n] = boxes
            scores = np.zeros(max_det, np.float32)
            scores[:n] = 0.9
            classes = np.zeros(max_det, np.int32)
            valid = np.zeros(max_det, bool)
            valid[:n] = True
            state, outs = bytetrack_update(
                state, jnp.asarray(boxes_p), jnp.asarray(scores),
                jnp.asarray(classes), jnp.asarray(valid), cfg)
            vis = np.asarray(outs.visible)
            tids = np.asarray(outs.track_id)
            obxs = np.asarray(outs.boxes)
            if t >= 1:
                assert vis.sum() == n, f"frame {t}: {vis.sum()} visible"
                oc = (obxs[vis, :2] + obxs[vis, 2:]) / 2
                d = np.linalg.norm(oc[:, None] - c[None], axis=-1)
                obj = d.argmin(1)
                assert len(set(obj.tolist())) == n
                id_history.append(dict(zip(obj.tolist(), tids[vis].tolist())))
        return id_history

    def test_128_objects_stable_ids_reference_gate(self):
        """128-object grid at near-full occupancy, motion slow enough for
        the REFERENCE acceptance rule (IoU >= match_thresh=0.8, reference
        tracker.py:170): one id per object across 12 frames."""
        from rtmodt_tpu.config.loader import ByteTrackConfig

        hist = self._run_grid(ByteTrackConfig(max_tracks=256,
                                              match_metric="iou"),
                              velocity=(1.0, 0.5))
        for later in hist[1:]:
            assert later == hist[0], "track id switch in dense scene"

    def test_128_objects_fast_motion_canonical_metric(self):
        """Motion of ~10%/frame of box size drops inter-frame IoU to ~0.77 -
        BELOW the reference's 0.8 similarity gate (which churns ids by
        design, see config/loader.py match_metric docs).  Canonical
        ByteTrack semantics (iou_distance: accept IoU >= 1-0.8) must hold
        ids through it."""
        from rtmodt_tpu.config.loader import ByteTrackConfig

        cfg = ByteTrackConfig(max_tracks=256, match_metric="iou_distance")
        hist = self._run_grid(cfg, velocity=(3.0, 1.5))
        for later in hist[1:]:
            assert later == hist[0], "track id switch under canonical metric"

    def test_reference_gate_churns_under_fast_motion(self):
        """Documents the reference quirk (opt-in via match_metric="iou"):
        at IoU ~0.77 < 0.8 nothing associates, so ids churn every frame
        (new ids born while slots last)."""
        from rtmodt_tpu.config.loader import ByteTrackConfig

        hist = self._run_grid(ByteTrackConfig(max_tracks=256,
                                              match_metric="iou"),
                              velocity=(3.0, 1.5), frames=2)
        # frame 1's ids are all fresh births (> n), not frame 0's ids
        assert min(hist[0].values()) > 128


class TestRoundDiagnostics:
    """The device-side round counters (ops/nms.py::nms_debug_from_logits /
    _greedy_suppress, ops/assignment.py::greedy_assign_rounds) power
    tools/bench_dense.py's scaling table - pin them to the host replicas."""

    def test_device_nms_rounds_match_host_replica(self, rng):
        from rtmodt_tpu.ops.iou import pairwise_iou
        from rtmodt_tpu.ops.nms import _greedy_suppress

        for n in (64, 128):
            boxes = dense_cluster_scene(rng, n)
            scores = np.sort(rng.uniform(0.05, 1.0, n)
                             .astype(np.float32))[::-1].copy()
            iou = pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes))
            keep_d, rounds_d = _greedy_suppress(iou, jnp.asarray(scores), 0.5)
            # host replica sorts internally; scores are pre-sorted here
            keep_h, rounds_h = _fixpoint_rounds(boxes, scores, 0.5)
            assert np.array_equal(np.asarray(keep_d), keep_h)
            assert int(rounds_d) == rounds_h

    def test_assign_rounds_consistent_with_assignment(self, rng):
        from rtmodt_tpu.ops.assignment import (greedy_assign,
                                               greedy_assign_rounds)

        n = 96
        a = dense_cluster_scene(rng, n)
        b = a + rng.normal(0, 6.0, a.shape).astype(np.float32)
        sim = jnp.asarray(_np_iou(a, b))
        rounds = int(greedy_assign_rounds(sim, 0.1))
        res = greedy_assign(sim, 0.1)
        n_matched = int((np.asarray(res.row_to_col) >= 0).sum())
        assert 1 <= rounds <= n
        # every round commits >= 1 pair, so rounds can never exceed matches
        assert rounds <= max(1, n_matched)
        assert rounds <= 16, f"{rounds} rounds for 96x96 dense"
