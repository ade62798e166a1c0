"""Self-contained MOTChallenge tracking evaluation (CLEAR MOT + identity).

motmetrics (the reference's evaluator, ``src/evaluation/metrics.py:69-102``)
is not available here, so this implements the standard protocol directly:

  * per-frame GT<->hypothesis matching: carry over previous-frame pairings
    when still valid (CLEAR continuity rule), then optimal min-cost matching
    (scipy Hungarian) on 1 - IoU with a 0.5 gate;
  * MOTA = 1 - (FN + FP + IDSW) / num_gt;  MOTP = mean 1 - IoU of matches
    (motmetrics' distance convention);
  * IDF1 via global bipartite matching between GT and predicted trajectories
    on per-pair overlap counts (Ristani et al. 2016);
  * mostly_tracked / mostly_lost at the usual 80% / 20% coverage cuts.

MOT15-2D file rows: frame, id, bb_left, bb_top, bb_width, bb_height,
conf, x, y, z.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
from scipy.optimize import linear_sum_assignment

IOU_GATE = 0.5


def load_mot_txt(path: str) -> dict[int, dict[int, np.ndarray]]:
    """-> {frame: {track_id: xywh box}} (conf<=0 GT rows are kept: the MOT15
    format has no ignore flag; callers may pre-filter)."""
    frames: dict[int, dict[int, np.ndarray]] = defaultdict(dict)
    with open(path) as f:
        for line in f:
            parts = line.replace(";", ",").split(",")
            if len(parts) < 6:
                continue
            fr, tid = int(float(parts[0])), int(float(parts[1]))
            box = np.array([float(parts[2]), float(parts[3]),
                            float(parts[4]), float(parts[5])], np.float64)
            frames[fr][tid] = box
    return frames


def _iou_xywh(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = np.clip(np.minimum(ax2[:, None], bx2[None]) - np.maximum(a[:, None, 0], b[None, :, 0]), 0, None)
    iy = np.clip(np.minimum(ay2[:, None], by2[None]) - np.maximum(a[:, None, 1], b[None, :, 1]), 0, None)
    inter = ix * iy
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    return inter / np.maximum(union, 1e-9)


def evaluate_mot(gt_frames: dict[int, dict[int, np.ndarray]],
                 pred_frames: dict[int, dict[int, np.ndarray]]) -> dict[str, float]:
    num_gt = 0
    fp = fn = idsw = 0
    match_dists: list[float] = []
    last_match: dict[int, int] = {}              # gt_id -> pred_id (most recent)
    # (gt_id, pred_id) -> frames where the PAIR's boxes overlap >= gate,
    # INDEPENDENT of the CLEAR per-frame assignment: Ristani ID measures
    # count every spatially-compatible frame, so a pair the CLEAR
    # continuity rule never picked can still win the global matching
    co_gate = defaultdict(int)
    gt_frames_count = defaultdict(int)           # gt_id -> #frames present
    gt_matched_count = defaultdict(int)          # gt_id -> #frames matched
    pred_frames_count = defaultdict(int)

    for fr in sorted(set(gt_frames) | set(pred_frames)):
        gts = gt_frames.get(fr, {})
        preds = pred_frames.get(fr, {})
        gt_ids = list(gts)
        pred_ids = list(preds)
        num_gt += len(gt_ids)
        for g in gt_ids:
            gt_frames_count[g] += 1
        for p in pred_ids:
            pred_frames_count[p] += 1

        if not gt_ids or not pred_ids:
            fn += len(gt_ids)
            fp += len(pred_ids)
            continue

        gt_boxes = np.stack([gts[g] for g in gt_ids])
        pred_boxes = np.stack([preds[p] for p in pred_ids])
        iou = _iou_xywh(gt_boxes, pred_boxes)
        for gi, pi in np.argwhere(iou >= IOU_GATE):
            co_gate[(gt_ids[gi], pred_ids[pi])] += 1

        matches: dict[int, int] = {}
        # CLEAR continuity: keep last frame's pairing if still above the gate
        used_p = set()
        for gi, g in enumerate(gt_ids):
            p = last_match.get(g)
            if p in preds and p not in used_p:
                pi = pred_ids.index(p)
                if iou[gi, pi] >= IOU_GATE:
                    matches[gi] = pi
                    used_p.add(p)
        # Hungarian on the rest
        free_g = [gi for gi in range(len(gt_ids)) if gi not in matches]
        free_p = [pi for pi in range(len(pred_ids)) if pred_ids[pi] not in used_p]
        if free_g and free_p:
            sub = 1.0 - iou[np.ix_(free_g, free_p)]
            sub[sub > 1.0 - IOU_GATE] = 1e6
            rows, cols = linear_sum_assignment(sub)
            for r, c in zip(rows, cols):
                if sub[r, c] < 1e6:
                    matches[free_g[r]] = free_p[c]

        for gi, pi in matches.items():
            g, p = gt_ids[gi], pred_ids[pi]
            if g in last_match and last_match[g] != p:
                idsw += 1
            last_match[g] = p
            gt_matched_count[g] += 1
            match_dists.append(1.0 - iou[gi, pi])
        fn += len(gt_ids) - len(matches)
        fp += len(pred_ids) - len(matches)

    # --- identity metrics (IDF1) via global trajectory matching ----------
    gt_ids_all = sorted(gt_frames_count)
    pr_ids_all = sorted(pred_frames_count)
    if gt_ids_all and pr_ids_all:
        cost = np.zeros((len(gt_ids_all), len(pr_ids_all)))
        for (g, p), n in co_gate.items():
            cost[gt_ids_all.index(g), pr_ids_all.index(p)] = -n
        rows, cols = linear_sum_assignment(cost)
        idtp = int(sum(-cost[r, c] for r, c in zip(rows, cols)))
    else:
        idtp = 0
    total_pred = sum(pred_frames_count.values())
    idfp = total_pred - idtp
    idfn = num_gt - idtp
    idf1 = 2 * idtp / max(2 * idtp + idfp + idfn, 1)

    mt = sum(1 for g in gt_ids_all
             if gt_matched_count[g] / gt_frames_count[g] >= 0.8)
    ml = sum(1 for g in gt_ids_all
             if gt_matched_count[g] / gt_frames_count[g] <= 0.2)

    return {
        "idf1": float(idf1),
        "mota": float(1.0 - (fn + fp + idsw) / max(num_gt, 1)),
        "motp": float(np.mean(match_dists)) if match_dists else 0.0,
        "num_switches": int(idsw),
        "mostly_tracked": int(mt),
        "mostly_lost": int(ml),
    }
