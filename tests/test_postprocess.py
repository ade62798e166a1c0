"""Offline track-gap interpolation (tracking/postprocess.py)."""

import numpy as np
import pytest

from rtmodt_tpu.tracking.postprocess import (interpolate_mot_rows,
                                             load_mot_rows, write_mot_rows)


class TestInterpolation:
    def test_linear_fill(self):
        rows = [(1, 7, 0.0, 0.0, 10.0, 10.0, 0.9),
                (5, 7, 40.0, 8.0, 10.0, 10.0, 0.7)]
        out = interpolate_mot_rows(rows, max_gap=20)
        assert len(out) == 5
        mid = [r for r in out if r[0] == 3][0]
        assert mid[1] == 7
        np.testing.assert_allclose(mid[2:6], (20.0, 4.0, 10.0, 10.0))
        assert mid[6] == pytest.approx(0.7)   # min endpoint confidence

    def test_gap_limits(self):
        # consecutive frames: nothing to fill
        rows = [(1, 1, 0, 0, 5, 5, 1.0), (2, 1, 1, 0, 5, 5, 1.0)]
        assert len(interpolate_mot_rows(rows)) == 2
        # gap beyond max_gap stays open
        rows = [(1, 1, 0, 0, 5, 5, 1.0), (30, 1, 1, 0, 5, 5, 1.0)]
        assert len(interpolate_mot_rows(rows, max_gap=20)) == 2
        # ids are independent: no cross-id interpolation
        rows = [(1, 1, 0, 0, 5, 5, 1.0), (5, 2, 1, 0, 5, 5, 1.0)]
        assert len(interpolate_mot_rows(rows)) == 2

    def test_roundtrip_and_sorted(self, tmp_path):
        p = str(tmp_path / "t.txt")
        rows = [(3, 2, 1.0, 2.0, 3.0, 4.0, 0.5), (1, 9, 0.0, 0.0, 5.0, 5.0, 1.0)]
        write_mot_rows(p, interpolate_mot_rows(rows))
        back = load_mot_rows(p)
        assert back[0][0] == 1 and back[1][0] == 3
        np.testing.assert_allclose(back[1][2:6], (1, 2, 3, 4))

    def test_improves_mota_on_gapped_track(self):
        """A 3-frame occlusion dropout: interpolation recovers the missed
        frames, lifting MOTA (the reason the trick exists)."""
        from collections import defaultdict

        from rtmodt_tpu.evaluation.mot_eval import evaluate_mot

        def to_frames(rows):
            d = defaultdict(dict)
            for fr, tid, x, y, w, h, *_ in rows:
                d[fr][tid] = np.array([x, y, w, h], np.float64)
            return dict(d)

        gt = [(fr, 1, 10.0 * fr, 0.0, 20.0, 40.0, 1.0) for fr in range(1, 11)]
        pred = [r for r in gt if r[0] not in (4, 5, 6)]
        before = evaluate_mot(to_frames(gt), to_frames(pred))
        after = evaluate_mot(to_frames(gt),
                             to_frames(interpolate_mot_rows(pred)))
        assert before["mota"] == pytest.approx(0.7)
        assert after["mota"] == pytest.approx(1.0)
        assert after["hota"] > before["hota"]
