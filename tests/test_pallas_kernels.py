"""Pallas kernel correctness tests (interpret mode on the CPU platform)."""

import numpy as np
import pytest

from tests.conftest import random_boxes


def np_greedy_nms_keep(boxes, scores, t):
    keep = np.ones(len(boxes), bool)
    for i in range(len(boxes)):
        if not keep[i] or scores[i] <= 0:
            continue
        for j in range(i + 1, len(boxes)):
            if not keep[j]:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ua = ((boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                  + (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1]) - inter)
            if inter / (ua + 1e-7) > t:
                keep[j] = False
    return keep & (scores > 0)


class TestPallasNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_sequential_oracle(self, seed):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.pallas.nms_kernel import pallas_greedy_suppress

        rng = np.random.default_rng(seed)
        n = 64
        boxes = random_boxes(rng, n, w=300, h=300, min_size=40, max_size=150)
        scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
        scores[-8:] = 0.0  # padding slots
        got = np.asarray(pallas_greedy_suppress(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, interpret=True))
        want = np_greedy_nms_keep(boxes, scores, 0.5)
        np.testing.assert_array_equal(got, want)

    def test_matches_xla_fixpoint(self, rng):
        import jax.numpy as jnp
        from rtmodt_tpu.ops.nms import _greedy_suppress
        from rtmodt_tpu.ops.iou import pairwise_iou
        from rtmodt_tpu.ops.pallas.nms_kernel import pallas_greedy_suppress

        n = 48
        boxes = random_boxes(rng, n, w=200, h=200, min_size=50, max_size=120)
        scores = np.sort(rng.uniform(0.1, 1, n).astype(np.float32))[::-1].copy()
        a = np.asarray(pallas_greedy_suppress(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, interpret=True))
        iou = pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes))
        b = np.asarray(_greedy_suppress(iou, jnp.asarray(scores), 0.45)[0])
        np.testing.assert_array_equal(a, b & (scores > 0))
