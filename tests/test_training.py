"""Training-stack tests: TAL assigner invariants, loss sanity, sharded
train step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_setup():
    from rtmodt_tpu.models.yolov8 import build_model

    model = build_model("yolov8n", num_classes=4, dtype=jnp.float32)
    input_size = 64
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, input_size, input_size, 3)), train=False)
    return model, variables, input_size


def synth_batch(b=2, m=4, s=64, nc=4, seed=0):
    from rtmodt_tpu.training.train_step import Batch

    rng = np.random.default_rng(seed)
    images = rng.random((b, s, s, 3), np.float32)
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        n = rng.integers(1, m + 1)
        for j in range(n):
            x1, y1 = rng.uniform(0, s - 20, 2)
            w, h = rng.uniform(8, 20, 2)
            boxes[i, j] = (x1, y1, min(x1 + w, s), min(y1 + h, s))
            labels[i, j] = rng.integers(0, nc)
            mask[i, j] = True
    return Batch(jnp.asarray(images), jnp.asarray(boxes),
                 jnp.asarray(labels), jnp.asarray(mask))


class TestAssigner:
    def test_assigns_inside_anchors_only(self):
        from rtmodt_tpu.models.yolov8 import make_anchors
        from rtmodt_tpu.training.assigner import assign

        s = 64
        anchors, _ = make_anchors(s)
        a = anchors.shape[0]
        nc = 4
        gt = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])         # one box
        labels = jnp.asarray([[2]], dtype=jnp.int32)
        mask = jnp.asarray([[True]])
        scores = jnp.full((1, a, nc), 0.5)
        boxes = jnp.tile(gt[:, 0:1], (1, a, 1))              # perfect iou preds
        res = assign(scores, boxes, anchors, gt, labels, mask)
        fg = np.asarray(res.fg_mask[0])
        assert fg.any()
        inside = (np.asarray(anchors)[:, 0] >= 8) & (np.asarray(anchors)[:, 0] < 40) \
            & (np.asarray(anchors)[:, 1] >= 8) & (np.asarray(anchors)[:, 1] < 40)
        assert not (fg & ~inside).any()
        ts = np.asarray(res.target_scores[0])
        assert (ts[fg, 2] > 0).all()           # correct class channel
        assert ts[:, [0, 1, 3]].sum() == 0

    def test_empty_gt_no_fg(self):
        from rtmodt_tpu.models.yolov8 import make_anchors
        from rtmodt_tpu.training.assigner import assign

        anchors, _ = make_anchors(64)
        a = anchors.shape[0]
        res = assign(jnp.full((1, a, 4), 0.5), jnp.zeros((1, a, 4)), anchors,
                     jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32),
                     jnp.zeros((1, 2), bool))
        assert not bool(np.asarray(res.fg_mask).any())

    def test_topk_cap(self):
        from rtmodt_tpu.models.yolov8 import make_anchors
        from rtmodt_tpu.training.assigner import assign

        anchors, _ = make_anchors(64)
        a = anchors.shape[0]
        gt = jnp.asarray([[[0.0, 0.0, 64.0, 64.0]]])  # covers every anchor
        res = assign(jnp.full((1, a, 4), 0.9),
                     jnp.tile(gt[:, 0:1], (1, a, 1)), anchors, gt,
                     jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool),
                     topk=10)
        assert int(np.asarray(res.fg_mask).sum()) <= 10


class TestLoss:
    def test_loss_finite_and_positive(self, tiny_setup):
        from rtmodt_tpu.training.loss import yolo_loss

        model, variables, s = tiny_setup
        batch = synth_batch(s=s)
        box_dist, cls_logits = model.apply(variables, batch.images, train=False)
        lb = yolo_loss(box_dist, cls_logits, batch.gt_boxes, batch.gt_labels,
                       batch.gt_mask, s)
        assert np.isfinite(float(lb.total))
        assert float(lb.total) > 0
        assert int(lb.num_fg) > 0

    def test_empty_gt_loss_finite(self, tiny_setup):
        from rtmodt_tpu.training.loss import yolo_loss
        from rtmodt_tpu.training.train_step import Batch

        model, variables, s = tiny_setup
        b = synth_batch(s=s)
        empty = Batch(b.images, jnp.zeros_like(b.gt_boxes),
                      jnp.zeros_like(b.gt_labels), jnp.zeros_like(b.gt_mask))
        box_dist, cls_logits = model.apply(variables, empty.images, train=False)
        lb = yolo_loss(box_dist, cls_logits, empty.gt_boxes, empty.gt_labels,
                       empty.gt_mask, s)
        assert np.isfinite(float(lb.total))
        assert int(lb.num_fg) == 0


class TestTrainStep:
    def test_loss_decreases(self, tiny_setup):
        from rtmodt_tpu.training.train_step import (
            create_train_state, make_optimizer, make_schedule, train_step)
        from functools import partial

        model, variables, s = tiny_setup
        tx = make_optimizer(make_schedule(1e-3, 0.01, 100, 5))
        state = create_train_state(model, tx, s, jax.random.PRNGKey(0), variables)
        step = jax.jit(partial(train_step, model=model, tx=tx, input_size=s))
        batch = synth_batch(s=s)
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8
        assert np.isfinite(losses).all()

    def test_sharded_train_step_8dev(self, tiny_setup):
        from rtmodt_tpu.parallel.mesh import create_mesh, replicate
        from rtmodt_tpu.training.train_step import (
            create_train_state, make_optimizer, make_schedule,
            make_sharded_train_step)

        model, variables, s = tiny_setup
        n = jax.device_count()
        assert n == 8, "conftest must provide 8 virtual devices"
        mesh = create_mesh(n)
        tx = make_optimizer(make_schedule(1e-3, 0.01, 100, 5))
        state = create_train_state(model, tx, s, jax.random.PRNGKey(0), variables)
        state = replicate(state, mesh)
        step, put_batch = make_sharded_train_step(model, tx, s, mesh)
        batch = put_batch(synth_batch(b=8, s=s))
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params remain replicated; grads were all-reduced
        state, m2 = step(state, batch)
        assert float(m2["loss"]) < float(metrics["loss"]) * 1.5


class _FixedGainRng:
    """rng stub whose uniform() makes ``1 + uniform(-1,1,3)*g`` hit exact
    target gains; every other draw defers to a real generator."""

    def __init__(self, gains):
        self._gains = np.asarray(gains, np.float64)
        self._real = np.random.default_rng(0)

    def uniform(self, lo, hi, size=None):
        if size == 3:
            from rtmodt_tpu.training.data import AugConfig

            a = AugConfig()
            return (self._gains - 1.0) / np.asarray(
                [a.hsv_h, a.hsv_s, a.hsv_v])
        return self._real.uniform(lo, hi, size)

    def __getattr__(self, name):
        return getattr(self._real, name)


class TestDataAugmentation:
    """YoloDataset augmentation invariants (mosaic/mixup/copy_paste/affine -
    the reference's ultralytics aug surface, training.yaml:28-41)."""

    @pytest.fixture(scope="class")
    def ds_root(self, tmp_path_factory):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.download_dataset import make_synthetic

        root = str(tmp_path_factory.mktemp("data") / "synth")
        make_synthetic(root, n_train=6, n_val=2, h=96, w=128, n_objects=3, seed=0)
        return root

    def _ds(self, root, **aug_kw):
        from rtmodt_tpu.training.data import AugConfig, YoloDataset

        return YoloDataset(root, "train", input_size=96, max_boxes=32,
                           augment=True, aug=AugConfig(**aug_kw), seed=1)

    def test_sample_invariants_all_augs_on(self, ds_root):
        """Boxes stay in-bounds, non-degenerate, labels aligned - across many
        samples with every augmentation forced on."""
        ds = self._ds(ds_root, mosaic=1.0, mixup=1.0, copy_paste=1.0,
                      fliplr=0.5, flipud=0.5)
        s = 96
        for _ in range(20):
            img, boxes, labels = ds.sample()
            assert img.shape == (s, s, 3) and img.dtype == np.uint8
            assert len(boxes) == len(labels)
            if len(boxes):
                assert boxes.min() >= 0 and boxes.max() <= s
                assert np.all(boxes[:, 2] > boxes[:, 0])
                assert np.all(boxes[:, 3] > boxes[:, 1])

    def test_mixup_blends_two_scenes(self, ds_root):
        """With mixup forced, GT is the union of two mosaics - expect more
        boxes on average than without."""
        n_mix = np.mean([len(self._ds(ds_root, mixup=1.0).sample()[1])
                         for _ in range(8)])
        n_plain = np.mean([len(self._ds(ds_root, mixup=0.0).sample()[1])
                           for _ in range(8)])
        assert n_mix > n_plain

    def test_copy_paste_adds_objects(self, ds_root):
        """copy_paste on an un-warped sample appends pasted GT boxes."""
        ds = self._ds(ds_root)
        img, boxes, labels = ds._load_raw(0)
        img, boxes = ds._letterbox_sample(img, boxes)
        n0 = len(boxes)
        img2, boxes2, labels2 = ds._copy_paste(
            img.copy(), boxes, np.zeros(n0, np.int32))
        assert len(boxes2) >= n0
        assert len(boxes2) == len(labels2)

    def test_affine_identity_when_disabled(self, ds_root):
        """degrees=scale=shear=translate=0 -> affine is the identity."""
        ds = self._ds(ds_root, degrees=0.0, scale=0.0, shear=0.0, translate=0.0)
        img, boxes, labels = ds._load_raw(0)
        img, boxes = ds._letterbox_sample(img, boxes)
        img2, boxes2, _ = ds._random_affine(
            img.copy(), boxes.copy(), np.zeros(len(boxes), np.int32))
        np.testing.assert_allclose(boxes2, boxes, atol=1e-3)
        assert np.abs(img2.astype(int) - img.astype(int)).mean() < 1.0

    def test_batch_shapes(self, ds_root):
        ds = self._ds(ds_root, mixup=1.0, copy_paste=1.0)
        b = ds.make_batch(2)
        assert b.images.shape == (2, 96, 96, 3)
        assert b.gt_boxes.shape == (2, 32, 4)
        assert b.gt_mask.dtype == bool

    def test_decode_cache_transparent(self, ds_root):
        """The RAM decode cache must be behaviorally invisible: identical
        raw loads, and heavy augmented sampling must never write through
        into the cached source arrays."""
        from rtmodt_tpu.training.data import AugConfig, YoloDataset

        kw = dict(input_size=96, max_boxes=32, augment=True,
                  aug=AugConfig(mosaic=1.0, mixup=1.0, copy_paste=1.0,
                                fliplr=0.5, flipud=0.5))
        cold = YoloDataset(ds_root, "train", cache_images=False, seed=3, **kw)
        hot = YoloDataset(ds_root, "train", cache_images=True, seed=3, **kw)
        assert hot._cache is not None and cold._cache is None
        for i in range(len(hot)):
            ic, bc, lc = cold._load_raw(i)
            ih, bh, lh = hot._load_raw(i)
            np.testing.assert_array_equal(ic, ih)
            np.testing.assert_array_equal(bc, bh)
            np.testing.assert_array_equal(lc, lh)
        # snapshot the cache, hammer the full augmentation surface, recheck
        snaps = [(img.copy(), bx.copy(), lb.copy())
                 for img, bx, lb in hot._cache]
        for _ in range(12):
            hot.sample()
        hot.make_batch(2)
        for (i0, b0, l0), (i1, b1, l1) in zip(snaps, hot._cache):
            np.testing.assert_array_equal(i0, i1)
            np.testing.assert_array_equal(b0, b1)
            np.testing.assert_array_equal(l0, l1)

    def test_hsv_lut_matches_float_reference(self, ds_root):
        """LUT-based HSV jitter must equal the full-image float32 map
        (same gains) bit-for-bit — it is a pure per-value function."""
        import cv2

        ds = self._ds(ds_root)
        img, _, _ = ds._load_raw(0)
        rng = np.random.default_rng(7)
        for _ in range(4):
            gains = 1.0 + rng.uniform(-1, 1, 3) * [ds.aug.hsv_h,
                                                   ds.aug.hsv_s, ds.aug.hsv_v]
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
            hsv[..., 0] = (hsv[..., 0] * gains[0]) % 180
            hsv[..., 1] = np.clip(hsv[..., 1] * gains[1], 0, 255)
            hsv[..., 2] = np.clip(hsv[..., 2] * gains[2], 0, 255)
            ref = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
            ds.rng = _FixedGainRng(gains)
            np.testing.assert_array_equal(ds._hsv(img), ref)
