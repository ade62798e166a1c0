"""Weight-converter parity vs a real torch forward (VERDICT r2 #3).

The synthetic round-trip tests can't see a systematic mapping/arithmetic
error that is mirrored in the test fixture.  This file closes that seam: a
minimal torch-side YOLOv8 built from ultralytics' exact module math
(Conv-BN-SiLU with eps=1e-3, C2f chunk/concat, SPPF chained pools, decoupled
Detect head; reference contract /root/reference/src/detection/detector.py:98-129)
with ultralytics' state-dict naming (``model.{idx}.{...}``), randomized,
exported as a state dict, converted through
``rtmodt_tpu.models.weights.convert_ultralytics_state_dict``, and the Flax
forward asserted against the torch forward on random images.

Runs whenever torch is importable (it is baked into this image); skips
cleanly otherwise.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from rtmodt_tpu.models.weights import (  # noqa: E402
    convert_ultralytics_state_dict,
    fuse_bn,
)
from rtmodt_tpu.models.yolov8 import (  # noqa: E402
    REG_MAX,
    YOLOV8_VARIANTS,
    _depth,
    _make_divisible,
    _scale_channels,
    build_model,
)

# ----------------------------------------------------------------------
# torch-side YOLOv8 — ultralytics module math, ultralytics key naming
# ----------------------------------------------------------------------


class TConv(nn.Module):
    """ultralytics Conv: Conv2d(bias=False) + BatchNorm2d(eps=1e-3) + SiLU."""

    def __init__(self, c1: int, c2: int, k: int = 1, s: int = 1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c1: int, c2: int, shortcut: bool = True, e: float = 0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 3, 1)
        self.cv2 = TConv(c_, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        return x + self.cv2(self.cv1(x)) if self.add else self.cv2(self.cv1(x))


class TC2f(nn.Module):
    def __init__(self, c1: int, c2: int, n: int = 1, shortcut: bool = False):
        super().__init__()
        self.c = int(c2 * 0.5)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1, 1)
        self.m = nn.ModuleList(
            TBottleneck(self.c, self.c, shortcut, e=1.0) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1: int, c2: int, k: int = 5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class TDFL(nn.Module):
    """Fixed arange expectation conv — present in every ultralytics ckpt."""

    def __init__(self, c1: int = REG_MAX):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(
            c1, dtype=torch.float32).view(1, c1, 1, 1)


class TDetect(nn.Module):
    """ultralytics Detect: cv2 = box branch (4*REG_MAX), cv3 = cls branch."""

    def __init__(self, nc: int, ch: tuple[int, ...]):
        super().__init__()
        c2 = max(16, ch[0] // 4, 4 * REG_MAX)
        c3 = max(ch[0], min(nc, 100))
        self.nc = nc
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * REG_MAX, 1)) for x in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(TConv(x, c3, 3), TConv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for x in ch)
        self.dfl = TDFL()

    def forward(self, feats):
        box, cls = [], []
        for i, f in enumerate(feats):
            b = self.cv2[i](f)   # (N, 4*REG_MAX, H, W)
            c = self.cv3[i](f)   # (N, nc, H, W)
            n = b.shape[0]
            # NCHW -> (N, H*W, C): same row-major anchor order as the Flax
            # head's NHWC reshape
            box.append(b.permute(0, 2, 3, 1).reshape(n, -1, 4 * REG_MAX))
            cls.append(c.permute(0, 2, 3, 1).reshape(n, -1, self.nc))
        return torch.cat(box, 1), torch.cat(cls, 1)


class TYOLOv8(nn.Module):
    """The DetectionModel graph with ultralytics layer indices so
    ``state_dict()`` keys are exactly ``model.{idx}.{...}``."""

    def __init__(self, variant: str = "yolov8n", nc: int = 80):
        super().__init__()
        depth, width, ratio = YOLOV8_VARIANTS[variant]
        ch = lambda c: _scale_channels(c, width)           # noqa: E731
        d = lambda n: _depth(n, depth)                     # noqa: E731
        c5 = _make_divisible(512 * width * ratio, 8)
        m = [None] * 23
        m[0] = TConv(3, ch(64), 3, 2)                      # stem
        m[1] = TConv(ch(64), ch(128), 3, 2)                # down1
        m[2] = TC2f(ch(128), ch(128), d(3), True)          # c2f1
        m[3] = TConv(ch(128), ch(256), 3, 2)               # down2
        m[4] = TC2f(ch(256), ch(256), d(6), True)          # c2f2 (P3 feat)
        m[5] = TConv(ch(256), ch(512), 3, 2)               # down3
        m[6] = TC2f(ch(512), ch(512), d(6), True)          # c2f3 (P4 feat)
        m[7] = TConv(ch(512), c5, 3, 2)                    # down4
        m[8] = TC2f(c5, c5, d(3), True)                    # c2f4
        m[9] = TSPPF(c5, c5, 5)                            # sppf (P5 feat)
        m[10] = nn.Identity()                              # Upsample (no params)
        m[11] = nn.Identity()                              # Concat
        m[12] = TC2f(c5 + ch(512), ch(512), d(3), False)   # neck_td4
        m[13] = nn.Identity()                              # Upsample
        m[14] = nn.Identity()                              # Concat
        m[15] = TC2f(ch(512) + ch(256), ch(256), d(3), False)  # neck_td3
        m[16] = TConv(ch(256), ch(256), 3, 2)              # neck_dn3
        m[17] = nn.Identity()                              # Concat
        m[18] = TC2f(ch(256) + ch(512), ch(512), d(3), False)  # neck_bu4
        m[19] = TConv(ch(512), ch(512), 3, 2)              # neck_dn4
        m[20] = nn.Identity()                              # Concat
        m[21] = TC2f(ch(512) + c5, c5, d(3), False)        # neck_bu5
        m[22] = TDetect(nc, (ch(256), ch(512), c5))        # head
        self.model = nn.ModuleList(m)

    def forward(self, x):
        up = lambda t: nn.functional.interpolate(  # noqa: E731
            t, scale_factor=2.0, mode="nearest")
        m = self.model
        x = m[2](m[1](m[0](x)))
        p3f = m[4](m[3](x))
        p4f = m[6](m[5](p3f))
        p5 = m[9](m[8](m[7](p4f)))
        td4 = m[12](torch.cat([up(p5), p4f], 1))
        td3 = m[15](torch.cat([up(td4), p3f], 1))
        bu4 = m[18](torch.cat([m[16](td3), td4], 1))
        bu5 = m[21](torch.cat([m[19](bu4), p5], 1))
        return m[22]([td3, bu4, bu5])


def _randomize(model: nn.Module, seed: int) -> None:
    """Random weights AND random (valid) BN running stats — eval-mode BN
    exercises the running_mean/var mapping, the seam the converter owns."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("dfl.conv.weight"):
                continue
            p.copy_(torch.empty_like(p).normal_(0.0, 0.05, generator=g))
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.empty_like(
                    mod.running_mean).normal_(0.0, 0.2, generator=g))
                mod.running_var.copy_(torch.empty_like(
                    mod.running_var).uniform_(0.5, 1.5, generator=g))


@pytest.fixture(scope="module")
def parity_pair():
    """(torch outputs, converted variables, input image) for yolov8n@128."""
    tm = TYOLOv8("yolov8n", nc=80).eval()
    _randomize(tm, seed=7)
    rng = np.random.default_rng(11)
    img = rng.uniform(0.0, 1.0, (2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        tbox, tcls = tm(torch.from_numpy(img).permute(0, 3, 1, 2).contiguous())
    state = {k: v.float().numpy() for k, v in tm.state_dict().items()}
    variables = convert_ultralytics_state_dict(state)
    return (tbox.numpy(), tcls.numpy()), variables, img


class TestTorchParity:
    def test_state_dict_fully_consumed(self, parity_pair):
        # convert_ultralytics_state_dict raised inside the fixture if any
        # tensor was dropped; reaching here proves full consumption of a
        # real torch state dict (incl. num_batches_tracked / dfl handling)
        _, variables, _ = parity_pair
        assert "params" in variables and "batch_stats" in variables

    def test_forward_matches_torch(self, parity_pair):
        import jax.numpy as jnp

        (tbox, tcls), variables, img = parity_pair
        model = build_model("yolov8n", num_classes=80, dtype=jnp.float32)
        jbox, jcls = model.apply(variables, img, train=False)
        jbox, jcls = np.asarray(jbox), np.asarray(jcls)
        assert jbox.shape == tbox.shape and jcls.shape == tcls.shape
        # fp32 end-to-end: XLA-vs-torch conv summation order costs ~1e-6
        # relative per layer; < 1e-4 on the final logits proves the mapping
        # (a single transposed kernel or swapped BN stat blows this up by
        # orders of magnitude)
        assert np.max(np.abs(jbox - tbox)) < 1e-4, (
            f"box branch max abs diff {np.max(np.abs(jbox - tbox)):.2e}")
        assert np.max(np.abs(jcls - tcls)) < 1e-4, (
            f"cls branch max abs diff {np.max(np.abs(jcls - tcls)):.2e}")

    def test_fused_bn_matches_torch(self, parity_pair):
        """BN folding (the deploy path bench.py actually measures) preserves
        the torch forward too."""
        import jax.numpy as jnp

        (tbox, tcls), variables, img = parity_pair
        fused_vars = fuse_bn(variables)
        model = build_model("yolov8n", num_classes=80, dtype=jnp.float32,
                            fused=True)
        jbox, jcls = model.apply(fused_vars, img, train=False)
        assert np.max(np.abs(np.asarray(jbox) - tbox)) < 5e-4
        assert np.max(np.abs(np.asarray(jcls) - tcls)) < 5e-4

    def test_detect_mapping_not_swapped(self, parity_pair):
        """cv2->box / cv3->cls branch assignment is load-bearing: verify the
        converted head's final-layer kernels match the torch tensors."""
        _, variables, _ = parity_pair
        tm = TYOLOv8("yolov8n", nc=80).eval()
        _randomize(tm, seed=7)
        sd = tm.state_dict()
        head = variables["params"]["head"]
        for lvl in range(3):
            want_box = sd[f"model.22.cv2.{lvl}.2.weight"].numpy()
            want_cls = sd[f"model.22.cv3.{lvl}.2.weight"].numpy()
            got_box = np.transpose(
                np.asarray(head[f"box{lvl}_2"]["kernel"]), (3, 2, 0, 1))
            got_cls = np.transpose(
                np.asarray(head[f"cls{lvl}_2"]["kernel"]), (3, 2, 0, 1))
            np.testing.assert_allclose(got_box, want_box, rtol=0, atol=0)
            np.testing.assert_allclose(got_cls, want_cls, rtol=0, atol=0)

    def test_pickled_model_pt_loads_without_package(self, tmp_path):
        """VERDICT r3 #2: a REAL ultralytics .pt pickles the whole
        ``DetectionModel`` object; loading it must not require the
        ultralytics package.  Reproduced in-sandbox: the fixture's torch
        classes are re-homed into a fake ``fake_ultralytics.*`` module for
        the save, the module is deleted before the load, so EVERY container
        class in the pickle is unimportable - exactly the failure mode of
        opening ``yolov8s.pt`` in an environment without ultralytics.  The
        tolerant loader must still recover the identical tensor tree."""
        import sys
        import types

        from rtmodt_tpu.models.weights import load_ultralytics_pt

        fixture_classes = [TConv, TBottleneck, TC2f, TSPPF, TDFL, TDetect,
                           TYOLOv8]
        saved_homes = [(c, c.__module__, c.__qualname__)
                       for c in fixture_classes]
        fake_name = "fake_ultralytics.nn.tasks"
        mod = types.ModuleType(fake_name)
        # pickle's save-time lookup imports every parent package level
        parents = {n: types.ModuleType(n)
                   for n in ("fake_ultralytics", "fake_ultralytics.nn")}
        parents["fake_ultralytics"].nn = parents["fake_ultralytics.nn"]
        parents["fake_ultralytics.nn"].tasks = mod

        class DetectionModel(nn.Module):
            pass

        try:
            for c in fixture_classes + [DetectionModel]:
                c.__module__ = fake_name
                c.__qualname__ = c.__name__
                setattr(mod, c.__name__, c)
            sys.modules.update(parents)
            sys.modules[fake_name] = mod

            wrapper = DetectionModel()
            tm = TYOLOv8("yolov8n", nc=80).eval()
            _randomize(tm, seed=13)
            wrapper.model = tm.model    # state keys: model.{idx}.{...}
            want = {k: v.float().numpy()
                    for k, v in wrapper.state_dict().items()}
            pt = tmp_path / "yolov8n.pt"
            # the real artifact shape: pickled model object + train metadata
            torch.save({"model": wrapper, "epoch": 99,
                        "train_args": {"imgsz": 640}}, str(pt))
        finally:
            sys.modules.pop(fake_name, None)
            for n in parents:
                sys.modules.pop(n, None)
            for c, m, q in saved_homes:
                c.__module__, c.__qualname__ = m, q
            DetectionModel.__module__ = __name__

        # every fake_ultralytics class is now unimportable, as ultralytics
        # would be in production
        with pytest.raises(ImportError):
            __import__(fake_name)

        variables = load_ultralytics_pt(str(pt))
        ref = convert_ultralytics_state_dict(want)
        import jax

        ref_leaves = jax.tree.leaves_with_path(ref)
        got_flat = dict(jax.tree.leaves_with_path(variables))
        assert len(ref_leaves) == len(got_flat)
        for path, leaf in ref_leaves:
            np.testing.assert_array_equal(np.asarray(got_flat[path]),
                                          np.asarray(leaf), err_msg=str(path))

    def test_plain_state_dict_pt_still_loads(self, tmp_path):
        """The simple artifact (torch.save of a raw state dict) stays on the
        fast weights_only=True path."""
        from rtmodt_tpu.models.weights import load_ultralytics_pt

        tm = TYOLOv8("yolov8n", nc=80).eval()
        _randomize(tm, seed=17)
        pt = tmp_path / "sd.pt"
        torch.save(tm.state_dict(), str(pt))
        variables = load_ultralytics_pt(str(pt))
        assert "params" in variables and "batch_stats" in variables

    def test_retrained_dfl_rejected(self):
        """A checkpoint whose DFL bins are not arange must be refused, not
        silently mis-decoded (weights.py _UNMAPPED_OK contract)."""
        tm = TYOLOv8("yolov8n", nc=80)
        state = {k: v.float().numpy() for k, v in tm.state_dict().items()}
        state["model.22.dfl.conv.weight"] = np.linspace(
            0, 2, REG_MAX, dtype=np.float32).reshape(1, REG_MAX, 1, 1)
        with pytest.raises(ValueError, match="DFL"):
            convert_ultralytics_state_dict(state)
