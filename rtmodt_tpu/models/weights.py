"""Weight I/O: native .npz / orbax checkpoints + ultralytics .pt conversion.

The reference loads ultralytics checkpoints directly (``src/detection/
detector.py:82-90``).  This module converts those torch checkpoints into the
Flax parameter tree (name-mapped, conv kernels transposed OIHW -> HWIO, BN
running stats -> batch_stats) so pretrained YOLOv8 weights drop into the TPU
model.  It also defines the framework's own formats: a flat ``.npz`` and
orbax checkpoint directories.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from rtmodt_tpu.utils.logging import logger

# ultralytics DetectionModel layer index -> our flax module name
_LAYER_MAP = {
    0: "stem", 1: "down1", 2: "c2f1", 3: "down2", 4: "c2f2", 5: "down3",
    6: "c2f3", 7: "down4", 8: "c2f4", 9: "sppf",
    12: "neck_td4", 15: "neck_td3", 16: "neck_dn3", 18: "neck_bu4",
    19: "neck_dn4", 21: "neck_bu5", 22: "head",
}


def _convert_convbn(prefix_out: tuple[str, ...], torch_params: dict[str, np.ndarray],
                    torch_prefix: str, params: dict, stats: dict) -> None:
    """One Conv+BN block: ``{torch_prefix}.conv.weight`` + ``{torch_prefix}.bn.*``."""
    w = torch_params[f"{torch_prefix}.conv.weight"]            # (O, I, kh, kw)
    params[prefix_out + ("conv", "kernel")] = np.transpose(w, (2, 3, 1, 0))
    params[prefix_out + ("bn", "scale")] = torch_params[f"{torch_prefix}.bn.weight"]
    params[prefix_out + ("bn", "bias")] = torch_params[f"{torch_prefix}.bn.bias"]
    stats[prefix_out + ("bn", "mean")] = torch_params[f"{torch_prefix}.bn.running_mean"]
    stats[prefix_out + ("bn", "var")] = torch_params[f"{torch_prefix}.bn.running_var"]


def _convert_c2f(name: str, tp: dict[str, np.ndarray], torch_prefix: str,
                 params: dict, stats: dict) -> None:
    _convert_convbn((name, "cv1"), tp, f"{torch_prefix}.cv1", params, stats)
    _convert_convbn((name, "cv2"), tp, f"{torch_prefix}.cv2", params, stats)
    i = 0
    while f"{torch_prefix}.m.{i}.cv1.conv.weight" in tp:
        _convert_convbn((name, f"m{i}", "cv1"), tp, f"{torch_prefix}.m.{i}.cv1", params, stats)
        _convert_convbn((name, f"m{i}", "cv2"), tp, f"{torch_prefix}.m.{i}.cv2", params, stats)
        i += 1


class _TrackingDict(dict):
    """Records which checkpoint keys the converter actually read, so
    anything left over fails loudly instead of silently vanishing."""

    def __init__(self, d: dict) -> None:
        super().__init__(d)
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


# Checkpoint tensors that are intentionally NOT mapped into the Flax tree.
# Each entry must justify itself:
#  * num_batches_tracked: torch-BN bookkeeping, no inference meaning;
#  * model.22.dfl.conv.weight: the DFL "conv" is the fixed expectation over
#    bins 0..REG_MAX-1 (arange, non-trainable in ultralytics); our decode
#    computes it in closed form (models/yolov8.py DFL decode), and the
#    VALUE is verified against arange below - a checkpoint with retrained
#    bins would be rejected, not silently mis-decoded.
_UNMAPPED_OK = re.compile(
    r"(\.num_batches_tracked$)|(^model\.22\.dfl\.conv\.weight$)")


def convert_ultralytics_state_dict(state: dict[str, np.ndarray]) -> dict[str, Any]:
    """Map an ultralytics YOLOv8 float state dict to the Flax variables tree.

    Every tensor in ``state`` must be consumed by the mapping or matched by
    ``_UNMAPPED_OK``; anything else raises (a renamed/extra trainable tensor
    must never vanish silently)."""
    params: dict[tuple[str, ...], np.ndarray] = {}
    stats: dict[tuple[str, ...], np.ndarray] = {}
    tp = _TrackingDict(state)

    dfl = state.get("model.22.dfl.conv.weight")
    if dfl is not None:
        bins = np.arange(dfl.size, dtype=np.float32)
        if not np.allclose(np.asarray(dfl).reshape(-1), bins):
            raise ValueError(
                "model.22.dfl.conv.weight is not the fixed arange(REG_MAX) "
                "expectation; this checkpoint's DFL decode differs from the "
                "closed form this framework computes")

    for idx, name in _LAYER_MAP.items():
        if name == "head":
            continue
        pre = f"model.{idx}"
        if f"{pre}.conv.weight" in tp:                       # plain ConvBN
            _convert_convbn((name,), tp, pre, params, stats)
        elif f"{pre}.cv1.conv.weight" in tp and f"{pre}.m.0.cv1.conv.weight" in tp:
            _convert_c2f(name, tp, pre, params, stats)       # C2f
        elif f"{pre}.cv1.conv.weight" in tp:                  # SPPF
            _convert_convbn((name, "cv1"), tp, f"{pre}.cv1", params, stats)
            _convert_convbn((name, "cv2"), tp, f"{pre}.cv2", params, stats)
        else:
            raise KeyError(f"cannot map ultralytics layer model.{idx} -> {name}")

    # Detect head: cv2 = box branch (4*REG_MAX), cv3 = cls branch
    for lvl in range(3):
        for branch, ours in (("cv2", "box"), ("cv3", "cls")):
            for j in range(2):
                _convert_convbn(("head", f"{ours}{lvl}_{j}"), tp,
                                f"model.22.{branch}.{lvl}.{j}", params, stats)
            w = tp[f"model.22.{branch}.{lvl}.2.weight"]
            b = tp[f"model.22.{branch}.{lvl}.2.bias"]
            params[("head", f"{ours}{lvl}_2", "kernel")] = np.transpose(w, (2, 3, 1, 0))
            params[("head", f"{ours}{lvl}_2", "bias")] = b

    leftover = sorted(k for k in state
                      if k not in tp.consumed and not _UNMAPPED_OK.search(k))
    if leftover:
        raise ValueError(
            f"{len(leftover)} checkpoint tensor(s) not consumed by the "
            f"ultralytics->Flax mapping (first 10: {leftover[:10]}); "
            "refusing to silently drop weights - extend _LAYER_MAP / "
            "_UNMAPPED_OK for this architecture variant")

    return {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }


class _StubBase:
    """Placeholder for a class the checkpoint pickled but this environment
    cannot import (a real ``yolov8s.pt`` pickles the full
    ``ultralytics.nn.tasks.DetectionModel`` object - reference
    ``src/detection/detector.py:82-90`` / ``web/server.py:68-77`` - and this
    framework exists to not depend on the ultralytics package).  Keeps
    whatever state the pickle hands it so the module tree stays walkable."""

    def __init__(self, *args, **kwargs):
        self._stub_args = (args, kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_stub_state"] = state

    def __call__(self, *args, **kwargs):
        # some reducers call a pickled instance as the reconstructor
        return self


_STUB_CACHE: dict[tuple[str, str], type] = {}


def _tolerant_torch_load(path: str) -> Any:
    """``torch.load`` that survives unimportable classes in the pickle.

    Classes whose module imports (torch.*, numpy.*) resolve normally -
    their tensors rebuild for real; anything unimportable (``ultralytics.*``
    containers) becomes a stub that just holds its pickled ``__dict__``.
    """
    import pickle
    import types

    import torch

    class _TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                key = (module, name)
                if key not in _STUB_CACHE:
                    logger.debug(f"stubbing unimportable class {module}.{name}")
                    _STUB_CACHE[key] = type(
                        str(name), (_StubBase,), {"__module__": str(module)})
                return _STUB_CACHE[key]

    shim = types.ModuleType("rtmodt_tolerant_pickle")
    shim.Unpickler = _TolerantUnpickler
    shim.load = pickle.load
    shim.loads = pickle.loads
    return torch.load(path, map_location="cpu", pickle_module=shim,
                      weights_only=False)


def _walk_module_state(obj: Any, prefix: str, out: dict) -> None:
    """Recover ``state_dict()`` naming from a (possibly stubbed) module tree:
    every ``nn.Module`` - and every stub of one - keeps ``_parameters`` /
    ``_buffers`` / ``_modules`` dicts in ``__dict__``."""
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for k, v in (d.get("_parameters") or {}).items():
        if v is not None:
            out[prefix + k] = v
    for k, v in (d.get("_buffers") or {}).items():
        if v is not None:
            out[prefix + k] = v
    for k, v in (d.get("_modules") or {}).items():
        if v is not None:
            _walk_module_state(v, f"{prefix}{k}.", out)


def load_ultralytics_pt(path: str) -> dict[str, Any]:
    """Read an ultralytics .pt checkpoint with torch (CPU) and convert.

    Three paths, in order: plain tensor checkpoints load with
    ``weights_only=True``; pickled-model checkpoints unpickle tolerantly
    (unimportable ``ultralytics.*`` containers become stubs) and the state
    dict is either taken from a real module or recovered by walking the
    stubbed ``_parameters/_buffers/_modules`` tree with torch's exact
    dotted naming."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = _tolerant_torch_load(path)
    model = ckpt if not isinstance(ckpt, dict) else (
        ckpt.get("model") if ckpt.get("model") is not None
        else ckpt.get("ema", ckpt))
    if isinstance(model, dict):
        sd = model
    elif isinstance(model, torch.nn.Module):
        sd = model.state_dict()
    else:
        sd = {}
        _walk_module_state(model, "", sd)
        if not sd:
            raise TypeError(f"unsupported checkpoint structure in {path}")
    # hand EVERY tensor to the converter - it asserts full consumption, so
    # unexpected keys (renamed layers, EMA trees, adapters) fail loudly
    # instead of being filtered away here
    state = {k: v.detach().float().numpy() for k, v in sd.items()
             if isinstance(v, torch.Tensor)}
    logger.info(f"converted {len(state)} tensors from {path}")
    return convert_ultralytics_state_dict(state)


def fuse_bn(variables: dict[str, Any], eps: float = 1e-3) -> dict[str, Any]:
    """Fold BatchNorm into conv weights -> params for a ``fused=True`` model.

    The deploy-time graph optimization analogous to the reference's TensorRT
    engine build (detector prefers a prebuilt engine, reference
    detector.py:82-90): per output channel,
    ``k' = k * scale / sqrt(var + eps)``, ``b' = bias - mean * scale /
    sqrt(var + eps)``.  Inference-only (training needs live BN stats).
    """
    params = traverse_util.flatten_dict(variables["params"])
    stats = traverse_util.flatten_dict(variables.get("batch_stats", {}))
    out: dict[tuple[str, ...], Any] = {}
    for key, kernel in params.items():
        if key[-2:] == ("conv", "kernel"):
            prefix = key[:-2]
            bn_scale = params.get(prefix + ("bn", "scale"))
            if bn_scale is not None:
                mean = stats[prefix + ("bn", "mean")]
                var = stats[prefix + ("bn", "var")]
                bias = params[prefix + ("bn", "bias")]
                factor = bn_scale / np.sqrt(np.asarray(var) + eps)
                out[prefix + ("conv", "kernel")] = np.asarray(kernel) * factor
                out[prefix + ("conv", "bias")] = np.asarray(bias) - np.asarray(mean) * factor
                continue
        if key[-2:-1] != ("bn",):
            out[key] = kernel
    return {"params": traverse_util.unflatten_dict(out)}


def tree_is_fused(variables: dict[str, Any]) -> bool:
    """True if a checkpoint tree is already BN-folded (e.g. QAT output):
    conv biases present and no ``bn`` submodules / batch_stats."""
    flat = traverse_util.flatten_dict(variables)
    has_bn = any("bn" in k for k in flat)
    has_conv_bias = any(k[-2:] == ("conv", "bias") for k in flat)
    return has_conv_bias and not has_bn and "batch_stats" not in variables


def save_npz(variables: dict[str, Any], path: str) -> None:
    flat = traverse_util.flatten_dict(variables, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_npz(path: str) -> dict[str, Any]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return traverse_util.unflatten_dict(flat, sep="/")


def save_orbax(variables: dict[str, Any], path: str) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), jax.device_get(variables), force=True)


def load_orbax(path: str) -> dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def load_params(path: str, model: Any = None, input_size: int = 640) -> dict[str, Any]:
    """Load weights from any supported format, validated against the model."""
    if path.endswith(".pt") or path.endswith(".pth"):
        variables = load_ultralytics_pt(path)
    elif path.endswith(".npz"):
        variables = load_npz(path)
    elif os.path.isdir(path):
        variables = load_orbax(path)
    else:
        raise ValueError(f"unrecognized weights format: {path}")

    variables = jax.tree.map(jnp.asarray, variables)
    if model is not None:
        validate_tree(variables, model, input_size)
    return variables


def validate_tree(variables: dict[str, Any], model: Any, input_size: int = 640) -> None:
    """Raise with the missing/extra/shape details if ``variables`` does not
    match ``model``'s parameter structure."""
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, input_size, input_size, 3), jnp.float32),
                           train=False)
    )
    ref_flat = traverse_util.flatten_dict(ref, sep="/")
    got_flat = traverse_util.flatten_dict(variables, sep="/")
    missing = set(ref_flat) - set(got_flat)
    extra = set(got_flat) - set(ref_flat)
    if missing or extra:
        raise ValueError(f"weight tree mismatch: missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]} "
                         f"({len(missing)} missing / {len(extra)} extra)")
    for k, v in got_flat.items():
        if tuple(v.shape) != tuple(ref_flat[k].shape):
            raise ValueError(f"shape mismatch at {k}: {v.shape} vs {ref_flat[k].shape}")
