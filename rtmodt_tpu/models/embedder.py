"""Appearance embedder for DeepSORT-style re-identification.

The reference declares ``tracking.deepsort.embedder: weights/osnet_x0_25.onnx``
(``config/default.yaml:60``) but never runs it - its DeepSORT dispatch raises
NotImplementedError (``src/tracking/tracker.py:212-214``).  This is a working
TPU-native equivalent: a compact strided-conv network over ROI patches that
produces L2-normalized embeddings, small enough to ride along inside the
jitted detect+track step (the patches never leave the device).

Weights: ``DeepSortConfig.embedder`` may point at a ``.npz`` of flax params
(e.g. distilled from an OSNet checkpoint offline); without one, a
deterministic random init is used - random conv projections of color/texture
statistics still separate visually distinct objects, and all tests and the
synthetic self-test run in this mode.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class AppearanceEmbedder(nn.Module):
    """(D, h, w, 3) uint8/float patches -> (D, embed_dim) unit vectors."""

    embed_dim: int = 128
    width: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32) / 255.0 - 0.5
        for mult in (1, 2, 4):
            x = nn.Conv(self.width * mult, (3, 3), strides=(2, 2), name=f"down{mult}")(x)
            x = nn.silu(x)
            x = nn.Conv(self.width * mult, (3, 3), name=f"mix{mult}")(x)
            x = nn.silu(x)
        x = jnp.mean(x, axis=(1, 2))                       # global average pool
        x = nn.Dense(self.embed_dim, name="proj")(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


def init_embedder(crop_hw: tuple[int, int], embed_dim: int = 128,
                  weights_path: str = "", width: int = 32):
    """Build the module + params. Deterministic (PRNGKey 0) when no weights."""
    model = AppearanceEmbedder(embed_dim=embed_dim, width=width)
    dummy = jnp.zeros((1, crop_hw[0], crop_hw[1], 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)
    if weights_path:
        loaded = dict(np.load(weights_path, allow_pickle=False))
        flat = _flatten(params)
        missing = set(flat) - set(loaded)
        if missing:
            raise ValueError(f"embedder weights {weights_path} missing keys: {sorted(missing)}")
        bad = [k for k in flat if tuple(loaded[k].shape) != tuple(flat[k].shape)]
        if bad:
            raise ValueError(
                f"embedder weights {weights_path} shape mismatch for {bad[:3]} "
                f"(checkpoint was trained with different embed_dim/width)")
        params = _unflatten({k: jnp.asarray(loaded[k]) for k in flat})
    return model, params


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
