#!/usr/bin/env python
"""Train the DeepSORT appearance embedder on synthetic re-identification.

The reference config points at an OSNet checkpoint it never loads (its
DeepSORT raises NotImplementedError, reference ``src/tracking/tracker.py:
212-214``).  This framework's DeepSORT works; this tool gives its embedder
REAL discriminative weights without any external data: supervised
contrastive (NT-Xent) training over persistent synthetic identities
(``utils/synthetic.py::reid_patch`` - shape/color/texture identities under
pose, lighting, background, noise, and occlusion augmentation).

Metrics: rank-1 retrieval accuracy on HELD-OUT identities (nearest-neighbor
in embedding space) + the positive/negative cosine margin.  Weights land in
the ``.npz`` layout ``models/embedder.py::init_embedder`` loads
(``tracking.deepsort.embedder: checkpoints/embedder.npz``).

Usage:
  python tools/train_embedder.py [--steps 1500] [--out checkpoints/embedder.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def batch_views(ids: np.ndarray, views: np.ndarray, hw, seed: int) -> np.ndarray:
    from rtmodt_tpu.utils.synthetic import reid_patch

    return np.stack([reid_patch(int(i), int(v), hw, seed)
                     for i, v in zip(ids, views)])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--identities", type=int, default=512)
    ap.add_argument("--batch-ids", type=int, default=32)   # P identities
    ap.add_argument("--views", type=int, default=2)        # K views each
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--temp", type=float, default=0.1)
    ap.add_argument("--crop", type=int, nargs=2, default=(64, 32))
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (model is tiny; avoids TPU contention)")
    ap.add_argument("--out", default="checkpoints/embedder.npz")
    args = ap.parse_args()

    if args.cpu or "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from rtmodt_tpu.models.embedder import AppearanceEmbedder, _flatten

    hw = tuple(args.crop)
    model = AppearanceEmbedder(embed_dim=args.embed_dim)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((1, hw[0], hw[1], 3), jnp.float32))
    tx = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps, 0.05),
                     weight_decay=1e-4)
    opt_state = tx.init(params)

    p_ids, k_views = args.batch_ids, args.views

    def ntxent(params, patches, labels):
        """Supervised NT-Xent: all same-identity pairs are positives."""
        z = model.apply(params, patches)                   # (B, E) unit
        sim = z @ z.T / args.temp                          # (B, B)
        b = z.shape[0]
        eye = jnp.eye(b, dtype=bool)
        pos = (labels[:, None] == labels[None, :]) & ~eye
        logits = jnp.where(eye, -1e9, sim)
        log_prob = logits - jax.nn.logsumexp(logits, axis=1, keepdims=True)
        loss = -jnp.sum(jnp.where(pos, log_prob, 0.0)) / jnp.maximum(
            jnp.sum(pos), 1)
        return loss

    @jax.jit
    def step(params, opt_state, patches, labels):
        loss, grads = jax.value_and_grad(ntxent)(params, patches, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    train_ids = np.arange(args.identities)
    t0 = time.time()
    for it in range(args.steps):
        ids = np.repeat(rng.choice(train_ids, p_ids, replace=False), k_views)
        views = rng.integers(0, 1 << 30, ids.shape[0])
        patches = batch_views(ids, views, hw, args.seed)
        labels = jnp.asarray(ids)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(patches), labels)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"step {it}: loss {float(loss):.4f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)

    # held-out eval: identities the training never saw
    eval_ids = np.arange(args.identities, args.identities + 128)
    gal_v = rng.integers(1 << 30, 1 << 31, eval_ids.shape[0])
    qry_v = rng.integers(1 << 30, 1 << 31, eval_ids.shape[0])
    gal = model.apply(params, jnp.asarray(
        batch_views(eval_ids, gal_v, hw, args.seed)))
    qry = model.apply(params, jnp.asarray(
        batch_views(eval_ids, qry_v, hw, args.seed)))
    sim = np.asarray(qry @ gal.T)
    rank1 = float(np.mean(sim.argmax(1) == np.arange(len(eval_ids))))
    pos = np.diag(sim)
    neg = np.where(np.eye(len(sim), dtype=bool), -1, sim).max(1)
    print(f"held-out rank-1: {rank1:.4f}  "
          f"pos cos {pos.mean():.3f}  hardest-neg cos {neg.mean():.3f}  "
          f"margin {(pos - neg).mean():.3f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(params))
    np.savez(args.out, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"saved {args.out} ({len(flat)} tensors); wire it with "
          f"tracking.deepsort.embedder: {args.out}")


if __name__ == "__main__":
    sys.exit(main())
