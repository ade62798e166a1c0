"""Vectorized point-in-polygon tests on device.

TPU-native replacement for the per-(track x zone) Python loop over
``cv2.pointPolygonTest`` in the reference zone engine (reference
``src/events/zone_engine.py:94``; SURVEY.md N6).  All tracks x all zones are
tested at once with an even-odd (ray casting) rule over padded fixed-shape
polygon vertex arrays, so the test lives inside the jitted pipeline step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pad_polygons(polygons: list[list[list[float]]], max_vertices: int) -> np.ndarray:
    """Pad a ragged list of polygons to a static (Z, V, 2) array.

    Padding repeats each polygon's last vertex, which creates zero-length
    edges that contribute nothing to the crossing count - so the padded
    polygons are geometrically identical to the originals.
    """
    z = len(polygons)
    out = np.zeros((z, max_vertices, 2), dtype=np.float32)
    for i, poly in enumerate(polygons):
        pts = np.asarray(poly, dtype=np.float32)
        if len(pts) > max_vertices:
            raise ValueError(f"polygon {i} has {len(pts)} vertices > max_vertices={max_vertices}")
        out[i, : len(pts)] = pts
        out[i, len(pts):] = pts[-1]
    return out


def points_in_polygons(points: jnp.ndarray, polygons: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Even-odd containment of points (N, 2) in polygons (Z, V, 2) -> (N, Z) bool.

    Edges run v_k -> v_{(k+1) % V}; repeated (padding) vertices form degenerate
    edges with yi == yj, which the crossing condition rejects.
    """
    px = points[:, 0][:, None, None]                 # (N, 1, 1)
    py = points[:, 1][:, None, None]
    vx = polygons[None, :, :, 0]                     # (1, Z, V)
    vy = polygons[None, :, :, 1]
    nx = jnp.roll(polygons[..., 0], -1, axis=-1)[None]
    ny = jnp.roll(polygons[..., 1], -1, axis=-1)[None]

    straddles = (vy > py) != (ny > py)               # edge crosses the horizontal ray's y
    # x-coordinate where the edge crosses the ray
    t = (py - vy) / jnp.where(jnp.abs(ny - vy) < eps, eps, ny - vy)
    x_cross = vx + t * (nx - vx)
    crossings = jnp.sum((straddles & (px < x_cross)).astype(jnp.int32), axis=-1)  # (N, Z)
    return (crossings % 2) == 1
