"""2D convex hull with jit-compatible signed distance queries.

Re-design of `gym_jiminy.toolbox.math.qhull.ConvexHull2D` (reference
`toolbox/math/qhull.py:52-363`): the reference wraps scipy Qhull with numba
post-processing; on TPU the hull over a *small fixed set* of candidate points
(contact positions) is computed branch-free with static shapes — an
Andrew-monotone-chain replacement would need data-dependent sizes, so instead
the signed distance uses the half-plane form over all point pairs that are hull
edges of the *candidate* polygon, masked by support membership.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class ConvexHull2D:
    """Convex hull of (n, 2) points with distance queries.

    For jit-compatibility the hull is represented implicitly: a query's signed
    distance to the hull is computed as `max_e(d_e)` over all directed edges of
    the candidate polygon ordered by angle around the centroid (valid for the
    convex position sets produced by contact layouts).  Positive outside,
    negative inside (matches the reference convention).
    """

    def __init__(self, points, weights=None):
        self.points = jnp.asarray(points)
        n = self.points.shape[-2]
        if n < 1:
            raise ValueError("need at least one point")
        self.weights = weights if weights is not None else jnp.ones(
            self.points.shape[:-1], self.points.dtype
        )
        w = self.weights[..., None]
        self.center = jnp.sum(self.points * w, axis=-2) / jnp.sum(w, axis=-2)
        # Order candidate points by angle around the (weighted) centroid
        rel = self.points - self.center[..., None, :]
        ang = jnp.arctan2(rel[..., 1], rel[..., 0])
        # Mask degenerate (zero-weight) points to the centroid angle
        order = jnp.argsort(jnp.where(self.weights > 0, ang, jnp.inf), axis=-1)
        self._sorted = jnp.take_along_axis(self.points, order[..., None], axis=-2)
        self._mask = jnp.take_along_axis(self.weights > 0, order, axis=-1)

    def signed_distance(self, queries) -> jnp.ndarray:
        """Signed distance of (..., 2) queries: negative inside the hull."""
        q = jnp.asarray(queries)
        pts = self._sorted
        mask = self._mask
        n = pts.shape[-2]
        nxt = jnp.roll(jnp.arange(n), -1)
        a = pts
        b = pts[..., nxt, :]
        valid = mask & mask[..., nxt]
        # Signed distance to each directed edge (outward normals, CCW polygon)
        e = b - a
        e_len = jnp.maximum(jnp.linalg.norm(e, axis=-1), 1e-12)
        # normal pointing outward for CCW ordering: (ey, -ex)
        nx = e[..., 1] / e_len
        ny = -e[..., 0] / e_len
        qa_x = q[..., None, 0] - a[..., :, 0]
        qa_y = q[..., None, 1] - a[..., :, 1]
        d = qa_x * nx + qa_y * ny
        d = jnp.where(valid, d, -jnp.inf)
        d_poly = jnp.max(d, axis=-1)
        # Outside: clamp to true euclidean distance to vertices/edges
        t = jnp.clip((qa_x * e[..., 0] + qa_y * e[..., 1]) / e_len**2, 0.0, 1.0)
        px = a[..., :, 0] + t * e[..., 0]
        py = a[..., :, 1] + t * e[..., 1]
        d_seg = jnp.sqrt((q[..., None, 0] - px) ** 2 + (q[..., None, 1] - py) ** 2)
        d_seg = jnp.where(valid, d_seg, jnp.inf)
        d_out = jnp.min(d_seg, axis=-1)
        return jnp.where(d_poly > 0, d_out, d_poly)
