"""2D convex hull with jit-compatible signed distance queries.

Re-design of `gym_jiminy.toolbox.math.qhull.ConvexHull2D` (reference
`toolbox/math/qhull.py:52-363`): the reference wraps scipy Qhull with numba
post-processing; on TPU the hull over a *small fixed set* of candidate points
(contact positions, n ~ 4-16) is computed branch-free with static shapes.

A directed edge (i, j) is a hull edge iff every other candidate lies on or to
the left of it (all-pairs test, O(n^3) fused element-wise ops — cheaper than
any stack-based chain at these sizes and fully batch/vmap-transparent).  This
is a TRUE hull: interior points never contribute edges, so concave candidate
sets (e.g. a foot polygon with an interior contact) are handled exactly,
matching scipy.spatial.ConvexHull (see tests/test_toolbox.py property test).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class ConvexHull2D:
    """Convex hull of (n, 2) points with distance queries.

    The hull is implicit: a boolean mask over all n*(n-1) directed edges marks
    the true hull edges.  Signed distance of a query is
    `max_e(plane distance)` when inside (negative), and the euclidean distance
    to the nearest hull edge segment when outside (positive) — the reference
    convention.  Zero-weight points are excluded from the hull.
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

        pts = self.points
        valid_pt = self.weights > 0
        # Directed edges a_i -> b_j for all ordered pairs (i, j), i != j.
        a = pts[..., :, None, :]  # (..., n, 1, 2)
        b = pts[..., None, :, :]  # (..., 1, n, 2)
        e = b - a  # (..., n, n, 2)
        e_len = jnp.linalg.norm(e, axis=-1)
        # cross((b - a), (p_k - a)) for every candidate k: (..., n, n, n)
        pk = pts[..., None, None, :, :] - a[..., None, :]
        cross = e[..., None, 0] * pk[..., 1] - e[..., None, 1] * pk[..., 0]
        # Scale-aware tolerance so nearly-collinear points don't flicker.
        scale = jnp.maximum(jnp.max(e_len, axis=(-2, -1), keepdims=True), 1.0)
        eps = 1e-9 * scale[..., None]
        left_ok = (cross >= -eps) | ~valid_pt[..., None, None, :]
        is_edge = (
            jnp.all(left_ok, axis=-1)
            & valid_pt[..., :, None]
            & valid_pt[..., None, :]
            & (e_len > 1e-12)
        )
        # Flatten the pair grid once; queries only loop over n*n edges.
        flat = lambda x: x.reshape(x.shape[:-2] + (n * n,))
        self._edge_a = jnp.broadcast_to(a, e.shape).reshape(
            e.shape[:-3] + (n * n, 2)
        )
        self._edge_e = e.reshape(e.shape[:-3] + (n * n, 2))
        self._edge_len = flat(e_len)
        self._edge_mask = flat(is_edge)
        # Degenerate candidate sets (single point / all coincident) have no
        # edges at all: remember one valid anchor point for those queries.
        anchor_idx = jnp.argmax(valid_pt, axis=-1)
        self._anchor = jnp.take_along_axis(
            pts, anchor_idx[..., None, None], axis=-2
        )[..., 0, :]
        self._has_edges = jnp.any(self._edge_mask, axis=-1)

    @property
    def vertex_mask(self) -> jnp.ndarray:
        """(..., n) boolean: point i is a hull vertex (tail of a hull edge)."""
        n = self.points.shape[-2]
        m = self._edge_mask.reshape(self._edge_mask.shape[:-1] + (n, n))
        return jnp.any(m, axis=-1)

    def signed_distance(self, queries) -> jnp.ndarray:
        """Signed distance of (..., 2) queries: negative inside the hull."""
        q = jnp.asarray(queries)
        a = self._edge_a
        e = self._edge_e
        e_len = jnp.maximum(self._edge_len, 1e-12)
        mask = self._edge_mask
        # Outward normal of a CCW hull edge: (ey, -ex) / |e|
        nx = e[..., 1] / e_len
        ny = -e[..., 0] / e_len
        qa_x = q[..., None, 0] - a[..., :, 0]
        qa_y = q[..., None, 1] - a[..., :, 1]
        d = qa_x * nx + qa_y * ny
        d = jnp.where(mask, d, -jnp.inf)
        d_poly = jnp.max(d, axis=-1)
        # Outside: true euclidean distance to the hull boundary (clamped
        # segment feet; vertices are covered by the clamping).
        t = jnp.clip((qa_x * e[..., 0] + qa_y * e[..., 1]) / e_len**2, 0.0, 1.0)
        px = a[..., :, 0] + t * e[..., 0]
        py = a[..., :, 1] + t * e[..., 1]
        d_seg = jnp.sqrt(
            (q[..., None, 0] - px) ** 2 + (q[..., None, 1] - py) ** 2
        )
        d_seg = jnp.where(mask, d_seg, jnp.inf)
        d_out = jnp.min(d_seg, axis=-1)
        # `>= 0` (not `> 0`): for a degenerate collinear hull every on-line
        # query has plane distance exactly 0 but may still be far outside the
        # segment — route it to the euclidean branch (d_out == 0 on the
        # boundary anyway, so 2D hulls are unaffected).
        dist = jnp.where(d_poly >= 0, d_out, d_poly)
        # No edges at all (point-degenerate set): distance to the anchor.
        d_anchor = jnp.linalg.norm(q - self._anchor, axis=-1)
        return jnp.where(self._has_edges, dist, d_anchor)
