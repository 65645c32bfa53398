"""Differentiable cubic splines in JAX (reference
`gym_jiminy.toolbox.math.spline.Spline`, `toolbox/math/spline.py:189` — torch
there, jax here).

Feature parity with the reference: boundary modes ``not-a-knot`` (the Matlab
``interp1(..., 'spline')`` behavior), ``natural``, ``periodic``, and Hermite
construction from values + first derivatives (``dydt=``); evaluation of the
value and its first three derivatives; polynomial extrapolation outside the
knot span (periodic wrap in ``periodic`` mode).  Beyond the reference (which
documents "does not support Batch processing"): channel dimensions are
batched, queries are arbitrary-shape arrays, and everything is jit/vmap/grad
transparent — the knot solve is a dense ``jnp.linalg.solve`` of the C²
continuity system expressed in knot slopes (small n; autodiff flows through
the solve, replacing the reference's hand-written banded-solver backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MODES = ("not-a-knot", "natural", "periodic")


def _solve_slopes(ts, ys, mode):
    """Knot slopes k_i of the C² cubic interpolant, shape like `ys`.

    Per-interval cubic Hermite with endpoint slopes; C² continuity at the
    interior knots gives the classic tridiagonal system
    ``k_{i-1}/h_{i-1} + 2 k_i (1/h_{i-1} + 1/h_i) + k_{i+1}/h_i
    = 3 (dy_{i-1}/h_{i-1}^2 + dy_i/h_i^2)``, closed by the boundary mode.
    """
    n = ts.shape[0]
    dtype = ys.dtype
    h = (ts[1:] - ts[:-1]).astype(dtype)
    flat = ys.reshape(n, -1)
    dy = flat[1:] - flat[:-1]

    if mode == "periodic":
        # Unknowns k_0..k_{n-2} with k_{n-1} = k_0; continuity wraps around.
        m = n - 1
        a = jnp.zeros((m, m), dtype)
        b = jnp.zeros((m, flat.shape[1]), dtype)
        for i in range(m):
            hp = h[i - 1] if i > 0 else h[-1]  # interval ending at knot i
            hn = h[i]  # interval starting at knot i
            dyp = dy[i - 1] if i > 0 else dy[-1]
            dyn_ = dy[i]
            a = a.at[i, (i - 1) % m].add(1.0 / hp)
            a = a.at[i, i].add(2.0 * (1.0 / hp + 1.0 / hn))
            a = a.at[i, (i + 1) % m].add(1.0 / hn)
            b = b.at[i].set(3.0 * (dyp / hp**2 + dyn_ / hn**2))
        k = jnp.linalg.solve(a, b)
        return jnp.concatenate([k, k[:1]], axis=0).reshape(ys.shape)

    if n == 2:
        k = jnp.broadcast_to(dy[0] / h[0], flat.shape)
        return k.reshape(ys.shape)

    a = jnp.zeros((n, n), dtype)
    b = jnp.zeros((n, flat.shape[1]), dtype)
    for i in range(1, n - 1):
        a = a.at[i, i - 1].set(1.0 / h[i - 1])
        a = a.at[i, i].set(2.0 * (1.0 / h[i - 1] + 1.0 / h[i]))
        a = a.at[i, i + 1].set(1.0 / h[i])
        b = b.at[i].set(3.0 * (dy[i - 1] / h[i - 1] ** 2 + dy[i] / h[i] ** 2))

    if mode == "natural":
        # y''(t_0) = 0  and  y''(t_{n-1}) = 0
        a = a.at[0, 0].set(2.0 / h[0])
        a = a.at[0, 1].set(1.0 / h[0])
        b = b.at[0].set(3.0 * dy[0] / h[0] ** 2)
        a = a.at[-1, -2].set(1.0 / h[-1])
        a = a.at[-1, -1].set(2.0 / h[-1])
        b = b.at[-1].set(3.0 * dy[-1] / h[-1] ** 2)
    elif mode == "not-a-knot":
        if n == 3:
            # Single parabola through the three points (scipy behavior):
            # y'''
            # continuity degenerates; impose y''' = 0 on both intervals.
            a = a.at[0, 0].set(1.0 / h[0] ** 2)
            a = a.at[0, 1].set(1.0 / h[0] ** 2)
            b = b.at[0].set(2.0 * dy[0] / h[0] ** 3)
            a = a.at[-1, -2].set(1.0 / h[-1] ** 2)
            a = a.at[-1, -1].set(1.0 / h[-1] ** 2)
            b = b.at[-1].set(2.0 * dy[-1] / h[-1] ** 3)
        else:
            # Third derivative continuous across the second and second-to-
            # last knots: cubic coefficient c_i = (k_i + k_{i+1}
            # - 2 dy_i/h_i)/h_i^2 matches between adjacent intervals.
            a = a.at[0, 0].set(1.0 / h[0] ** 2)
            a = a.at[0, 1].set(1.0 / h[0] ** 2 - 1.0 / h[1] ** 2)
            a = a.at[0, 2].set(-1.0 / h[1] ** 2)
            b = b.at[0].set(2.0 * (dy[0] / h[0] ** 3 - dy[1] / h[1] ** 3))
            a = a.at[-1, -3].set(1.0 / h[-2] ** 2)
            a = a.at[-1, -2].set(1.0 / h[-2] ** 2 - 1.0 / h[-1] ** 2)
            a = a.at[-1, -1].set(-1.0 / h[-1] ** 2)
            b = b.at[-1].set(2.0 * (dy[-2] / h[-2] ** 3 - dy[-1] / h[-1] ** 3))
    else:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")

    return jnp.linalg.solve(a, b).reshape(ys.shape)


class Spline:
    """C² piecewise-cubic interpolant through ``(t_k, y_k)`` with selectable
    boundary conditions, or cubic Hermite when ``dydt`` is given; vectorized,
    differentiable evaluation of the value and derivatives up to order 3.

    :param ts: knot abscissae, strictly increasing, shape ``(n,)``.
    :param ys: knot values, shape ``(n, *channels)`` (knots first).
    :param dydt: optional knot first derivatives, same shape as ``ys``; when
        given the spline is the Hermite interpolant (reference: "the value of
        the function and its first derivative") and ``mode`` is ignored.
    :param mode: ``"not-a-knot"`` (default, Matlab/scipy behavior),
        ``"natural"``, or ``"periodic"`` (requires ``ys[-1] == ys[0]``).
    """

    def __init__(self, ts, ys, dydt=None, mode: str = "not-a-knot"):
        ts = jnp.asarray(ts)
        ys = jnp.asarray(ys)
        if ys.ndim == 1:
            ys = ys[:, None]
        if mode == "periodic" and dydt is None:
            # Same guard as scipy CubicSpline(bc_type="periodic") — a
            # mismatched endpoint would silently build a discontinuous
            # interpolant.  Only checkable on concrete (non-traced) values.
            try:
                closed = bool(jnp.allclose(ys[0], ys[-1], atol=1e-9))
            except jax.errors.TracerBoolConversionError:
                closed = True
            if not closed:
                raise ValueError(
                    "periodic spline requires ys[-1] == ys[0] (unclosed "
                    "cycle; max endpoint gap "
                    f"{float(jnp.max(jnp.abs(ys[0] - ys[-1]))):.3g})"
                )
        self.ts = ts
        self.ys = ys
        self.mode = mode
        self.h = ts[1:] - ts[:-1]
        if dydt is not None:
            dydt = jnp.asarray(dydt)
            if dydt.ndim == 1:
                dydt = dydt[:, None]
            self.k = dydt
        else:
            self.k = _solve_slopes(ts, ys, mode)

    def _locate(self, t):
        t = jnp.asarray(t)
        if self.mode == "periodic":
            period = self.ts[-1] - self.ts[0]
            t = self.ts[0] + jnp.mod(t - self.ts[0], period)
        idx = jnp.clip(
            jnp.searchsorted(self.ts, t, side="right") - 1, 0, len(self.ts) - 2
        )
        return t, idx

    def __call__(self, t, order: int = 0):
        """Value (``order=0``) or ``order``-th derivative at ``t`` (any
        shape); output shape ``t.shape + channels``.  Outside the knot span
        the boundary polynomial extrapolates (periodic mode wraps)."""
        t, idx = self._locate(t)
        h = self.h[idx][..., None]
        s = ((t - self.ts[idx]) / self.h[idx])[..., None]
        y0, y1 = self.ys[idx], self.ys[idx + 1]
        k0, k1 = self.k[idx] * h, self.k[idx + 1] * h
        # Hermite basis in normalized coordinate s on [0, 1]:
        #   p = h00 y0 + h10 k0 + h01 y1 + h11 k1
        if order == 0:
            h00 = 2 * s**3 - 3 * s**2 + 1
            h10 = s**3 - 2 * s**2 + s
            h01 = -2 * s**3 + 3 * s**2
            h11 = s**3 - s**2
            scale = 1.0
        elif order == 1:
            h00 = 6 * s**2 - 6 * s
            h10 = 3 * s**2 - 4 * s + 1
            h01 = -6 * s**2 + 6 * s
            h11 = 3 * s**2 - 2 * s
            scale = 1.0 / h
        elif order == 2:
            h00 = 12 * s - 6
            h10 = 6 * s - 4
            h01 = -12 * s + 6
            h11 = 6 * s - 2
            scale = 1.0 / h**2
        elif order == 3:
            one = jnp.ones_like(s)
            h00, h10, h01, h11 = 12 * one, 6 * one, -12 * one, 6 * one
            scale = 1.0 / h**3
        else:
            raise ValueError("order must be 0, 1, 2 or 3")
        return (h00 * y0 + h10 * k0 + h01 * y1 + h11 * k1) * scale

    def derivative(self, t, order: int = 1):
        """Derivative of the given order at ``t`` (kept for backward
        compatibility with the round-3 natural-spline API)."""
        return self(t, order=order)
