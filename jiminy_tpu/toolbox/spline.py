"""Differentiable natural cubic splines in JAX (reference
`gym_jiminy.toolbox.math.spline.Spline` — torch there, jax here)."""

from __future__ import annotations

import jax.numpy as jnp


class Spline:
    """Natural cubic spline through (t_k, y_k); vectorized, differentiable
    evaluation of value and derivatives."""

    def __init__(self, ts, ys):
        ts = jnp.asarray(ts)
        ys = jnp.asarray(ys)
        if ys.ndim == 1:
            ys = ys[:, None]
        n = ts.shape[0]
        h = ts[1:] - ts[:-1]
        # Solve the tridiagonal system for second derivatives (natural BCs)
        diag = 2.0 * (h[:-1] + h[1:])
        rhs = 6.0 * ((ys[2:] - ys[1:-1]) / h[1:, None] - (ys[1:-1] - ys[:-2]) / h[:-1, None])
        m_inner = jnp.zeros((n - 2, n - 2), ts.dtype)
        idx = jnp.arange(n - 2)
        m_inner = m_inner.at[idx, idx].set(diag)
        m_inner = m_inner.at[idx[:-1], idx[:-1] + 1].set(h[1:-1])
        m_inner = m_inner.at[idx[:-1] + 1, idx[:-1]].set(h[1:-1])
        m2_inner = jnp.linalg.solve(m_inner, rhs) if n > 2 else jnp.zeros_like(rhs[:0])
        zeros = jnp.zeros((1, ys.shape[1]), ts.dtype)
        self.m2 = jnp.concatenate([zeros, m2_inner, zeros], axis=0)
        self.ts = ts
        self.ys = ys
        self.h = h

    def _coeffs(self, t):
        k = jnp.clip(jnp.searchsorted(self.ts, t, side="right") - 1, 0, len(self.ts) - 2)
        h = self.h[k]
        t0 = self.ts[k]
        a = (self.ts[k + 1] - t) / h
        b = (t - t0) / h
        return k, h, a, b

    def __call__(self, t):
        t = jnp.asarray(t)
        k, h, a, b = self._coeffs(t)
        y0, y1 = self.ys[k], self.ys[k + 1]
        m0, m1 = self.m2[k], self.m2[k + 1]
        a_, b_, h_ = a[..., None], b[..., None], h[..., None]
        return (
            a_ * y0
            + b_ * y1
            + ((a_**3 - a_) * m0 + (b_**3 - b_) * m1) * h_**2 / 6.0
        )

    def derivative(self, t, order: int = 1):
        t = jnp.asarray(t)
        k, h, a, b = self._coeffs(t)
        y0, y1 = self.ys[k], self.ys[k + 1]
        m0, m1 = self.m2[k], self.m2[k + 1]
        a_, b_, h_ = a[..., None], b[..., None], h[..., None]
        if order == 1:
            return (
                (y1 - y0) / h_
                + ((3 * b_**2 - 1) * m1 - (3 * a_**2 - 1) * m0) * h_ / 6.0
            )
        if order == 2:
            return a_ * m0 + b_ * m1
        raise ValueError("order must be 1 or 2")
