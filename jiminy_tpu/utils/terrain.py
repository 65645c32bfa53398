"""Random processes and procedural terrain generation.

Re-design of the reference's RNG/terrain stack (`core/src/utilities/random.cc`:
PCG32 + periodic Gaussian/Fourier processes + 1-3D octave Perlin noise;
`core/src/utilities/geometry.cc`: stairs/Perlin grounds + heightmap algebra).
TPU-first changes:

- Randomness is `jax.random` counter-based (threefry) — splittable per env,
  reproducible under vmap, no mutable generator state (the PCG32 of the
  reference is also counter-based; semantics match, streams differ).
- A ground profile is a jittable callable `f(xy) -> (height, normal)`; normals
  come from `jax.grad` of the analytic height function instead of hand-coded
  derivatives — exact for every generator, including all Perlin octaves.
- Heightmap algebra (`sum_heightmaps`, `merge_heightmaps`) composes callables,
  and `discretize_heightmap` samples them to a grid (the reference bakes an
  hpp-fcl HeightField; here the grid is itself jittable for collision queries).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _height_with_normal(height_xy: Callable) -> Callable:
    """Lift an elementwise scalar height function `h(x, y)` to
    `f(xy) -> (h, unit normal)` using forward-mode autodiff for the surface
    gradient.  The lifted function also exposes `fn.height_components(x, y) ->
    (h, (nx, ny, nz))` (normal NOT normalized) built from plain elementwise ops
    only — no vmap/reshape — so it traces inside a Pallas kernel and the fused
    dynamics megakernel can evaluate the terrain per contact point on-chip."""

    def components(x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        h, hx = jax.jvp(lambda xx: height_xy(xx, y), (x,), (jnp.ones_like(x),))
        _, hy = jax.jvp(lambda yy: height_xy(x, yy), (y,), (jnp.ones_like(y),))
        return h, (-hx, -hy, jnp.ones_like(h))

    def fn(xy):
        h, (nx, ny, nz) = components(xy[..., 0], xy[..., 1])
        n = jnp.stack(jnp.broadcast_arrays(nx, ny, nz), axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return jnp.broadcast_to(h, xy.shape[:-1]), n

    fn.height_components = components
    return fn


# --------------------------------------------------------------------------- #
# Stationary scalar processes (reference `PeriodicGaussianProcess`,
# `PeriodicFourierProcess`, `utilities/random.h:37-495`)
# --------------------------------------------------------------------------- #


class PeriodicFourierProcess:
    """Periodic random process as a truncated random Fourier series."""

    def __init__(self, key, wavelength: float, period: float, num_harmonics: int = 8):
        self.period = period
        k1, k2 = jax.random.split(key)
        n = num_harmonics
        freqs = 2.0 * np.pi * np.arange(1, n + 1) / period
        decay = jnp.exp(-0.5 * (jnp.asarray(freqs) * wavelength / (2 * np.pi)) ** 2)
        self.freqs = jnp.asarray(freqs)
        self.a = jax.random.normal(k1, (n,)) * decay
        self.b = jax.random.normal(k2, (n,)) * decay
        norm = jnp.sqrt(jnp.sum(decay**2) + 1e-12)
        self.a = self.a / norm
        self.b = self.b / norm

    def __call__(self, t):
        t = jnp.asarray(t)[..., None]
        return jnp.sum(
            self.a * jnp.cos(self.freqs * t) + self.b * jnp.sin(self.freqs * t),
            axis=-1,
        )


class PeriodicGaussianProcess(PeriodicFourierProcess):
    """Periodic Gaussian process with squared-exponential kernel, realized by
    spectral sampling (same construction, interpretation per reference)."""


# --------------------------------------------------------------------------- #
# Perlin noise (reference random.cc octave Perlin, hash-gradient lattice)
# --------------------------------------------------------------------------- #


def _hash2(ix, iy, seed):
    """Integer lattice hash -> uint32 (stateless, jit-friendly)."""
    h = (ix.astype(jnp.uint32) * jnp.uint32(374761393)) ^ (
        iy.astype(jnp.uint32) * jnp.uint32(668265263)
    ) ^ jnp.uint32(seed)
    h = (h ^ (h >> 13)) * jnp.uint32(1274126177)
    return h ^ (h >> 16)


def _u32_to_float(h, dtype):
    """uint32 -> float, bit-identical to a direct convert (one rounding of the
    integer value) but Mosaic-lowerable: Pallas TPU has no uint32->float cast,
    so split 16/16, bitcast each half to int32 and recombine in float."""
    import jax as _jax

    hi = _jax.lax.bitcast_convert_type(h >> 16, jnp.int32).astype(dtype)
    lo = _jax.lax.bitcast_convert_type(h & jnp.uint32(0xFFFF), jnp.int32).astype(dtype)
    return hi * 65536.0 + lo


def _gradient2(ix, iy, seed, dtype):
    ang = _u32_to_float(_hash2(ix, iy, seed), dtype) * (2.0 * np.pi / 4294967296.0)
    return jnp.cos(ang), jnp.sin(ang)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin2(x, y, seed: int = 0):
    """Single-octave 2D Perlin gradient noise, C2-smooth (differentiable)."""
    x = jnp.asarray(x)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    fx = (x - x0).astype(dtype)
    fy = (y - y0).astype(dtype)

    def dot_grad(ix, iy, dx, dy):
        gx, gy = _gradient2(ix, iy, seed, dtype)
        return gx * dx + gy * dy

    n00 = dot_grad(ix0, iy0, fx, fy)
    n10 = dot_grad(ix0 + 1, iy0, fx - 1.0, fy)
    n01 = dot_grad(ix0, iy0 + 1, fx, fy - 1.0)
    n11 = dot_grad(ix0 + 1, iy0 + 1, fx - 1.0, fy - 1.0)
    u, v = _fade(fx), _fade(fy)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return nx0 + v * (nx1 - nx0)


def octave_perlin2(x, y, octaves: int = 4, persistence: float = 0.5, seed: int = 0):
    total = 0.0
    amp = 1.0
    freq = 1.0
    norm = 0.0
    for o in range(octaves):
        total = total + amp * perlin2(x * freq, y * freq, seed=seed + o)
        norm += amp
        amp *= persistence
        freq *= 2.0
    return total / norm


def perlin1(x, seed: int = 0):
    """Single-octave 1D Perlin gradient noise (reference 1D `PerlinProcess`,
    `utilities/random.h` — e.g. scalar noise processes over time)."""
    x = jnp.asarray(x)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x0 = jnp.floor(x)
    ix0 = x0.astype(jnp.int32)
    fx = (x - x0).astype(dtype)

    def grad(ix):
        # 1D "gradient": slope in [-1, 1) from the lattice hash
        h = _hash2(ix, jnp.zeros_like(ix), seed)
        return _u32_to_float(h, dtype) * (2.0 / 4294967296.0) - 1.0

    n0 = grad(ix0) * fx
    n1 = grad(ix0 + 1) * (fx - 1.0)
    return n0 + _fade(fx) * (n1 - n0)


def octave_perlin1(x, octaves: int = 4, persistence: float = 0.5, seed: int = 0):
    total, amp, freq, norm = 0.0, 1.0, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * perlin1(x * freq, seed=seed + o)
        norm += amp
        amp *= persistence
        freq *= 2.0
    return total / norm


def _hash3(ix, iy, iz, seed):
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(374761393)
        ^ iy.astype(jnp.uint32) * jnp.uint32(668265263)
        ^ iz.astype(jnp.uint32) * jnp.uint32(2246822519)
        ^ jnp.uint32(seed)
    )
    h = (h ^ (h >> 13)) * jnp.uint32(1274126177)
    return h ^ (h >> 16)


def perlin3(x, y, z, seed: int = 0):
    """Single-octave 3D Perlin gradient noise (reference 3D Perlin,
    `utilities/random.h:37-495`)."""
    x = jnp.asarray(x)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    ix0, iy0, iz0 = (v.astype(jnp.int32) for v in (x0, y0, z0))
    fx = (x - x0).astype(dtype)
    fy = (y - y0).astype(dtype)
    fz = (z - z0).astype(dtype)

    def dot_grad(ix, iy, iz, dx, dy, dz):
        # Unit gradient from two hashed angles (uniform on the sphere is not
        # required for valid Perlin noise; the lattice hash decorrelates)
        h1 = _u32_to_float(_hash3(ix, iy, iz, seed), dtype) * (2.0 * np.pi / 4294967296.0)
        h2 = _u32_to_float(
            _hash3(ix, iy, iz, seed + 0x9E37), dtype
        ) * (2.0 / 4294967296.0) - 1.0
        st = jnp.sqrt(jnp.maximum(1.0 - h2 * h2, 0.0))
        gx, gy, gz = st * jnp.cos(h1), st * jnp.sin(h1), h2
        return gx * dx + gy * dy + gz * dz

    n000 = dot_grad(ix0, iy0, iz0, fx, fy, fz)
    n100 = dot_grad(ix0 + 1, iy0, iz0, fx - 1.0, fy, fz)
    n010 = dot_grad(ix0, iy0 + 1, iz0, fx, fy - 1.0, fz)
    n110 = dot_grad(ix0 + 1, iy0 + 1, iz0, fx - 1.0, fy - 1.0, fz)
    n001 = dot_grad(ix0, iy0, iz0 + 1, fx, fy, fz - 1.0)
    n101 = dot_grad(ix0 + 1, iy0, iz0 + 1, fx - 1.0, fy, fz - 1.0)
    n011 = dot_grad(ix0, iy0 + 1, iz0 + 1, fx, fy - 1.0, fz - 1.0)
    n111 = dot_grad(ix0 + 1, iy0 + 1, iz0 + 1, fx - 1.0, fy - 1.0, fz - 1.0)
    u, v, w = _fade(fx), _fade(fy), _fade(fz)
    nx00 = n000 + u * (n100 - n000)
    nx10 = n010 + u * (n110 - n010)
    nx01 = n001 + u * (n101 - n001)
    nx11 = n011 + u * (n111 - n011)
    nxy0 = nx00 + v * (nx10 - nx00)
    nxy1 = nx01 + v * (nx11 - nx01)
    return nxy0 + w * (nxy1 - nxy0)


def octave_perlin3(x, y, z, octaves: int = 4, persistence: float = 0.5,
                   seed: int = 0):
    total, amp, freq, norm = 0.0, 1.0, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * perlin3(x * freq, y * freq, z * freq, seed=seed + o)
        norm += amp
        amp *= persistence
        freq *= 2.0
    return total / norm


# --------------------------------------------------------------------------- #
# Ground generators (reference `geometry.cc`: periodicStairs,
# randomPerlinGround, periodicPerlinGround, unidirectionalRandomPerlinGround)
# --------------------------------------------------------------------------- #


def periodic_stairs_ground(step_width: float, step_height: float,
                           step_number: int, orientation: float = 0.0) -> Callable:
    """Periodic staircase: `step_number` steps up then down, repeating
    (reference `periodicStairs`). The profile is smoothed over 1% of the step
    width so the normal stays well-defined (the reference returns a vertical
    normal at the discontinuity)."""

    def height(x, y):
        c, s = np.cos(orientation), np.sin(orientation)
        u = c * x + s * y
        period = 2.0 * step_number * step_width
        phase = jnp.mod(u, period) / step_width
        up = jnp.minimum(phase, step_number)
        down = jnp.maximum(phase - step_number, 0.0)
        # Smooth the staircase: floor + smoothstep over the riser
        def stairs(p):
            k = jnp.floor(p)
            frac = p - k
            eps = 0.01
            riser = jnp.clip((frac - (1 - eps)) / eps, 0.0, 1.0)
            return k + riser * riser * (3 - 2 * riser)

        return step_height * (stairs(up) - stairs(down))

    return _height_with_normal(height)


def random_perlin_ground(wavelength: float, height_max: float, seed: int = 0,
                         octaves: int = 4) -> Callable:
    """Isotropic octave-Perlin terrain (reference `randomPerlinGround`)."""

    def height(x, y):
        return height_max * octave_perlin2(
            x / wavelength, y / wavelength, octaves=octaves, seed=seed
        )

    return _height_with_normal(height)


def periodic_perlin_ground(wavelength: float, period: float, height_max: float,
                           seed: int = 0, octaves: int = 4) -> Callable:
    """Perlin terrain periodized by sampling noise on a torus embedding
    (reference `periodicPerlinGround`)."""

    def height(x, y):
        tx = 2 * np.pi * x / period
        ty = 2 * np.pi * y / period
        r = period / (2 * np.pi * wavelength)
        return height_max * octave_perlin2(
            r * jnp.cos(tx) + 31.7, r * jnp.sin(ty) + 17.3, octaves=octaves, seed=seed
        )

    return _height_with_normal(height)


def unidirectional_random_perlin_ground(wavelength: float, height_max: float,
                                        orientation: float = 0.0, seed: int = 0,
                                        octaves: int = 4) -> Callable:
    """1D Perlin ripples along a direction (reference
    `unidirectionalRandomPerlinGround`)."""

    def height(x, y):
        c, s = np.cos(orientation), np.sin(orientation)
        u = (c * x + s * y) / wavelength
        return height_max * octave_perlin2(u, jnp.zeros_like(u) + 0.5, octaves=octaves,
                                           seed=seed)

    return _height_with_normal(height)


# --------------------------------------------------------------------------- #
# Heightmap algebra (reference `sumHeightmaps`, `mergeHeightmaps`,
# `discretizeHeightmap`)
# --------------------------------------------------------------------------- #


def sum_heightmaps(grounds: Sequence[Callable]) -> Callable:
    """Sum of ground profiles; normals re-derived from the summed gradients."""

    def fn(xy):
        h_total = 0.0
        grad = 0.0
        for g in grounds:
            h, n = g(xy)
            h_total = h_total + h
            # recover gradient from normal: n = normalize([-gx, -gy, 1])
            grad = grad + (-n[..., 0:2] / jnp.maximum(n[..., 2:3], 1e-9))
        n = jnp.concatenate(
            [-grad, jnp.ones(grad.shape[:-1] + (1,), grad.dtype)], axis=-1
        )
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h_total, n

    cfns = [getattr(g, "height_components", None) for g in grounds]
    if all(c is not None for c in cfns):
        # All terms are elementwise — the sum is too (Pallas-safe)
        def components(x, y):
            h_total, gx, gy = 0.0, 0.0, 0.0
            for c in cfns:
                h, (nx, ny, nz) = c(x, y)
                h_total = h_total + h
                gx = gx + nx / nz
                gy = gy + ny / nz
            return h_total, (gx, gy, jnp.ones_like(h_total))

        fn.height_components = components
    return fn


def merge_heightmaps(grounds: Sequence[Callable]) -> Callable:
    """Pointwise maximum of ground profiles (reference `mergeHeightmaps`)."""

    def fn(xy):
        hs, ns = zip(*[g(xy) for g in grounds])
        h = jnp.stack(hs, axis=0)
        n = jnp.stack(ns, axis=0)
        idx = jnp.argmax(h, axis=0)
        h_out = jnp.take_along_axis(h, idx[None], axis=0)[0]
        n_out = jnp.take_along_axis(n, idx[None, ..., None], axis=0)[0]
        return h_out, n_out

    cfns = [getattr(g, "height_components", None) for g in grounds]
    if all(c is not None for c in cfns):
        # Pointwise max via running `where` — elementwise (Pallas-safe)
        def components(x, y):
            h_out, n_out = cfns[0](x, y)
            for c in cfns[1:]:
                h, n = c(x, y)
                take = h > h_out
                h_out = jnp.where(take, h, h_out)
                n_out = tuple(
                    jnp.where(take, a, b) for a, b in zip(n, n_out)
                )
            return h_out, n_out

        fn.height_components = components
    return fn


def discretize_heightmap(ground: Callable, x_range, y_range, resolution: float):
    """Sample a ground profile to a regular grid (reference
    `discretizeHeightmap` → hpp-fcl HeightField; here a plain array +
    a bilinear-interpolating jittable query)."""
    xs = np.arange(x_range[0], x_range[1] + resolution / 2, resolution)
    ys = np.arange(y_range[0], y_range[1] + resolution / 2, resolution)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    xy = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=-1))
    h, _ = ground(xy)
    grid = np.asarray(h).reshape(len(xs), len(ys))

    def query(xy_q):
        fx = (xy_q[..., 0] - x_range[0]) / resolution
        fy = (xy_q[..., 1] - y_range[0]) / resolution
        ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, len(xs) - 2)
        iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, len(ys) - 2)
        tx = jnp.clip(fx - ix, 0.0, 1.0)
        ty = jnp.clip(fy - iy, 0.0, 1.0)
        g = jnp.asarray(grid)
        h00 = g[ix, iy]
        h10 = g[ix + 1, iy]
        h01 = g[ix, iy + 1]
        h11 = g[ix + 1, iy + 1]
        h0 = h00 + tx * (h10 - h00)
        h1 = h01 + tx * (h11 - h01)
        h_q = h0 + ty * (h1 - h0)
        gx_q = ((h10 - h00) + ty * ((h11 - h01) - (h10 - h00))) / resolution
        gy_q = ((h01 - h00) + tx * ((h11 - h10) - (h01 - h00))) / resolution
        n = jnp.stack([-gx_q, -gy_q, jnp.ones_like(gx_q)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h_q, n

    return grid, query
