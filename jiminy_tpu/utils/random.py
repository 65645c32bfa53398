"""PCG32 random number generator + scalar sampling helpers.

TPU-native re-design of the reference RNG utilities
(`core/include/jiminy/core/utilities/random.h:37-289`): the reference exposes a
`PCG32` counter-based generator (used to seed every engine and to drive the
random processes / model randomization) plus vectorized `uniform` / `normal`
Eigen operators over a generator ref.

Design split (see package docstring of `jiminy_tpu.utils.terrain`): everything
that runs *inside* jit (terrain noise, sensor noise, model randomization) uses
stateless JAX threefry keys — the idiomatic TPU equivalent of a counter-based
RNG. `PCG32` here is the *host-side* generator for API parity: seeding
simulations and drawing initial conditions. It implements the canonical
published pcg32 (setseq XSH-RR 64/32) algorithm by M.E. O'Neill (public spec,
pcg-random.org) and is bit-exact against its published test vectors
(tests/test_random.py). Note the reference instead uses the pcg32_fast MCG
XSH-RS variant (`random.cc:10-37`: `state |= 3`, no increment/stream), so
seeded *sequences* do NOT bit-match the reference binary — only the
distributional semantics and the API carry over. Implemented block-vectorized
over numpy uint64 so large draws are O(n/1024) Python steps.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

_MULT = np.uint64(6364136223846793005)
# Default state/stream of the canonical pcg32 setseq engine (pcg-random.org;
# the reference's pcg32_fast shares the state default, `random.h:42`, but has
# no stream).
_DEFAULT_STATE = 0xCAFEF00DD15EA5E5
_DEFAULT_SEQ = 0xDA3E39CB94B95BDB

_U64 = np.uint64
_U32 = np.uint32


def _output_xsh_rr(state: np.ndarray) -> np.ndarray:
    """PCG output permutation XSH-RR: 64-bit state -> 32-bit output."""
    with np.errstate(over="ignore"):
        xorshifted = (((state >> _U64(18)) ^ state) >> _U64(27)).astype(_U32)
        rot = (state >> _U64(59)).astype(_U32)
        return (xorshifted >> rot) | (
            xorshifted << ((-rot.astype(np.int64)).astype(_U32) & _U32(31))
        )


class PCG32:
    """PCG-XSH-RR 64/32 generator (reference `random.h:37-76`).

    Satisfies the numpy-style callable-uint32 protocol: ``g()`` draws one
    32-bit integer; ``g.integers/uniform/normal`` draw arrays. ``min()``/
    ``max()``/``operator()`` mirror the C++ UniformRandomBitGenerator concept.
    """

    MIN = 0
    MAX = 0xFFFFFFFF

    def __init__(
        self,
        state: Union[int, Sequence[int], None] = _DEFAULT_STATE,
        seq: int = _DEFAULT_SEQ,
    ):
        self.seed(state, seq)

    # ------------------------------------------------------------------ #
    def seed(self, state=_DEFAULT_STATE, seq: int = _DEFAULT_SEQ) -> None:
        """(Re-)seed. Accepts an int or a sequence of ints (the reference
        accepts any std::seed_seq-compatible source, `random.h:46-49`; here a
        sequence is hashed by iterated reseeding, not bit-for-bit seed_seq)."""
        if state is None:
            state = _DEFAULT_STATE
        if isinstance(state, (list, tuple, np.ndarray)):
            mixed = _U64(0)
            with np.errstate(over="ignore"):
                for word in state:
                    mixed = (mixed * _MULT + _U64(int(word) & 0xFFFFFFFFFFFFFFFF))
            state = int(mixed)
        self._inc = _U64(((int(seq) << 1) | 1) & 0xFFFFFFFFFFFFFFFF)
        # Canonical setseq seeding: state=0, step, add seed, step.
        self._state = _U64(0)
        self._step()
        with np.errstate(over="ignore"):
            self._state = self._state + _U64(int(state) & 0xFFFFFFFFFFFFFFFF)
        self._step()

    def _step(self) -> None:
        with np.errstate(over="ignore"):
            self._state = self._state * _MULT + self._inc

    # ------------------------------------------------------------------ #
    def __call__(self) -> int:
        old = self._state
        self._step()
        return int(_output_xsh_rr(np.asarray(old, _U64)))

    @staticmethod
    def min() -> int:  # noqa: A003 - UniformRandomBitGenerator concept
        return PCG32.MIN

    @staticmethod
    def max() -> int:  # noqa: A003
        return PCG32.MAX

    def advance(self, delta: int) -> None:
        """Jump ahead `delta` draws in O(log delta) (LCG fast skip)."""
        acc_mult, acc_plus = _U64(1), _U64(0)
        cur_mult, cur_plus = _MULT, self._inc
        delta = int(delta) & 0xFFFFFFFFFFFFFFFF
        with np.errstate(over="ignore"):
            while delta > 0:
                if delta & 1:
                    acc_mult = acc_mult * cur_mult
                    acc_plus = acc_plus * cur_mult + cur_plus
                cur_plus = (cur_mult + _U64(1)) * cur_plus
                cur_mult = cur_mult * cur_mult
                delta >>= 1
            self._state = acc_mult * self._state + acc_plus

    # ------------------------------------------------------------------ #
    def random_raw(self, size: Optional[int] = None) -> np.ndarray:
        """Draw uint32 words, block-vectorized over the LCG recurrence."""
        if size is None:
            return _U32(self())
        n = int(size)
        out = np.empty(n, _U32)
        # s_j = A^j s0 + Q_j c with P_0=1, Q_0=0, P_{j+1}=P_j A, Q_{j+1}=Q_j+P_j
        block = min(n, 1024)
        p = np.empty(block, _U64)
        q = np.empty(block, _U64)
        pj, qj = _U64(1), _U64(0)
        with np.errstate(over="ignore"):
            for j in range(block):
                p[j] = pj
                q[j] = qj
                qj = qj + pj
                pj = pj * _MULT
            i = 0
            while i < n:
                m = min(block, n - i)
                states = p[:m] * self._state + q[:m] * self._inc
                out[i : i + m] = _output_xsh_rr(states)
                # advance the scalar state by m draws
                self._state = pj * self._state + qj * self._inc if m == block else (
                    p[m - 1] * _MULT * self._state
                    + (q[m - 1] + p[m - 1]) * self._inc
                )
                i += m
        return out

    def integers(self, low: int, high: Optional[int] = None, size=None) -> np.ndarray:
        """Uniform ints in [low, high) (numpy-Generator-style convenience).

        Accepts scalar or tuple `size` (like uniform/normal). Unbiased for any
        span: Lemire multiply-shift with rejection of the biased low band."""
        if high is None:
            low, high = 0, low
        span = int(high) - int(low)
        if span <= 0:
            raise ValueError("high must be > low")
        n = int(np.prod(size)) if size is not None else 1
        words = self.random_raw(n)
        span64 = np.uint64(span)
        if span & (span - 1):  # non-power-of-two: reject the biased low band
            threshold = np.uint32((-span) % span)
            bad = (words.astype(np.uint64) * span64).astype(np.uint32) < threshold
            while bad.any():
                words[bad] = self.random_raw(int(bad.sum()))
                bad &= (words.astype(np.uint64) * span64).astype(
                    np.uint32
                ) < threshold
        vals = low + (words.astype(np.uint64) * span64 >> np.uint64(32)).astype(
            np.int64
        )
        if size is None:
            return int(vals[0])
        return vals.reshape(size)

    def uniform(self, low=0.0, high=1.0, size=None):
        """float32 uniforms in [low, high) (reference `uniform`, random.h:213)."""
        n = int(np.prod(size)) if size is not None else 1
        words = self.random_raw(n)
        u = (words >> _U32(8)).astype(np.float32) * np.float32(2.0**-24)
        vals = np.asarray(low, np.float32) + u * (
            np.asarray(high, np.float32) - np.asarray(low, np.float32)
        )
        if size is None:
            return float(vals[0])
        return vals.reshape(size)

    def normal(self, loc=0.0, scale=1.0, size=None):
        """float32 normals via Box-Muller (reference `normal`, random.h:262)."""
        n = int(np.prod(size)) if size is not None else 1
        m = (n + 1) // 2
        u1 = np.maximum(self.uniform(size=(m,)), np.float32(1e-12))
        u2 = self.uniform(size=(m,))
        r = np.sqrt(np.float32(-2.0) * np.log(u1))
        z = np.concatenate(
            [r * np.cos(np.float32(2 * np.pi) * u2),
             r * np.sin(np.float32(2 * np.pi) * u2)]
        )[:n].astype(np.float32)
        vals = np.asarray(loc, np.float32) + np.asarray(scale, np.float32) * z
        if size is None:
            return float(vals[0])
        return vals.reshape(size)


# --------------------------------------------------------------------------- #
# Free-function forms mirroring the reference's Eigen operators
# (`random.h:213-289`: `uniform(g)`, `uniform(g, lo, hi)`,
#  `uniform(nrows, ncols, g, lo, hi)`, same for `normal`).
# --------------------------------------------------------------------------- #


def uniform(*args, **kwargs):
    """uniform(g) / uniform(g, lo, hi) / uniform(nrows, ncols, g, lo, hi)."""
    if isinstance(args[0], PCG32):
        g, *rest = args
        lo = rest[0] if rest else kwargs.get("lo", 0.0)
        hi = rest[1] if len(rest) > 1 else kwargs.get("hi", 1.0)
        lo, hi = np.asarray(lo, np.float32), np.asarray(hi, np.float32)
        if lo.ndim == 0 and hi.ndim == 0:
            return g.uniform(float(lo), float(hi))
        shape = np.broadcast_shapes(lo.shape, hi.shape)
        return g.uniform(0.0, 1.0, size=shape) * (hi - lo) + lo
    nrows, ncols, g, *rest = args
    lo = rest[0] if rest else kwargs.get("lo", 0.0)
    hi = rest[1] if len(rest) > 1 else kwargs.get("hi", 1.0)
    return g.uniform(lo, hi, size=(int(nrows), int(ncols)))


def normal(*args, **kwargs):
    """normal(g) / normal(g, mean, std) / normal(nrows, ncols, g, mean, std)."""
    if isinstance(args[0], PCG32):
        g, *rest = args
        mean = rest[0] if rest else kwargs.get("mean", 0.0)
        std = rest[1] if len(rest) > 1 else kwargs.get("stddev", 1.0)
        mean, std = np.asarray(mean, np.float32), np.asarray(std, np.float32)
        if mean.ndim == 0 and std.ndim == 0:
            return g.normal(float(mean), float(std))
        shape = np.broadcast_shapes(mean.shape, std.shape)
        return g.normal(0.0, 1.0, size=shape) * std + mean
    nrows, ncols, g, *rest = args
    mean = rest[0] if rest else kwargs.get("mean", 0.0)
    std = rest[1] if len(rest) > 1 else kwargs.get("stddev", 1.0)
    return g.normal(mean, std, size=(int(nrows), int(ncols)))
