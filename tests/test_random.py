"""PCG32 generator + uniform/normal sampling helpers (utils.random).

Reference: `core/include/jiminy/core/utilities/random.h:37-289` (PCG32 class,
vectorized uniform/normal operators). Ground truth for the generator is the
published pcg32 demo output (PCG-XSH-RR 64/32, seed 42 / stream 54).
"""

import numpy as np
import pytest

from jiminy_tpu.utils.random import PCG32, normal, uniform

# First six outputs of the canonical pcg32 demo (pcg-random.org sample code,
# `pcg32_srandom_r(&rng, 42u, 54u)` "Round 1").
_PCG32_DEMO_42_54 = [0xA15C02B7, 0x7B47F409, 0xBA1D3330, 0x83D2F293,
                     0xBFA4784B, 0xCBED606E]


def test_pcg32_known_vectors():
    g = PCG32(42, 54)
    assert [g() for _ in range(6)] == _PCG32_DEMO_42_54


def test_pcg32_vectorized_matches_sequential():
    g1, g2 = PCG32(123, 7), PCG32(123, 7)
    seq = np.array([g1() for _ in range(3000)], np.uint32)
    vec = g2.random_raw(3000)
    np.testing.assert_array_equal(seq, vec)
    # Both generators left in the same state
    assert g1() == g2()


def test_pcg32_advance():
    g1, g2 = PCG32(99), PCG32(99)
    for _ in range(12345):
        g1()
    g2.advance(12345)
    assert g1() == g2()


def test_pcg32_streams_and_determinism():
    assert [PCG32(5, 1)() for _ in range(4)] == [PCG32(5, 1)() for _ in range(4)]
    a = PCG32(5, 1).random_raw(64)
    b = PCG32(5, 2).random_raw(64)
    assert np.any(a != b)


def test_uniform_range_and_shape():
    g = PCG32(0)
    x = g.uniform(-2.0, 3.0, size=(1000,))
    assert x.dtype == np.float32 and x.shape == (1000,)
    assert np.all(x >= -2.0) and np.all(x < 3.0)
    assert abs(float(x.mean()) - 0.5) < 0.2
    m = uniform(4, 5, g, 1.0, 2.0)
    assert m.shape == (4, 5) and np.all((m >= 1.0) & (m < 2.0))
    # scalar + elementwise-bounds forms
    s = uniform(g)
    assert 0.0 <= s < 1.0
    lohi = uniform(g, np.zeros(3, np.float32), np.array([1.0, 2.0, 3.0], np.float32))
    assert lohi.shape == (3,) and np.all(lohi < np.array([1.0, 2.0, 3.0]))


def test_normal_moments():
    g = PCG32(1234)
    z = g.normal(1.5, 0.5, size=(20000,))
    assert z.dtype == np.float32
    assert abs(float(z.mean()) - 1.5) < 0.02
    assert abs(float(z.std()) - 0.5) < 0.02
    m = normal(3, 2, g, 0.0, 1.0)
    assert m.shape == (3, 2)
    elt = normal(g, np.array([0.0, 10.0], np.float32), np.float32(1e-3))
    assert elt.shape == (2,) and abs(float(elt[1]) - 10.0) < 0.1


def test_integers():
    g = PCG32(7)
    v = g.integers(10, 20, size=200)
    assert v.min() >= 10 and v.max() < 20
    assert isinstance(g.integers(5), int)


def test_seed_sequence():
    a = PCG32([1, 2, 3]).random_raw(8)
    b = PCG32([1, 2, 3]).random_raw(8)
    c = PCG32([1, 2, 4]).random_raw(8)
    np.testing.assert_array_equal(a, b)
    assert np.any(a != c)


def test_uniform_bit_exact_float_mapping():
    """uniform() maps the top 24 bits to [0,1) float32 (no double rounding)."""
    g = PCG32(42, 54)
    w = PCG32(42, 54).random_raw(16)
    u = g.uniform(size=(16,))
    np.testing.assert_array_equal(u, (w >> np.uint32(8)).astype(np.float32) * 2.0**-24)


def test_integers_tuple_size_and_uniformity():
    g = PCG32(11)
    v = g.integers(0, 6, size=(2, 3))
    assert v.shape == (2, 3)
    assert v.min() >= 0 and v.max() < 6
    # Unbiased for non-power-of-two spans (Lemire + rejection): all residues
    # of a span-3 draw appear with near-equal frequency.
    big = g.integers(0, 3, size=30000)
    counts = np.bincount(big, minlength=3)
    assert counts.min() > 9500
    with np.testing.assert_raises(ValueError):
        g.integers(5, 5)
