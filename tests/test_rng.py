"""xoroshiro128+ host RNG (≙ blast_rand.rs) against known vectors."""

import numpy as np

from audio_decoder_tpu.utils.rng import X128P, splitmix64


def test_splitmix64_known_vectors():
    # published splitmix64 outputs for seed 0
    g = splitmix64(0)
    assert next(g) == 0xE220A8397B1DCDAF
    assert next(g) == 0x6E789E6AA1B965F4
    assert next(g) == 0x06C45D188009454F


def test_xoroshiro_statistics_and_determinism():
    a, b = X128P(seed=42), X128P(seed=42)
    seq = [a.next_u64() for _ in range(1000)]
    assert seq == [b.next_u64() for _ in range(1000)]
    f = np.array([X128P(seed=7).next_f64() for _ in range(1)])
    xs = X128P(seed=7)
    fs = np.array([xs.next_f64() for _ in range(10000)])
    assert 0.0 <= fs.min() and fs.max() < 1.0
    assert abs(fs.mean() - 0.5) < 0.02


def test_lemire_range_reduction():
    r = X128P(seed=3)
    vals = [r.next_range(10, 20) for _ in range(5000)]
    assert min(vals) >= 10 and max(vals) < 20
    counts = np.bincount(np.array(vals) - 10, minlength=10)
    assert counts.min() > 300  # roughly uniform
