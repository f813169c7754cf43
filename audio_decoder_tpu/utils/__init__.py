"""Utilities: RNG, tracing."""
from .rng import X128P, fast_seed, splitmix64

__all__ = ["X128P", "fast_seed", "splitmix64"]
