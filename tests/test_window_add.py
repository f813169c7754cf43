"""ops.window_add (Pallas window scatter-add) vs the XLA scatter oracle.

The kernel is the TPU path of codecs/flac/device._window_add; these
tests run it in interpret mode on CPU against lax.scatter_add at the
same contract (sorted live starts, zero-masked updates, tail slack).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from audio_decoder_tpu.ops.window_add import window_add


def _oracle(starts, upd, n_out):
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    x = jnp.zeros((n_out,), upd.dtype)
    return lax.scatter_add(
        x, jnp.asarray(starts)[:, None], jnp.asarray(upd), dn,
        indices_are_sorted=False, unique_indices=False,
        mode=lax.GatherScatterMode.CLIP)


def _case(rng, L, W, n_live, tile_elems, dtype=np.int32):
    """Random tiling windows: live lanes tile [0, X) contiguously (the
    FLAC layout), padding lanes at the tail with start 0."""
    counts = rng.integers(0, W + 1, size=n_live)
    starts = np.zeros(L, np.int32)
    at = 0
    for i in range(n_live):
        starts[i] = at
        at += int(counts[i])
    n_out = at + W + rng.integers(0, 3 * tile_elems)  # tail slack >= W
    if dtype == np.int32:
        upd = rng.integers(-10**6, 10**6, size=(L, W)).astype(dtype)
    else:
        upd = rng.standard_normal((L, W)).astype(dtype)
    live = np.arange(W)[None, :] < counts[:, None]
    upd[:n_live] = np.where(live, upd[:n_live], 0)
    upd[n_live:] = 0
    return starts, upd, int(n_out)


@pytest.mark.parametrize("seed,L,W,n_live", [
    (0, 64, 8, 50),        # tiny widths (fw warmup shape)
    (1, 256, 96, 200),     # W not a multiple of 512
    (2, 512, 512, 512),    # exact rice shape, no padding lanes
    (3, 300, 520, 211),    # W just past one sublane row
    (4, 40, 1536, 17),     # multi-row windows (KU=3)
])
def test_matches_scatter(seed, L, W, n_live):
    rng = np.random.default_rng(seed)
    starts, upd, n_out = _case(rng, L, W, n_live, tile_elems=512)
    got = window_add(jnp.asarray(starts), jnp.asarray(upd), n_out,
                     interpret=True)
    want = _oracle(starts, upd, n_out)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_f32_frame_assembly_shape():
    """f32 PCM-assembly shape: wide windows, few lanes."""
    rng = np.random.default_rng(7)
    starts, upd, n_out = _case(rng, 48, 2048, 31, tile_elems=512,
                               dtype=np.float32)
    got = window_add(jnp.asarray(starts), jnp.asarray(upd), n_out,
                     interpret=True)
    want = _oracle(starts, upd, n_out)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cross_tile_halo():
    """Windows straddling TILE_R*512 boundaries land exactly once."""
    from audio_decoder_tpu.ops.window_add import TILE_R
    tile = TILE_R * 512
    W = 512
    starts = np.asarray([0, tile - 100, tile - 1, 2 * tile - W + 1],
                        np.int32)
    rng = np.random.default_rng(11)
    upd = rng.integers(-9, 9, size=(4, W)).astype(np.int32)
    n_out = 2 * tile + W
    got = window_add(jnp.asarray(starts), jnp.asarray(upd), n_out,
                     interpret=True)
    want = _oracle(starts, upd, n_out)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
