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


@pytest.mark.parametrize("seed,Wa,Wb", [(5, 256, 8), (6, 520, 96)])
def test_window_add2_matches_two_passes(seed, Wa, Wb):
    """Two lane sets fused into one kernel invocation == the sum of two
    single-set passes (the FLAC value-assembly (rice, fixed-width)
    pair, different window widths per set)."""
    from audio_decoder_tpu.ops.window_add import window_add2

    rng = np.random.default_rng(seed)
    sa, ua, na = _case(rng, 192, Wa, 150, tile_elems=512)
    sb, ub, nb = _case(rng, 64, Wb, 40, tile_elems=512)
    n_out = max(na, nb)
    got = window_add2(jnp.asarray(sa), jnp.asarray(ua),
                      jnp.asarray(sb), jnp.asarray(ub), n_out,
                      interpret=True)
    want = (np.asarray(_oracle(sa, ua, n_out)).astype(np.int64)
            + np.asarray(_oracle(sb, ub, n_out)).astype(np.int64))
    np.testing.assert_array_equal(np.asarray(got).astype(np.int64), want)


def test_packer_emits_monotonic_starts():
    """The kernel's sortedness contract at the packer boundary: for a
    real multi-file group (native walk when built, else the Python
    walk), the rice/fixed-width/frame window starts the device assembly
    derives from pack_group's arrays are non-decreasing over LIVE lanes
    — the invariant window_add's running-max normalization relies on
    (advisor r4: it silently re-points ANY out-of-order lane)."""
    from audio_decoder_tpu.codecs.flac import decoder as FD
    from audio_decoder_tpu.codecs.flac import frontend as FF
    from audio_decoder_tpu.codecs.flac.encode import encode_flac

    rng = np.random.default_rng(9)
    analyses = []
    for i in range(3):
        x = (np.sin(np.arange(4000) * (0.02 + 0.003 * i)) * 8000
             + rng.standard_normal(4000) * 20)
        pcm = np.stack([x, 0.7 * x], 1).astype(np.float32) / 2.0 ** 15
        analyses.append(FF.analyze(encode_flac(pcm, 44100, bits=16,
                                               blocksize=1024)))
    args, statics = FD.pack_group(analyses)
    (bytes_u8, file_off, file_bits,
     rl_file, rl_sub, rl_bitpos, rl_count, rl_param, rl_dest,
     fw_file, fw_sub, fw_bitpos, fw_count, fw_width, fw_dest,
     dv_sub, dv_dest, dv_val,
     sub_kind, sub_order, sub_shift, sub_wasted, coeffs,
     fr_file, fr_start, fr_n, fr_mode, fr_scale) = [
        np.asarray(a) for a in args]
    nmax = statics["nmax"]
    ch = statics["channels"]
    n_rl = sum(a.rl_sub.size for a in analyses)
    n_fw = sum(a.fw_sub.size for a in analyses)
    n_fr = sum(a.n_frames for a in analyses)
    rl_starts = (rl_sub * (nmax + 1) + rl_dest)[:n_rl]
    fw_starts = (fw_sub * (nmax + 1) + fw_dest)[:n_fw]
    smax = statics["smax"]
    fr_starts = (fr_file * (smax * ch) + fr_start * ch)[:n_fr]
    assert (np.diff(rl_starts) >= 0).all(), "rice lane starts not sorted"
    assert (np.diff(fw_starts) >= 0).all(), "fw lane starts not sorted"
    assert (np.diff(fr_starts) >= 0).all(), "frame starts not sorted"
