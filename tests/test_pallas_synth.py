"""Pallas fused polyphase synthesis vs the XLA formulation (interpret
mode on CPU; the TPU path is exercised by the benchmark/verify runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_decoder_tpu.codecs.mpeg import tables as T
from audio_decoder_tpu.codecs.mpeg.dsp import _G2
from audio_decoder_tpu.ops.pallas_synth import TILE_T, polyphase_synthesis_pallas


def _xla_reference(TS):
    prec = jax.lax.Precision.HIGHEST
    V = jnp.einsum("btk,nk->btn", TS, jnp.asarray(T.SYNTH_N, jnp.float32),
                   precision=prec)
    Vp = jnp.pad(V, ((0, 0), (15, 0), (0, 0)))
    out = jnp.zeros(TS.shape, jnp.float32)
    g2 = jnp.asarray(_G2, jnp.float32)
    Tn = TS.shape[1]
    for k in range(16):
        seg = jax.lax.dynamic_slice_in_dim(Vp, 15 - k, Tn, axis=1)
        half = seg[..., :32] if k % 2 == 0 else seg[..., 32:]
        out = out + g2[k] * half
    return out


@pytest.mark.parametrize("bc,tiles", [(2, 1), (3, 2)])
def test_pallas_matches_xla(bc, tiles):
    rng = np.random.default_rng(13)
    TS = jnp.asarray(rng.standard_normal((bc, tiles * TILE_T, 32)),
                     jnp.float32)
    got = polyphase_synthesis_pallas(
        TS, jnp.asarray(T.SYNTH_N, jnp.float32),
        jnp.asarray(_G2, jnp.float32), interpret=True)
    want = _xla_reference(TS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)
