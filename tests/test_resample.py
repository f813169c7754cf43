"""Polyphase resampler: spectral fidelity + consensus conversion.

The reference never converts rates (its consensus pick at main.rs:91-105
plays mismatched files as-is); the TPU build resamples to consensus, so
correctness is pinned against analytic sinusoids: a resampled pure tone
must stay a pure tone of the same frequency with high SNR.
"""

import numpy as np
import pytest

from audio_decoder_tpu.dsp.resample import resample_batch, resample_to_consensus


def _tone(freq, rate, secs=0.5, ch=1):
    t = np.arange(int(rate * secs)) / rate
    s = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.repeat(s[None, :, None], ch, axis=2).astype(np.float32)


def _snr_vs_tone(y, freq, rate):
    """SNR of y against the best-fit sinusoid at freq (amplitude/phase
    solved by least squares, edges trimmed)."""
    n = y.shape[0]
    t = np.arange(n) / rate
    lo, hi = n // 8, n - n // 8
    basis = np.stack([np.sin(2 * np.pi * freq * t), np.cos(2 * np.pi * freq * t)], 1)
    coef, *_ = np.linalg.lstsq(basis[lo:hi], y[lo:hi], rcond=None)
    resid = y[lo:hi] - basis[lo:hi] @ coef
    sig = float((basis[lo:hi] @ coef).var())
    return 10 * np.log10(sig / max(float(resid.var()), 1e-30))


@pytest.mark.parametrize("src,dst", [
    (48000, 44100), (44100, 48000), (32000, 44100), (44100, 32000),
    (22050, 44100), (48000, 32000),
])
def test_tone_survives_resampling(src, dst):
    freq = 1000.0
    x = _tone(freq, src)
    y = np.asarray(resample_batch(x, src, dst))[0, :, 0]
    assert y.shape[0] >= int(0.49 * dst)
    snr = _snr_vs_tone(y, freq, dst)
    assert snr > 60.0, f"SNR {snr:.1f} dB"


def test_identity_when_rates_match():
    x = _tone(440, 44100)
    y = np.asarray(resample_batch(x, 44100, 44100))
    np.testing.assert_array_equal(y, x)


def test_consensus_resample_batch():
    import jax.numpy as jnp
    from audio_decoder_tpu.core.batch import AudioBatch

    rate_a, rate_b = 48000, 44100
    xa = _tone(1000, rate_a, 0.25, ch=2)[0]
    xb = _tone(1000, rate_b, 0.25, ch=2)[0]
    S = max(xa.shape[0], xb.shape[0])
    pcm = np.zeros((2, S, 2), np.float32)
    pcm[0, : xa.shape[0]] = xa
    pcm[1, : xb.shape[0]] = xb
    batch = AudioBatch.from_pcm(
        jnp.asarray(pcm),
        sample_rate=jnp.asarray([rate_a, rate_b], jnp.int32),
        num_channels=jnp.asarray([2, 2], jnp.int32),
        bits_per_sample=jnp.asarray([16, 16], jnp.int32),
        valid_frames=jnp.asarray([xa.shape[0], xb.shape[0]], jnp.int32),
        err=jnp.zeros(2, jnp.int32),
        names=("a", "b"),
        formats=("wav", "wav"),
    )
    out = resample_to_consensus(batch, rate_b)
    assert int(out.sample_rate[0]) == rate_b and int(out.sample_rate[1]) == rate_b
    ya = np.asarray(out.pcm[0, : int(out.valid_frames[0]), 0])
    snr = _snr_vs_tone(ya, 1000.0, rate_b)
    assert snr > 60.0, f"SNR {snr:.1f} dB"
    # file already at consensus is untouched
    yb = np.asarray(out.pcm[1, : xb.shape[0]])
    np.testing.assert_allclose(yb, xb, atol=0)


def test_route_channels_matrix():
    import numpy as np
    from audio_decoder_tpu.dsp.route import route_channels, routing_matrix

    rng = np.random.default_rng(11)
    pcm = rng.uniform(-0.4, 0.4, (2, 64, 2)).astype(np.float32)
    # stereo -> mono: equal-weight downmix
    mono = np.asarray(route_channels(pcm, 1))
    np.testing.assert_allclose(mono[..., 0], pcm.mean(-1), atol=1e-6)
    # mono -> stereo: fan-out (engine.rs:419-427 semantics)
    st = np.asarray(route_channels(pcm[..., :1], 2))
    np.testing.assert_allclose(st[..., 0], st[..., 1])
    np.testing.assert_allclose(st[..., 0], pcm[..., 0], atol=1e-6)
    # identity
    same = np.asarray(route_channels(pcm, 2))
    np.testing.assert_allclose(same, pcm, atol=1e-6)
    # matrix shapes + clipping
    assert routing_matrix(4, 2).shape == (4, 2)
    loud = np.full((1, 8, 1), 0.9, np.float32)
    assert np.asarray(route_channels(loud, 2)).max() <= 1.0


def test_top_level_api_surface():
    import audio_decoder_tpu as adt

    for name in ("decode_dir", "decode_paths", "scan_assets",
                 "consensus_for", "resample_to_consensus",
                 "route_channels", "Engine"):
        assert callable(getattr(adt, name)), name


def test_resample_length_policy():
    import numpy as np
    import jax.numpy as jnp
    from audio_decoder_tpu.core.batch import AudioBatch
    from audio_decoder_tpu.dsp.resample import resample_to_consensus

    B, S, C = 1, 1000, 1
    pcm = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, (B, S, C)),
                      jnp.float32)
    batch = AudioBatch.from_pcm(
        pcm, sample_rate=jnp.asarray([22050]),
        num_channels=jnp.asarray([1]), bits_per_sample=jnp.asarray([16]),
        valid_frames=jnp.asarray([999]), err=jnp.asarray([0]),
        names=("a",), formats=("wav",),
    )
    flo = resample_to_consensus(batch, 44100, length="floor")
    exa = resample_to_consensus(batch, 44100, length="exact")
    assert int(flo.valid_frames[0]) == 999 * 2  # (999//1)*2, M=1 L=2
    assert int(exa.valid_frames[0]) == 1998
    # a ratio with M>1: 48000->44100 is L=147 M=160
    batch48 = AudioBatch.from_pcm(
        pcm, sample_rate=jnp.asarray([48000]),
        num_channels=jnp.asarray([1]), bits_per_sample=jnp.asarray([16]),
        valid_frames=jnp.asarray([999]), err=jnp.asarray([0]),
        names=("a",), formats=("wav",),
    )
    flo = resample_to_consensus(batch48, 44100, length="floor")
    exa = resample_to_consensus(batch48, 44100, length="exact")
    assert int(flo.valid_frames[0]) == (999 // 160) * 147
    assert int(exa.valid_frames[0]) == min(-(-999 * 147 // 160),
                                           (1000 // 160) * 147)
