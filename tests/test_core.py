"""Core containers, error taxonomy, and aux utilities."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.core.batch import AudioBatch, concat_batches
from audio_decoder_tpu.utils.trace import Tracer


def _batch(n, frames, ch, rate=44100, err=None):
    rng = np.random.default_rng(n * 7 + frames)
    return AudioBatch.from_pcm(
        jnp.asarray(rng.standard_normal((n, frames, ch)), jnp.float32) * 0.1,
        sample_rate=jnp.full((n,), rate, jnp.int32),
        num_channels=jnp.full((n,), ch, jnp.int32),
        bits_per_sample=jnp.full((n,), 16, jnp.int32),
        valid_frames=jnp.full((n,), frames, jnp.int32),
        err=jnp.asarray(err if err is not None else [0] * n, jnp.int32),
        names=tuple(f"t{i}" for i in range(n)),
        formats=("wav",) * n,
    )


def test_audio_batch_views_and_seconds():
    b = _batch(3, 441, 2)
    f = b.file(1)
    assert f.file_name == "t1" and f.sample_rate == 44100
    assert f.pcm.shape == (441, 2)
    inter = f.interleaved_i16
    assert inter.shape == (441 * 2,) and inter.dtype == np.int16
    secs = float(b.audio_seconds())
    assert secs == pytest.approx(3 * 441 / 44100, abs=1e-6)


def test_audio_seconds_masks_errors():
    b = _batch(2, 441, 1, err=[0, E.ERR_INVALID])
    assert float(b.audio_seconds()) == pytest.approx(441 / 44100, abs=1e-6)


def test_concat_batches_pads_shapes():
    a = _batch(1, 100, 1)
    b = _batch(2, 300, 2)
    m = concat_batches([a, b])
    assert m.pcm.shape == (3, 300, 2)
    assert m.names == ("t0", "t0", "t1")
    np.testing.assert_array_equal(
        np.asarray(m.pcm[0, :100, :1]), np.asarray(a.pcm[0])
    )
    assert np.all(np.asarray(m.pcm[0, 100:, :]) == 0)


def test_batch_is_a_pytree():
    import jax

    b = _batch(2, 64, 1)
    leaves = jax.tree_util.tree_leaves(b)
    assert len(leaves) == 6  # six array fields; names/formats are static
    b2 = jax.tree_util.tree_map(lambda x: x, b)
    assert b2.names == b.names


def test_error_taxonomy_roundtrip():
    assert E.code_name(E.ERR_EOF) == "UnexpectedEof"
    with pytest.raises(E.UnexpectedEofError):
        E.raise_for_code(E.ERR_EOF, "boom")
    with pytest.raises(E.UnsupportedFormatError):
        E.raise_for_code(E.ERR_UNSUPPORTED)
    E.raise_for_code(E.ERR_OK)  # no-op
    assert E.UnsupportedFormatError("x").code == E.ERR_UNSUPPORTED


def test_tracer_counts_and_reports():
    t = Tracer()
    with t.stage("decode", items=10.0):
        pass
    with t.stage("decode", items=5.0):
        pass
    t.add("decode", 1.0)
    s = t.stats["decode"]
    assert s.calls == 2 and s.items == 16.0 and s.rate > 0
    assert "decode" in t.report()


def test_wav_g711_companded_decode():
    """A-law / mu-law WAV (format codes 6/7): G.711 expansion matches the
    stdlib audioop tables exactly.  The reference enumerates these codes
    but never decodes them (wav.rs:9-28)."""
    audioop = pytest.importorskip("audioop")  # removed in py3.13

    from audio_decoder_tpu.codecs.registry import decode_assets
    from audio_decoder_tpu.io.assets import Asset
    from .synth import make_wav

    raw = bytes(range(256)) * 4  # every code point, stereo frames
    assets = []
    for code, name in ((6, "alaw"), (7, "ulaw")):
        blob = make_wav(
            np.zeros((len(raw) // 2, 2), np.int16), 8000, bits=8,
            fmt_code_override=code, data_override=raw,
        )
        assets.append(Asset(path=name, name=name, ext="wav", data=blob))
    batch = decode_assets(assets)
    for i, conv in enumerate((audioop.alaw2lin, audioop.ulaw2lin)):
        f = batch.file(i)
        assert f.err == 0 and f.num_channels == 2
        ref = np.frombuffer(conv(raw, 2), "<i2").astype(np.float32) / 32768.0
        got = np.asarray(f.pcm[: len(raw) // 2]).reshape(-1)
        np.testing.assert_allclose(got, ref, atol=1e-7)


def test_aifc_none_and_sowt():
    """AIFF-C: 'NONE' (big-endian) and 'sowt' (little-endian) PCM decode;
    unknown compression types surface as unsupported.  The reference
    predates AIFC entirely (aiff.rs:99-183)."""
    from audio_decoder_tpu.codecs.registry import decode_assets
    from audio_decoder_tpu.core import errors as E
    from audio_decoder_tpu.io.assets import Asset
    from .synth import make_aiff

    rng = np.random.default_rng(31)
    pcm = np.clip(rng.standard_normal((777, 2)) * 9000, -32768, 32767).astype(
        np.int16
    )
    batch = decode_assets([
        Asset(path="p", name="p", ext="aif", data=make_aiff(pcm, 44100)),
        Asset(path="n", name="n", ext="aif",
              data=make_aiff(pcm, 44100, compression=b"NONE")),
        Asset(path="s", name="s", ext="aif",
              data=make_aiff(pcm, 44100, compression=b"sowt")),
        Asset(path="x", name="x", ext="aif",
              data=make_aiff(pcm, 44100, compression=b"MAC3")),
    ])
    errs = np.asarray(batch.err)
    assert tuple(errs) == (0, 0, 0, E.ERR_UNSUPPORTED)
    ref = np.asarray(batch.file(0).pcm)
    for i in (1, 2):
        f = batch.file(i)
        assert f.sample_rate == 44100 and f.pcm.shape[0] == 777
        np.testing.assert_array_equal(np.asarray(f.pcm), ref)


def test_aifc_g711_companded_decode():
    """AIFF-C 'ulaw'/'alaw' (G.711, 1 stored byte per sample while COMM
    declares the decoded 16-bit width): expansion matches the stdlib
    audioop tables exactly, through the same device LUTs as the WAV
    format codes.  The reference predates AIFC (aiff.rs:99-183)."""
    audioop = pytest.importorskip("audioop")  # removed in py3.13

    from audio_decoder_tpu.codecs.registry import decode_assets
    from audio_decoder_tpu.io.assets import Asset
    from .synth import make_aiff

    raw = bytes(range(256)) * 4  # every code point, stereo frames
    assets = []
    for comp in (b"alaw", b"ULAW"):  # both case variants in one pass
        blob = make_aiff(
            np.zeros((0, 2), np.int16), 8000, bits=16, compression=comp,
            data_override=raw, frames_override=len(raw) // 2,
        )
        assets.append(Asset(path=comp.decode(), name=comp.decode(),
                            ext="aifc", data=blob))
    batch = decode_assets(assets)
    for i, conv in enumerate((audioop.alaw2lin, audioop.ulaw2lin)):
        f = batch.file(i)
        assert f.err == 0 and f.num_channels == 2
        assert f.bits_per_sample == 16  # COMM's decoded width is reported
        ref = np.frombuffer(conv(raw, 2), "<i2").astype(np.float32) / 32768.0
        got = np.asarray(f.pcm[: len(raw) // 2]).reshape(-1)
        np.testing.assert_allclose(got, ref, atol=1e-7)


def test_model_registry_is_the_dispatch_surface():
    """Every model carries a REAL decode_group callable (no None
    capability stubs) and decoding through the registry entry matches
    the front-door path."""
    import numpy as np
    from audio_decoder_tpu import models
    from audio_decoder_tpu.io.assets import Asset
    from .synth import make_wav

    for m in models.MODELS.values():
        assert callable(m.decode_group), m.name
        assert m.extensions
    assert models.for_extension("WAV").name == "wav"
    assert models.for_extension("aiff").name == "aiff"
    assert models.for_extension("mp2").name == "mp3"
    assert models.for_extension("xyz") is None

    pcm = np.zeros((300, 1), np.int16)
    pcm[0, 0] = 1234
    a = Asset(path="t", name="t", ext="wav", data=make_wav(pcm, 44100))
    pieces = models.MODELS["wav"].decode_group([a])
    (idxs, batch), = pieces
    assert idxs == [0]
    got = np.round(np.asarray(batch.pcm[0, :300]) * 32768.0).astype(np.int16)
    np.testing.assert_array_equal(got, pcm)


def test_flat_device_layout_invariants():
    """AudioBatch stores PCM flat interleaved (core/batch.py): data is
    [B, S*C] (TPU tile-friendly — a trailing channel dim would pad
    64-128x), .pcm is the free planar view, and from_pcm round-trips."""
    b = _batch(2, 200, 2)
    assert b.data.ndim == 2 and b.data.shape == (2, 400)
    assert b.channels == 2 and b.max_frames == 200 and b.max_channels == 2
    # the planar view is the C-order reshape of the flat rows
    np.testing.assert_array_equal(
        np.asarray(b.pcm), np.asarray(b.data).reshape(2, 200, 2))
    # interleaving: (frame s, channel c) sits at flat index s*C + c
    np.testing.assert_array_equal(
        np.asarray(b.pcm[0, 3, 1]), np.asarray(b.data[0, 3 * 2 + 1]))
    # from_pcm(planar) -> identical flat storage
    import jax.numpy as jnp

    b2 = AudioBatch.from_pcm(
        b.pcm, sample_rate=b.sample_rate, num_channels=b.num_channels,
        bits_per_sample=b.bits_per_sample, valid_frames=b.valid_frames,
        err=b.err, names=b.names, formats=b.formats)
    assert b2.channels == 2
    np.testing.assert_array_equal(np.asarray(b2.data), np.asarray(b.data))
    # file() trims from the flat row without a device-side 3-D relayout
    f = b.file(1)
    np.testing.assert_array_equal(
        f.pcm, np.asarray(b.data[1]).reshape(200, 2))
    # mono stored in stereo storage: file() trims the channel axis too
    wide = AudioBatch(
        data=jnp.asarray(np.arange(12, dtype=np.float32)[None] / 16.0),
        sample_rate=jnp.asarray([8000]), num_channels=jnp.asarray([1]),
        bits_per_sample=jnp.asarray([16]), valid_frames=jnp.asarray([5]),
        err=jnp.asarray([0]), names=("m",), formats=("wav",), channels=2)
    fm = wide.file(0)
    assert fm.pcm.shape == (5, 1)
    np.testing.assert_array_equal(
        fm.pcm[:, 0], np.arange(0, 10, 2, dtype=np.float32) / 16.0)
