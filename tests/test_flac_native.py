"""Native flacfe core vs the pure-Python walk — field-for-field parity.

The C library (native/flacfe.cc) accelerates rice-run skipping and the
frame CRCs inside ``frontend.analyze``; the Python implementations are
the behavioral contract.  These tests run the SAME streams through both
paths and require identical lane descriptors, including the host-split
quotient outliers (q > Q_CAP) the device lane plan depends on.
"""

from __future__ import annotations

import numpy as np
import pytest

from audio_decoder_tpu.codecs.flac import frontend
from audio_decoder_tpu.codecs.flac import native as FN

from . import flac_writer as FW
from .test_flac_oracle import SUBFRAME_CASES, _material


def _analyze_both(monkeypatch, blob):
    a_native = frontend.analyze(blob)  # whole-file C walker when built
    monkeypatch.setattr(frontend._native, "walk_batch",
                        lambda *a, **k: None)
    monkeypatch.setattr(frontend._native, "skip_rice",
                        lambda *a, **k: None)
    monkeypatch.setattr(frontend._native, "crc8", lambda *a: None)
    monkeypatch.setattr(frontend._native, "crc16", lambda *a: None)
    a_python = frontend.analyze(blob)
    return a_native, a_python


def _assert_same(a, b):
    for f in ("blocksizes", "starts", "ch_mode", "sub_kind", "sub_order",
              "sub_shift", "sub_wasted", "sub_coeffs", "rl_sub",
              "rl_bitpos", "rl_count", "rl_param", "rl_dest", "fw_sub",
              "fw_bitpos", "fw_count", "fw_width", "fw_dest", "dv_sub",
              "dv_dest", "dv_val"):
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f)
    assert (a.channels, a.bits, a.total) == (b.channels, b.bits, b.total)


def test_native_available():
    # the environment ships g++; the fast path must actually build here
    assert FN.available()


def test_skip_rice_parity_feature_matrix(monkeypatch, rng):
    kinds = [kw for _, kw in SUBFRAME_CASES]
    x = _material(rng, frames=2100)
    blob = FW.encode_file(x, 44100, 16, blocksize=256, stereo="mid_side",
                          subframe_kw=kinds)
    _assert_same(*_analyze_both(monkeypatch, blob))


def test_skip_rice_parity_outliers(monkeypatch, rng):
    """Quotient outliers (q > Q_CAP): the native walk must report the
    exact same (index, end position, value) splits as the Python walk."""
    x = _material(rng, frames=2500, hi=1 << 23)
    kw = dict(kind="lpc", lpc_coefs=[1200, -600, 300, -100], lpc_shift=10)
    blob = FW.encode_file(x, 44100, 24, blocksize=1024, stereo="mid_side",
                          subframe_kw=kw)
    a, b = _analyze_both(monkeypatch, blob)
    assert a.dv_val.size > 0
    _assert_same(a, b)


def test_skip_rice_parity_forced_params(monkeypatch, rng):
    """Force bad rice parameters (k=0 on noisy data → long unary runs,
    incl. runs crossing 56-bit scan windows) and a zero-parameter
    constant section."""
    x = _material(rng, frames=700, hi=300)
    x[:256] = 5  # constant-ish section → huge q at k=0 stays small here
    for p in (0, 1, 3):
        blob = FW.encode_file(x, 44100, 16, blocksize=256,
                              subframe_kw=dict(kind="fixed", order=1,
                                               force_param=p))
        _assert_same(*_analyze_both(monkeypatch, blob))


def test_truncation_error_parity(monkeypatch, rng):
    """Truncated streams must raise the same error taxonomy through the
    native path (it declines EOF-crossing runs; Python raises)."""
    from audio_decoder_tpu.core import errors as E

    x = _material(rng, frames=900)
    blob = FW.encode_file(x, 44100, 16, blocksize=448)
    for cut in (len(blob) - 1, len(blob) - 7, len(blob) * 3 // 4):
        try:
            frontend.analyze(blob[:cut])
            native_err = None
        except E.DecodeError as e:
            native_err = type(e)
        monkeypatch.setattr(frontend._native, "walk_batch",
                            lambda *a, **k: None)
        monkeypatch.setattr(frontend._native, "skip_rice",
                            lambda *a, **k: None)
        try:
            frontend.analyze(blob[:cut])
            python_err = None
        except E.DecodeError as e:
            python_err = type(e)
        monkeypatch.undo()
        assert native_err == python_err, cut


def test_whole_file_walker_serves_analyze(rng):
    """The session walker (flacfe_walk_open) must actually serve the
    walk — exactly one native whole-file walk per analyze, pinned by the
    flacfe_walks counter the way mp3fe_frame_walks pins the MPEG walk."""
    if not FN.available():
        pytest.skip("native library not built")
    x = _material(rng, frames=3000)
    blob = FW.encode_file(x, 44100, 16, blocksize=512)
    w0 = FN.walks()
    frontend.analyze(blob)
    assert FN.walks() == w0 + 1
    frontend.analyze_batch([blob] * 5)
    assert FN.walks() == w0 + 6


def test_analyze_batch_mixed_errors(monkeypatch, rng):
    """A batch with corrupt members: clean files ride the C walker and
    match the pure-Python walk field-for-field; rejected files surface
    the same DecodeError type the Python walk raises."""
    from audio_decoder_tpu.core import errors as E

    kinds = [kw for _, kw in SUBFRAME_CASES]
    x = _material(rng, frames=2100)
    good = FW.encode_file(x, 44100, 16, blocksize=256, stereo="mid_side",
                          subframe_kw=kinds)
    bad_trunc = good[: len(good) * 2 // 3]
    bad_magic = b"XXXX" + good[4:]
    bad_crc = bytearray(good)
    bad_crc[-40] ^= 0x10  # flip a bit inside the last frame body
    batch = [good, bad_trunc, good, bytes(bad_crc), bad_magic]
    res = frontend.analyze_batch(batch)
    assert isinstance(res[0], frontend.FlacAnalysis)
    assert isinstance(res[2], frontend.FlacAnalysis)
    assert isinstance(res[1], E.DecodeError)
    assert isinstance(res[3], E.InvalidDataError)
    assert isinstance(res[4], E.InvalidDataError)

    monkeypatch.setattr(frontend._native, "walk_batch",
                        lambda *a, **k: None)
    monkeypatch.setattr(frontend._native, "skip_rice",
                        lambda *a, **k: None)
    monkeypatch.setattr(frontend._native, "crc8", lambda *a: None)
    monkeypatch.setattr(frontend._native, "crc16", lambda *a: None)
    res_py = frontend.analyze_batch(batch)
    for r_n, r_p in zip(res, res_py):
        if isinstance(r_p, E.DecodeError):
            assert type(r_n) is type(r_p)
        else:
            _assert_same(r_n, r_p)
            assert (r_n.sample_rate, r_n.md5) == (r_p.sample_rate, r_p.md5)


def test_crc_parity(rng):
    data = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
    from audio_decoder_tpu.codecs.flac.frontend import _crc_tables
    _crc_tables()
    r8 = 0
    for bt in data:
        r8 = int(frontend._CRC8_TAB[r8 ^ bt])
    r16 = 0
    for bt in data:
        r16 = int(frontend._CRC16_TAB[(r16 >> 8) ^ bt]) ^ ((r16 << 8) & 0xFFFF)
    if FN.available():
        assert FN.crc8(data) == r8
        assert FN.crc16(data) == r16
    assert frontend.crc8(data) == r8
    assert frontend.crc16(data) == r16
