"""Scalar NumPy MPEG Layer I / Layer II decode oracle.

Frame parse (allocation, scfsi, scalefactors, grouped/ungrouped sample
codes), ISO 2.4.3.2/2.4.3.3 requantization, and the shared polyphase
synthesis filterbank (reused from the Layer III oracle).  Ground truth for
the batched TPU Layer I/II decoder; itself validated against mpg123 on
twolame streams in tests/test_layer12.py.

The reference's mpeg.rs frames all three layers but decodes none
(blast/src/main.rs:44-54) — Layers I/II are green-field like Layer III.
"""

from __future__ import annotations

import numpy as np

from audio_decoder_tpu.codecs.mpeg import layer12_tables as LT

from .mp3_oracle import Bits, _Synth, find_frames

_SF = LT.scalefactors()


def _select_table(h: dict) -> tuple:
    """Allocation table + sblimit for a Layer II frame."""
    if h["version"] != 3:
        return LT.ALLOC_TABLES[4], LT.SBLIMIT[4]
    sfreq = {44100: 0, 48000: 1, 32000: 2}[h["sr"]]
    br_idx = _bitrate_index(h)
    t = LT.TRANSLATE[sfreq][2 - h["channels"]][br_idx]
    return LT.ALLOC_TABLES[t], LT.SBLIMIT[t]


def _bitrate_index(h: dict) -> int:
    """Recover the header bitrate index from the decoded bitrate."""
    from audio_decoder_tpu.codecs.mpeg import tables as T

    col = T.bitrate_column(h["version"], h["layer"])
    for i in range(14):
        if int(T.BITRATE_KBPS[i][col]) * 1000 == h["bitrate"]:
            return i + 1
    return 0


def _dequant(code: int, steps: int, nb: int) -> float:
    """ISO 2.4.3.3: s'' = C(s''' + D), s''' = MSB-inverted fraction."""
    c, d = LT.CD[steps]
    frac = code / (1 << (nb - 1)) - 1.0  # two's-complement fraction of
    # the MSB-inverted code == plain code offset by -1
    return c * (frac + d)


def _degroup(code: int, steps: int) -> list[int]:
    return [code % steps, (code // steps) % steps, (code // steps**2) % steps]


def _group_nb(steps: int) -> int:
    return {3: 2, 5: 3, 9: 4}[steps]


def decode_l2(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG Layer II stream → (pcm [N, ch] f32, sample_rate)."""
    frames = [(p, h) for p, h in find_frames(blob) if h["layer"] == 2]
    if not frames:
        raise ValueError("no Layer II frames")
    h0 = frames[0][1]
    sr, ch = h0["sr"], h0["channels"]
    synth = [_Synth() for _ in range(ch)]
    pcm = []
    for pos, h in frames:
        if h["sr"] != sr or h["channels"] != ch:
            continue
        table, sblimit = _select_table(h)
        bound = min((h["mode_ext"] + 1) * 4, sblimit) if h["mode"] == 1 else sblimit
        bits = Bits(blob[pos + 4 + (2 if h["crc"] else 0) : pos + h["frame_len"]])

        alloc = np.zeros((ch, 32), np.int32)
        for sb in range(sblimit):
            width = table[sb][0]
            if sb < bound:
                for c in range(ch):
                    alloc[c, sb] = bits.get(width)
            else:
                a = bits.get(width)
                for c in range(ch):
                    alloc[c, sb] = a
        scfsi = np.zeros((ch, 32), np.int32)
        for sb in range(sblimit):
            for c in range(ch):
                if alloc[c, sb]:
                    scfsi[c, sb] = bits.get(2)
        sf = np.zeros((ch, 32, 3), np.float64)
        for sb in range(sblimit):
            for c in range(ch):
                if not alloc[c, sb]:
                    continue
                mode = scfsi[c, sb]
                if mode == 0:
                    idx = [bits.get(6) for _ in range(3)]
                elif mode == 1:
                    a, b = bits.get(6), bits.get(6)
                    idx = [a, a, b]
                elif mode == 2:
                    a = bits.get(6)
                    idx = [a, a, a]
                else:
                    a, b = bits.get(6), bits.get(6)
                    idx = [a, b, b]
                sf[c, sb] = [_SF[min(i, 62)] for i in idx]

        S = np.zeros((ch, 32, 36))
        for gr in range(12):
            part = gr // 4
            for sb in range(sblimit):
                shared = sb >= bound
                for c in range(1 if shared else ch):
                    a = alloc[c, sb]
                    if not a:
                        continue
                    sample_bits, d = table[sb][1][a - 1]
                    if d > 0:  # grouped
                        code = bits.get(sample_bits)
                        vals = _degroup(code, d)
                        nb = _group_nb(d)
                        sm = [_dequant(v, d, nb) for v in vals]
                    else:
                        steps = (1 << sample_bits) - 1
                        sm = [
                            _dequant(bits.get(sample_bits), steps, sample_bits)
                            for _ in range(3)
                        ]
                    for cc in range(ch) if shared else [c]:
                        if shared and not alloc[cc, sb]:
                            continue
                        for k in range(3):
                            S[cc, sb, gr * 3 + k] = sm[k] * sf[cc, sb, part]
        out = np.zeros((36 * 32, ch), np.float64)
        for c in range(ch):
            for t in range(36):
                # reuse the L3 synthesis: feed one time step as ts [32, 1]
                out[t * 32 : (t + 1) * 32, c] = synth[c].run(
                    S[c, :, t : t + 1]
                ).reshape(-1)
        pcm.append(out)
    return np.concatenate(pcm).astype(np.float32), sr


def decode_l1(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG Layer I stream → (pcm [N, ch] f32, sample_rate)."""
    frames = [(p, h) for p, h in find_frames(blob) if h["layer"] == 3]
    if not frames:
        raise ValueError("no Layer I frames")
    h0 = frames[0][1]
    sr, ch = h0["sr"], h0["channels"]
    synth = [_Synth() for _ in range(ch)]
    pcm = []
    for pos, h in frames:
        if h["sr"] != sr or h["channels"] != ch:
            continue
        bound = min((h["mode_ext"] + 1) * 4, 32) if h["mode"] == 1 else 32
        bits = Bits(blob[pos + 4 + (2 if h["crc"] else 0) : pos + h["frame_len"]])
        alloc = np.zeros((ch, 32), np.int32)
        for sb in range(32):
            if sb < bound:
                for c in range(ch):
                    alloc[c, sb] = bits.get(4)
            else:
                a = bits.get(4)
                alloc[:, sb] = a
        sf = np.zeros((ch, 32))
        for sb in range(32):
            for c in range(ch):
                if alloc[c, sb]:
                    sf[c, sb] = _SF[min(bits.get(6), 62)]
        S = np.zeros((ch, 32, 12))
        for t in range(12):
            for sb in range(32):
                shared = sb >= bound
                for c in range(1 if shared else ch):
                    a = alloc[c, sb]
                    if not a:
                        continue
                    nb = a + 1
                    steps = (1 << nb) - 1
                    v = _dequant(bits.get(nb), steps, nb)
                    for cc in range(ch) if shared else [c]:
                        if shared and not alloc[cc, sb]:
                            continue
                        S[cc, sb, t] = v * sf[cc, sb]
        out = np.zeros((12 * 32, ch))
        for c in range(ch):
            for t in range(12):
                out[t * 32 : (t + 1) * 32, c] = synth[c].run(
                    S[c, :, t : t + 1]
                ).reshape(-1)
        pcm.append(out)
    return np.concatenate(pcm).astype(np.float32), sr
