"""Reference MS ADPCM codec (WAV format 0x02) — test oracle.

Scalar implementation of Microsoft's ADPCM coding spec: 7 standard
predictor coefficient pairs, idelta adaptation table, per-channel block
header (predictor index, int16 idelta, sample1, sample2) and one 4-bit
code per channel per byte (high nibble first; stereo interleaves
left/right within each byte).  Unlike IMA there is a single decode
formula family — ffmpeg's adpcm_ms matches bit-exactly (pinned in
tests/test_adpcm.py).
"""

from __future__ import annotations

import numpy as np

COEF1 = [256, 512, 0, 192, 240, 460, 392]
COEF2 = [0, -256, 0, 64, 0, -208, -232]
ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
         768, 614, 512, 409, 307, 230, 230, 230]


def _clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def _predict(s1: int, s2: int, c1: int, c2: int) -> int:
    acc = s1 * c1 + s2 * c2
    # /256 truncating toward zero (NOT an arithmetic shift)
    return -((-acc) >> 8) if acc < 0 else acc >> 8


def _decode_code(code: int, s1: int, s2: int, delta: int, c1: int,
                 c2: int) -> tuple[int, int]:
    signed = code - 16 if code & 8 else code
    pred = _clamp16(_predict(s1, s2, c1, c2) + signed * delta)
    delta = max((ADAPT[code] * delta) >> 8, 16)
    return pred, delta


def encode(pcm: np.ndarray, block_align: int) -> bytes:
    """Encode [frames, channels] int16 → WAV-layout MS ADPCM blocks
    (predictor 0, idelta seeded from the block's early deltas; the final
    block is zero-padded to whole size)."""
    frames, ch = pcm.shape
    assert ch in (1, 2) and block_align > 7 * ch
    spb = 2 + (block_align - 7 * ch) * 2 // ch
    out = bytearray()
    for b0 in range(0, frames, spb):
        blk = np.zeros((spb, ch), np.int64)
        real = pcm[b0 : b0 + spb]
        blk[: len(real)] = real
        cidx = [0] * ch
        s2 = [int(blk[0, c]) for c in range(ch)]
        s1 = [int(blk[1, c]) for c in range(ch)]
        delta = [
            max(16, int(np.abs(np.diff(blk[:8, c])).mean()) // 4 + 16)
            for c in range(ch)
        ]
        for c in range(ch):
            out.append(cidx[c])
        for arr in (delta, s1, s2):
            for c in range(ch):
                out += int(arr[c] & 0xFFFF).to_bytes(2, "little")
        codes = [[] for _ in range(ch)]
        for k in range(2, spb):
            for c in range(ch):
                c1, c2 = COEF1[cidx[c]], COEF2[cidx[c]]
                pred = _predict(s1[c], s2[c], c1, c2)
                want = int(blk[k, c]) - pred
                code = max(-8, min(7, round(want / max(delta[c], 1))))
                code &= 0xF
                dec, delta[c] = _decode_code(
                    code, s1[c], s2[c], delta[c], c1, c2)
                s2[c], s1[c] = s1[c], dec
                codes[c].append(code)
        n = spb - 2
        if ch == 2:
            for k in range(n):
                out.append((codes[0][k] << 4) | codes[1][k])
        else:
            for k in range(0, n, 2):
                out.append((codes[0][k] << 4) | codes[0][k + 1])
    return bytes(out)


def decode(data: bytes, channels: int, block_align: int,
           n_frames: int | None = None) -> np.ndarray:
    """Decode MS ADPCM blocks → [frames, channels] int16 (full + partial
    blocks, same frame math as the package parsers)."""
    ch = channels
    full, rem = divmod(len(data), block_align)
    frames = []
    for b in range(full + (1 if rem > 7 * ch else 0)):
        blk = data[b * block_align : (b + 1) * block_align]
        cidx = [min(blk[c], 6) for c in range(ch)]

        def i16(off):
            v = int.from_bytes(blk[off : off + 2], "little")
            return v - 0x10000 if v >= 0x8000 else v

        delta = [i16(ch + 2 * c) for c in range(ch)]
        s1 = [i16(3 * ch + 2 * c) for c in range(ch)]
        s2 = [i16(5 * ch + 2 * c) for c in range(ch)]
        outs = [[s2[c], s1[c]] for c in range(ch)]
        body = blk[7 * ch :]
        for k, byte in enumerate(body):
            for c, code in (((0, byte >> 4), (1, byte & 0xF)) if ch == 2
                            else ((0, byte >> 4), (0, byte & 0xF))):
                c1, c2 = COEF1[cidx[c]], COEF2[cidx[c]]
                dec, delta[c] = _decode_code(
                    code, s1[c], s2[c], delta[c], c1, c2)
                s2[c], s1[c] = s1[c], dec
                outs[c].append(dec)
        frames.append(np.stack(
            [np.asarray(o, np.int16) for o in outs], 1))
    pcm = (np.concatenate(frames) if frames
           else np.zeros((0, ch), np.int16))
    if n_frames is not None:
        pcm = pcm[:n_frames]
    return pcm
