"""Reference IMA/DVI ADPCM codec (WAV format 0x11) — test oracle.

Pure-NumPy scalar implementation of the IMA ADPCM reference algorithm
(the well-known step-size/index-adaptation tables), block-structured per
the WAV container: each ``block_align``-byte block starts with a 4-byte
header per channel (int16 LE predictor = first output sample, uint8 step
index, reserved byte) followed by 4-byte nibble groups interleaved per
channel (low nibble first within a byte).

The encoder exists to SYNTHESIZE conformance streams (like
tests/mp3_writer.py does for MP3); the decoder is the ground truth the
device kernel (ops.unpack.unpack_ima_adpcm) must match bit-exactly, and
is itself cross-checked against libavcodec's adpcm_ima_wav decoder in
tests/test_adpcm.py.
"""

from __future__ import annotations

import numpy as np

STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int64)
INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int64)


def _decode_nibble(nib: int, pred: int, idx: int) -> tuple[int, int]:
    step = int(STEPS[idx])
    vpdiff = step >> 3
    if nib & 4:
        vpdiff += step
    if nib & 2:
        vpdiff += step >> 1
    if nib & 1:
        vpdiff += step >> 2
    pred = pred - vpdiff if nib & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(INDEX[nib])))
    return pred, idx


def _encode_nibble(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """Quantize one sample → (nibble, new predictor, new index)."""
    step = int(STEPS[idx])
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    pred, idx = _decode_nibble(nib, pred, idx)
    return nib, pred, idx


def encode(pcm: np.ndarray, block_align: int) -> bytes:
    """Encode [frames, channels] int16 → WAV-layout IMA ADPCM blocks.

    The final block is zero-nibble-padded to a whole block (frames beyond
    the input repeat the last prediction; callers use a fact chunk or
    frame math to trim)."""
    frames, ch = pcm.shape
    assert block_align > 4 * ch and block_align % (4 * ch) == 0
    w = (block_align - 4 * ch) // (4 * ch)
    spb = 1 + 8 * w
    out = bytearray()
    idx = [0] * ch
    for b0 in range(0, frames, spb):
        blk = pcm[b0 : b0 + spb]
        pred = [0] * ch
        # header: first sample verbatim + current step index
        for c in range(ch):
            pred[c] = int(blk[0, c]) if len(blk) else 0
            out += int(pred[c] & 0xFFFF).to_bytes(2, "little")
            out.append(idx[c])
            out.append(0)
        nibs = [[] for _ in range(ch)]
        for k in range(1, spb):
            for c in range(ch):
                s = int(blk[k, c]) if k < len(blk) else pred[c]
                nib, pred[c], idx[c] = _encode_nibble(s, pred[c], idx[c])
                nibs[c].append(nib)
        for g in range(w):  # 4-byte groups interleaved per channel
            for c in range(ch):
                for byte in range(4):
                    lo = nibs[c][g * 8 + byte * 2]
                    hi = nibs[c][g * 8 + byte * 2 + 1]
                    out.append(lo | (hi << 4))
    return bytes(out)


def decode(data: bytes, channels: int, block_align: int,
           n_frames: int | None = None) -> np.ndarray:
    """Decode IMA ADPCM blocks → [frames, channels] int16 (full + partial
    blocks, same frame math as the package parsers)."""
    ch = channels
    full, rem = divmod(len(data), block_align)
    w = (block_align - 4 * ch) // (4 * ch)
    spb = 1 + 8 * w
    frames = []
    for b in range(full + (1 if rem >= 4 * ch else 0)):
        blk = data[b * block_align : (b + 1) * block_align]
        wb = (min(len(blk), block_align) - 4 * ch) // (4 * ch)
        pred, idx = [0] * ch, [0] * ch
        outs = [[] for _ in range(ch)]
        for c in range(ch):
            v = int.from_bytes(blk[4 * c : 4 * c + 2], "little")
            pred[c] = v - 0x10000 if v >= 0x8000 else v
            idx[c] = max(0, min(88, blk[4 * c + 2]))
            outs[c].append(pred[c])
        body = blk[4 * ch :]
        for g in range(wb):
            for c in range(ch):
                for byte in range(4):
                    bv = body[(g * ch + c) * 4 + byte]
                    for nib in (bv & 0xF, bv >> 4):
                        pred[c], idx[c] = _decode_nibble(
                            nib, pred[c], idx[c])
                        outs[c].append(pred[c])
        frames.append(np.stack([np.asarray(o, np.int16) for o in outs], 1))
    pcm = (np.concatenate(frames) if frames
           else np.zeros((0, ch), np.int16))
    if n_frames is not None:
        pcm = pcm[:n_frames]
    return pcm


# ------------------------------------------------------- Apple ima4 (AIFC)

def encode_ima4(pcm: np.ndarray) -> bytes:
    """Encode [frames, channels] int16 → AIFC 'ima4' packets (34 bytes /
    64 samples per channel, interleaved per channel; the 2-byte BE
    header packs the running predictor's top 9 bits with the step
    index).  State persists across packets like Apple's encoder."""
    frames, ch = pcm.shape
    out = bytearray()
    pred = [0] * ch
    idx = [0] * ch
    for b0 in range(0, frames, 64):
        blk = np.zeros((64, ch), np.int64)
        real = pcm[b0 : b0 + 64]
        blk[: len(real)] = real
        for c in range(ch):
            hdr = (pred[c] & 0xFF80) | idx[c]
            out += int(hdr & 0xFFFF).to_bytes(2, "big")
            # the decoder will seed from the 9-bit header predictor;
            # mirror that so encoder state == decoder state
            p = hdr & 0xFF80
            pred[c] = p - 0x10000 if p >= 0x8000 else p
            nibs = []
            for k in range(64):
                nib, pred[c], idx[c] = _encode_nibble(
                    int(blk[k, c]), pred[c], idx[c])
                nibs.append(nib)
            for k in range(0, 64, 2):
                out.append(nibs[k] | (nibs[k + 1] << 4))
    return bytes(out)


def decode_ima4(data: bytes, channels: int,
                n_frames: int | None = None) -> np.ndarray:
    """Decode AIFC 'ima4' packets → [frames, channels] int16 (whole
    34·C-byte groups only, like the package parsers)."""
    ch = channels
    groups = len(data) // (34 * ch)
    frames = []
    for g in range(groups):
        outs = []
        for c in range(ch):
            pkt = data[(g * ch + c) * 34 : (g * ch + c + 1) * 34]
            hdr = int.from_bytes(pkt[:2], "big")
            p = hdr & 0xFF80
            pred = p - 0x10000 if p >= 0x8000 else p
            idx = min(hdr & 0x7F, 88)
            vals = []
            for byte in pkt[2:]:
                for nib in (byte & 0xF, byte >> 4):
                    pred, idx = _decode_nibble(nib, pred, idx)
                    vals.append(pred)
            outs.append(vals)
        frames.append(np.stack(
            [np.asarray(o, np.int16) for o in outs], 1))
    pcm = (np.concatenate(frames) if frames
           else np.zeros((0, ch), np.int16))
    if n_frames is not None:
        pcm = pcm[:n_frames]
    return pcm
