"""Rational polyphase resampling as one MXU matmul.

The reference's only resampling is per-voice fractional-position linear
interpolation in the render loop (engine.rs:429-438).  Batch decode needs
real consensus-rate conversion (main.rs:91-105 picks a consensus rate but
the reference never converts); here it is a windowed-sinc polyphase
resampler arranged TPU-first:

For a rational ratio ``dst/src = L/M`` (reduced), every block of L output
samples is a linear function of one window of ``M + K`` input samples, so
the whole resample is

    patches [B, F, (M+K)·C]  @  Wf [(M+K)·C, L·C]  →  y [B, F, L·C]

— a single batched matmul on the MXU, no sequential state.  Wf folds the
Kaiser-windowed sinc interpolation filter at each of the L phases,
expanded channel-block-diagonal so the whole pipeline runs on the FLAT
interleaved [B, S*C] layout (AudioBatch.data) — a trailing C dim of 1-2
would tile-pad every 128-lane TPU tile to 1-2 used elements, a 64-128x
HBM tax on the patches tensor (core/batch.py docstring).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

#: filter half-width per phase (taps per output sample)
_TAPS = 32


@functools.lru_cache(maxsize=64)
def _poly_matrix(L: int, M: int, taps: int = _TAPS) -> np.ndarray:
    """[L, M + taps] polyphase weight matrix for dst/src = L/M.

    Output sample j of a frame sits at input time ``j*M/L`` (relative to
    the frame's first input sample); its value is a Kaiser-windowed sinc
    interpolation over `taps` neighbouring inputs, lowpassed to the
    narrower of the two Nyquists (cutoff min(1, L/M) of input Nyquist).
    """
    W = np.zeros((L, M + taps))
    cutoff = min(1.0, L / M)
    beta = 8.6  # Kaiser beta ≈ 90 dB stopband
    half = taps // 2
    for j in range(L):
        t = j * M / L  # fractional input position
        base = math.floor(t)
        frac = t - base
        for k in range(taps):
            # input index: base + k - half + 1 … window centred on t
            n = k - half + 1 - frac
            x = cutoff * n
            sinc = cutoff * (np.sinc(x))
            w = n / half
            win = np.i0(beta * np.sqrt(max(0.0, 1 - w * w))) / np.i0(beta)
            idx = base + k - half + 1 + half  # shift so indices start at 0
            if 0 <= idx < M + taps:
                W[j, idx] += sinc * win
    return W.astype(np.float32)


def _ratio(src: int, dst: int) -> tuple[int, int]:
    g = math.gcd(src, dst)
    return dst // g, src // g  # L (up), M (down)


@functools.lru_cache(maxsize=64)
def _poly_matrix_flat(L: int, M: int, C: int, taps: int = _TAPS) -> np.ndarray:
    """[(M+taps)*C, L*C] channel-block-diagonal polyphase matrix.

    The flat-interleaved kernel contracts the whole (window x channel)
    axis at once; expanding W so ``Wf[k*C+c, j*C+c] = W[j, k]`` keeps
    channels independent.  The off-channel zeros cost Cx MXU FLOPs —
    noise next to the 64-128x HBM tile-padding tax a trailing C dim of
    1-2 would impose on the patches tensor (core/batch.py docstring)."""
    W = _poly_matrix(L, M, taps)  # [L, M+taps]
    K = M + taps
    Wf = np.zeros((K * C, L * C), np.float32)
    for c in range(C):
        Wf[c::C, c::C] = W.T
    return Wf


@functools.partial(jax.jit, static_argnames=("L", "M", "C"))
def _resample_LM_flat(data: jax.Array, *, L: int, M: int, C: int) -> jax.Array:
    """Flat interleaved [B, S*C] → [B, (S//M)*L*C].

    The hot-path form: patches, weights and output all keep a large
    minor dim, so nothing tile-pads.  Bitwise the same filter as the
    planar form (identical weights; the interleaved contraction only
    adds exact zeros)."""
    B, SC = data.shape
    S = SC // C
    taps = _TAPS
    half = taps // 2
    # pad so every frame window [f*M - half + 1, f*M + M + half] is valid
    xp = jnp.pad(data, ((0, 0), (half * C, (M + half) * C)))
    F = S // M
    # frame windows via gather over the flat axis: idx [F, (M+taps)*C]
    idx = (jnp.arange(F) * M * C)[:, None] + jnp.arange((M + taps) * C)[None, :]
    patches = xp[:, idx]  # [B, F, (M+taps)*C]
    Wf = jnp.asarray(_poly_matrix_flat(L, M, C))
    y = jnp.einsum(
        "bfk,kj->bfj", patches, Wf, precision=jax.lax.Precision.HIGHEST
    )  # [B, F, L*C]
    return y.reshape(B, F * L * C)


def _resample_LM(pcm: jax.Array, *, L: int, M: int) -> jax.Array:
    """Planar [B, S, C] → [B, S*L//M (frame-truncated), C] (convenience
    wrapper over the flat kernel for tests/host callers)."""
    B, S, C = pcm.shape
    flat = jnp.reshape(jnp.asarray(pcm), (B, S * C))
    y = _resample_LM_flat(flat, L=L, M=M, C=C)
    return y.reshape(B, -1, C)


def resample_batch(
    pcm: jax.Array | np.ndarray,
    src_rate: int,
    dst_rate: int,
) -> jax.Array:
    """Resample a [B, S, C] batch from src_rate to dst_rate.

    Identity when the rates match.  Output length is ``floor(S/M)*L``
    (whole polyphase frames)."""
    if src_rate == dst_rate:
        return jnp.asarray(pcm)
    L, M = _ratio(src_rate, dst_rate)
    return _resample_LM(jnp.asarray(pcm), L=L, M=M)


def resample_to_consensus(batch, consensus_rate: int, length: str = "floor"):
    """Resample every file in an AudioBatch to the consensus rate.

    Files are grouped by source rate (one compiled matmul per distinct
    ratio); returns a new AudioBatch at the uniform rate, with
    valid_frames rescaled.  Mirrors the *intent* of the reference's
    consensus config (main.rs:91-120) — the reference picks a consensus
    rate but plays mismatched files unconverted.

    length: per-file valid-length policy.  "floor" (default) keeps whole
    polyphase frames — floor(valid/M)*L samples; "exact" reports
    ceil(valid*L/M), the sample-exact duration, clamped to the rendered
    frames (the final partial frame is zero-padded by the kernel).
    """
    if length not in ("floor", "exact"):
        raise ValueError(f"length policy {length!r} (want floor|exact)")
    from ..core.batch import AudioBatch

    rates = np.asarray(batch.sample_rate)
    valid = np.asarray(batch.valid_frames)
    err = np.asarray(batch.err)
    B = batch.batch_size
    S = batch.max_frames
    C = batch.channels
    uniq = sorted({int(r) for r, e in zip(rates, err) if e == 0 and r > 0})
    if uniq in ([], [int(consensus_rate)]):
        return batch

    max_out = 1
    plans = {}
    for r in uniq:
        L, M = _ratio(r, int(consensus_rate)) if r != consensus_rate else (1, 1)
        out_len = (S // M) * L
        plans[r] = (L, M, out_len)
        max_out = max(max_out, out_len)

    # everything stays flat interleaved [B, S*C] end to end — no 3-D
    # (tile-padded) intermediate ever materializes on device
    data_out = jnp.zeros((B, max_out * C), jnp.float32)
    new_valid = valid.copy()
    for r in uniq:
        L, M, out_len = plans[r]
        rows = np.nonzero((rates == r) & (err == 0))[0]
        sel = jnp.asarray(rows, jnp.int32)
        if r == int(consensus_rate):
            piece = batch.data[sel]
            out_len = S
        else:
            piece = _resample_LM_flat(batch.data[sel], L=L, M=M, C=C)
        data_out = data_out.at[sel, : out_len * C].set(
            piece[:, : out_len * C])
        if length == "exact" and r != int(consensus_rate):
            new_valid[rows] = np.minimum(
                -(-valid[rows] * L // M), out_len
            )
        else:
            new_valid[rows] = (valid[rows] // M) * L
    return AudioBatch(
        data=data_out,
        channels=C,
        sample_rate=jnp.where(jnp.asarray(err == 0), consensus_rate,
                              batch.sample_rate),
        num_channels=batch.num_channels,
        bits_per_sample=batch.bits_per_sample,
        valid_frames=jnp.asarray(new_valid),
        err=batch.err,
        names=batch.names,
        formats=batch.formats,
    )
