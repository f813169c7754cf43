"""Rational polyphase resampling as one MXU matmul.

The reference's only resampling is per-voice fractional-position linear
interpolation in the render loop (engine.rs:429-438).  Batch decode needs
real consensus-rate conversion (main.rs:91-105 picks a consensus rate but
the reference never converts); here it is a windowed-sinc polyphase
resampler arranged TPU-first:

For a rational ratio ``dst/src = L/M`` (reduced), every block of L output
samples is a linear function of one window of ``M + K`` input samples, so
the whole resample is

    patches [B, F, M+K, C]  @  W [L, M+K]  →  y [B, F, L, C]

— a single batched matmul on the MXU, no sequential state.  W folds the
Kaiser-windowed sinc interpolation filter at each of the L phases.
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


@functools.partial(jax.jit, static_argnames=("L", "M"))
def _resample_LM(pcm: jax.Array, *, L: int, M: int) -> jax.Array:
    """pcm [B, S, C] → [B, S*L//M (frame-truncated), C]."""
    B, S, C = pcm.shape
    taps = _TAPS
    half = taps // 2
    # pad so every frame window [f*M - half + 1, f*M + M + half] is valid
    xp = jnp.pad(pcm, ((0, 0), (half, M + half), (0, 0)))
    F = S // M
    # frame windows via gather: idx [F, M+taps]
    idx = (jnp.arange(F) * M)[:, None] + jnp.arange(M + taps)[None, :]
    patches = xp[:, idx, :]  # [B, F, M+taps, C]
    W = jnp.asarray(_poly_matrix(L, M))
    y = jnp.einsum(
        "bfkc,jk->bfjc", patches, W, precision=jax.lax.Precision.HIGHEST
    )
    return y.reshape(B, F * L, C)


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
    B, S, C = batch.pcm.shape
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

    pcm_out = jnp.zeros((B, max_out, C), jnp.float32)
    new_valid = valid.copy()
    for r in uniq:
        L, M, out_len = plans[r]
        rows = np.nonzero((rates == r) & (err == 0))[0]
        sel = jnp.asarray(rows, jnp.int32)
        if r == int(consensus_rate):
            piece = batch.pcm[sel]
            out_len = S
        else:
            piece = _resample_LM(batch.pcm[sel], L=L, M=M)
        pcm_out = pcm_out.at[sel, :out_len, :].set(piece[:, :out_len, :])
        if length == "exact" and r != int(consensus_rate):
            new_valid[rows] = np.minimum(
                -(-valid[rows] * L // M), out_len
            )
        else:
            new_valid[rows] = (valid[rows] // M) * L
    return AudioBatch.from_pcm(
        pcm_out,
        sample_rate=jnp.where(jnp.asarray(err == 0), consensus_rate,
                              batch.sample_rate),
        num_channels=batch.num_channels,
        bits_per_sample=batch.bits_per_sample,
        valid_frames=jnp.asarray(new_valid),
        err=batch.err,
        names=batch.names,
        formats=batch.formats,
    )
