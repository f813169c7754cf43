"""Batched MPEG-1 Layer III DSP tail — the TPU half of the decoder.

The decode chain splits at the entropy boundary: everything bit-serial
(frame sync, side info, bit reservoir, scalefactors, Huffman) runs on the
host front-end (`frontend.py` / the C++ `mp3fe` library), which emits dense
per-granule tensors.  Everything after that — requantization, stereo,
antialias, hybrid IMDCT, overlap-add, frequency inversion, and the
polyphase synthesis filterbank — is pure dense linear algebra and runs
here as ONE jitted, batch-parallel program with **no sequential loops**:

* requantize: elementwise ``sign(is) * |is|^(4/3) * 2^exp`` (VPU);
* stereo: per-line 2x2 mixing planes (LR / MS / intensity all become the
  same fused multiply-add — the host encodes the mode per spectral line);
* antialias: the 8 ISO butterflies across all 31 subband boundaries as two
  strided slices + rotate, masked per granule-channel;
* hybrid IMDCT: windowed 36x18 basis matmuls (MXU), one per block type,
  masked and summed — the three short-block 12-point IMDCTs compose into a
  single equivalent 36x18 matrix so short blocks are matmuls too;
* overlap-add: granule ``g`` adds granule ``g-1``'s tail — a shift along
  the granule axis, NOT a scan (50% fixed overlap makes it data-parallel);
* synthesis filterbank: the ISO shift-register formulation is unrolled
  into (a) one big matrixing matmul ``V = TS @ N^T`` over all time steps
  (MXU) and (b) a 16-tap FIR over block history — output t needs only
  V[t-15..t], so the whole stream synthesizes in parallel.

The reference's decode stops at frame framing (mpeg.rs:7-128, TODO at
blast/src/main.rs:44-54); this file is the green-field half, validated
against the NumPy oracle (tests/mp3_oracle.py) and mpg123.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T

# ---------------------------------------------------------------------------
# Derived constant tensors (host NumPy, baked into the jitted program)
# ---------------------------------------------------------------------------


def _w_all() -> np.ndarray:
    """[4, 36, 18] windowed IMDCT matrices indexed by block type.

    Index 2 (short) is the composition of the three 12-point IMDCTs with
    their +6/+12 output placement and the window-interleaved input pick
    (oracle `_imdct_granule`): raw[6+6w+r] += WIN12[r, j] * X[3j + w].
    """
    w = np.zeros((4, 36, 18))
    for bt in (0, 1, 3):
        w[bt] = T.WIN_IMDCT36[bt]
    for win in range(3):
        for r in range(12):
            for j in range(6):
                w[2, 6 + 6 * win + r, 3 * j + win] += T.WIN_IMDCT12[r, j]
    return w


_W_ALL = _w_all()

#: frequency inversion: odd subband, odd time sample → negate
_FREQINV = np.where(
    (np.arange(32)[:, None] % 2 == 1) & (np.arange(18)[None, :] % 2 == 1), -1.0, 1.0
)

#: FIR taps over V-block history: out[t, j] = sum_k  _G2[k, j] * V[t-k, half(k)+j]
#: (unrolled ISO shift register: even lag k=2i reads D[64i+j] * V[t-k][j],
#:  odd lag k=2i+1 reads D[64i+32+j] * V[t-k][32+j])
_G2 = np.stack(
    [
        T.SYNTH_D[64 * (k // 2) + 32 * (k % 2) : 64 * (k // 2) + 32 * (k % 2) + 32]
        for k in range(16)
    ]
)


# ---------------------------------------------------------------------------
# The jitted tail
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("joint_stereo",))
def mp3_dsp_tail(
    is_q: jax.Array,
    scale: jax.Array,
    st: jax.Array | None,
    win_idx: jax.Array,
    aa_bound: jax.Array,
    *,
    joint_stereo: bool,
) -> jax.Array:
    """Quantized spectra → PCM, fully batch-parallel.

    Args:
      is_q: int16/int32 ``[B, G, C, 576]`` signed quantized spectrum, in
        final line order (host applied the short-block reorder), linbits
        already folded in.
      scale: f32 ``[B, G, C, 576]`` per-line requantizer gain ``2^exp``
        (global_gain, scalefactors, subblock gain, preflag all folded).
      st: f32 ``[B, G, 4, 576]`` per-line stereo planes (aL, bL, aR, bR) so
        ``L = aL*x0 + bL*x1; R = aR*x0 + bR*x1`` — or None when C == 1 or
        the stream never uses joint stereo.
      win_idx: int8/int32 ``[B, G, C, 32]`` per-subband IMDCT window select
        (block type; 2 = short composite).
      aa_bound: int32 ``[B, G, C]`` number of antialias subband boundaries
        to butterfly (0 short, 1 mixed, 31 long).

    Returns:
      f32 PCM ``[B, G*576, C]``.
    """
    B, G, C, _ = is_q.shape
    prec = jax.lax.Precision.HIGHEST
    f = jnp.float32

    # Requantize (elementwise, VPU).
    mag = jnp.abs(is_q).astype(f)
    x = jnp.sign(is_q).astype(f) * mag ** (4.0 / 3.0) * scale

    # Stereo: one fused per-line 2x2 mix covers LR/MS/intensity.
    if C == 2 and joint_stereo and st is not None:
        x0, x1 = x[:, :, 0], x[:, :, 1]
        L = st[:, :, 0] * x0 + st[:, :, 1] * x1
        R = st[:, :, 2] * x0 + st[:, :, 3] * x1
        x = jnp.stack([L, R], axis=2)

    xb = x.reshape(B, G, C, 32, 18)

    # Antialias butterflies across subband boundaries (ISO 2.4.3.4.10.1).
    cs = jnp.asarray(T.AA_CS, f)
    ca = jnp.asarray(T.AA_CA, f)
    a = xb[..., :31, 10:18][..., ::-1]  # i ↔ line 18*sb - 1 - i
    b = xb[..., 1:, :8]  #                 i ↔ line 18*sb + i
    na = a * cs - b * ca
    nb = b * cs + a * ca
    m = (jnp.arange(31) < aa_bound[..., None])[..., None]
    xb = xb.at[..., :31, 10:18].set(jnp.where(m, na, a)[..., ::-1])
    xb = xb.at[..., 1:, :8].set(jnp.where(m, nb, b))

    # Hybrid IMDCT: per-block-type windowed basis matmuls, masked + summed.
    w_all = jnp.asarray(_W_ALL, f)
    raw = jnp.zeros((B, G, C, 32, 36), f)
    for bt in range(4):
        mw = (win_idx == bt)[..., None]
        raw = raw + jnp.einsum(
            "bgcsi,ti->bgcst", jnp.where(mw, xb, 0.0), w_all[bt], precision=prec
        )

    # Overlap-add: granule g's head + granule g-1's tail (shift, not scan).
    prev = jnp.concatenate([jnp.zeros_like(raw[:, :1]), raw[:, :-1]], axis=1)
    ts = raw[..., :18] + prev[..., 18:]
    ts = ts * jnp.asarray(_FREQINV, f)

    # Time-major [B, C, T, 32], T = G*18 filterbank steps.
    TS = ts.transpose(0, 2, 1, 4, 3).reshape(B, C, G * 18, 32)

    # Matrixing: one big MXU matmul over every time step at once.
    V = jnp.einsum("bctk,nk->bctn", TS, jnp.asarray(T.SYNTH_N, f), precision=prec)

    # Windowed 16-tap FIR over block history (unrolled shift register).
    Tsteps = G * 18
    Vp = jnp.pad(V, ((0, 0), (0, 0), (15, 0), (0, 0)))
    g2 = jnp.asarray(_G2, f)
    out = jnp.zeros((B, C, Tsteps, 32), f)
    for k in range(16):
        seg = jax.lax.dynamic_slice_in_dim(Vp, 15 - k, Tsteps, axis=2)
        half = seg[..., :32] if k % 2 == 0 else seg[..., 32:]
        out = out + g2[k] * half

    return out.reshape(B, C, G * 576).transpose(0, 2, 1)
