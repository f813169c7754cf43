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

#: line → exponent-band slot maps, [3 rates, 3 cfgs, 576] (cfg 0 long,
#: 1 short, 2 mixed), in final (reordered) line order.  Slot layout per
#: granule-channel: 0..21 long sfb, 22 + sfb*3 + w short (sfb, window).
def _line2band() -> np.ndarray:
    rates = (44100, 48000, 32000)
    m = np.zeros((3, 3, 576), np.int32)
    for r, sr in enumerate(rates):
        lb = T.SFB_LONG[sr]
        sb = T.SFB_SHORT[sr]
        # cfg 0: long blocks — slot = long sfb of the line
        for sfb in range(22):
            m[r, 0, lb[sfb] : lb[sfb + 1]] = sfb
        # cfg 1: short — after reorder, line base + i*3 + w is (sfb, w)
        for sfb in range(13):
            lo, hi = int(sb[sfb]), int(sb[sfb + 1])
            w_ = hi - lo
            for w in range(3):
                m[r, 1, lo * 3 + w : lo * 3 + 3 * w_ : 3] = 22 + sfb * 3 + w
        # cfg 2: mixed — long sfb 0..7 below line 36, short sfb 3.. above
        m[r, 2] = m[r, 1]
        for sfb in range(8):
            m[r, 2, lb[sfb] : lb[sfb + 1]] = sfb
    return m


_LINE2BAND = _line2band()


#: stereo-mode byte → (aL, bL, aR, bR) mixing coefficients; rows:
#: 0 identity LR, 1 mid/side, 2+k intensity with is_pos = k (frontend.ST_*)
def _st_lut() -> np.ndarray:
    lut = np.zeros((9, 4))
    lut[0] = (1.0, 0.0, 0.0, 1.0)
    s = 1.0 / np.sqrt(2.0)
    lut[1] = (s, s, s, -s)
    for k in range(7):
        r = float(T.IS_RATIO[k])
        lut[2 + k] = (r / (1.0 + r), 0.0, 1.0 / (1.0 + r), 0.0)
    return lut


_ST_LUT = _st_lut()


# ---------------------------------------------------------------------------
# The jitted tail
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("channels", "joint_stereo"))
def mp3_dsp_tail(
    is_q: jax.Array,
    exp_b: jax.Array,
    st_mode: jax.Array | None,
    blockcfg: jax.Array,
    rate_idx: jax.Array,
    *,
    channels: int,
    joint_stereo: bool,
) -> jax.Array:
    """Quantized spectra → PCM, fully batch-parallel.

    Inputs are the transfer-compact host tensors (~1.5 KB/granule): gains,
    stereo planes, window selects and antialias masks are all expanded on
    device, so host→TPU bandwidth — the practical bottleneck — carries only
    the spectrum plus small per-band/per-granule side data.  Input shapes
    are deliberately FLAT (no small trailing dims): TPU buffers tile the
    last two axes to (sublanes, 128), so a ``[B, G, 2, 576]`` int16 array
    would be padded 8× during host relayout; ``[B, G*C, 576]`` isn't.

    Args:
      is_q: int16 ``[B, G*C, 576]`` signed quantized spectrum, in final
        line order (host applied the short-block reorder), linbits folded.
      exp_b: int16 ``[B, G*C*61]`` 4× requantizer exponent per band slot
        (0..21 long sfb, 22+sfb*3+w short; global_gain, scalefactors,
        subblock gain, preflag folded; exact integer) — gain = 2^(e/4).
      st_mode: int8 ``[B, G*576]`` per-line stereo mode byte (see
        frontend.ST_*), or None when C == 1 / never joint stereo.
      blockcfg: int8 ``[B, G*C]`` block_type | mixed<<2.
      rate_idx: int8/int32 ``[B]`` sample-rate index (0=44.1k 1=48k 2=32k).
      channels: static channel count C.

    Returns:
      f32 PCM ``[B, G*576, C]``.
    """
    B = is_q.shape[0]
    C = channels
    G = is_q.shape[1] // C
    is_q = is_q.reshape(B, G, C, 576)
    exp_b = exp_b.reshape(B, G, C, 61)
    if st_mode is not None:
        st_mode = st_mode.reshape(B, G, 576)
    blockcfg = blockcfg.reshape(B, G, C)
    prec = jax.lax.Precision.HIGHEST
    f = jnp.float32

    # Expand per-granule block config → window selects, AA bounds, cfg id.
    block_type = (blockcfg & 3).astype(jnp.int32)
    mixed = (blockcfg >> 2).astype(jnp.int32)
    short = block_type == 2
    cfg = jnp.where(short, jnp.where(mixed == 1, 2, 1), 0)  # [B,G,C]
    sb_iota = jnp.arange(32)
    win_idx = jnp.where(
        short[..., None],
        jnp.where((mixed[..., None] == 1) & (sb_iota < 2), 0, 2),
        block_type[..., None],
    )  # [B,G,C,32]
    aa_bound = jnp.where(short, mixed, 31)  # [B,G,C]

    # Per-line exponent: gather band slot per line, then the band value.
    l2b = jnp.asarray(_LINE2BAND)[rate_idx.astype(jnp.int32)[:, None, None], cfg]
    exp4 = jnp.take_along_axis(exp_b.astype(jnp.int32), l2b, axis=-1)

    # Requantize (elementwise, VPU): sign(is) * |is|^(4/3) * 2^(exp4/4).
    mag = jnp.abs(is_q).astype(f)
    x = jnp.sign(is_q).astype(f) * mag ** (4.0 / 3.0) * jnp.exp2(
        exp4.astype(f) * 0.25
    )

    # Stereo: per-line mode byte → (aL,bL,aR,bR) via LUT, one fused 2x2 mix.
    if C == 2 and joint_stereo and st_mode is not None:
        st = jnp.asarray(_ST_LUT, f)[st_mode.astype(jnp.int32)]  # [B,G,576,4]
        x0, x1 = x[:, :, 0], x[:, :, 1]
        L = st[..., 0] * x0 + st[..., 1] * x1
        R = st[..., 2] * x0 + st[..., 3] * x1
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
