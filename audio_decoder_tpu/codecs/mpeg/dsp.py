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

#: line → exponent-band slot maps, [9 rates, 3 cfgs, 576] (cfg 0 long,
#: 1 short, 2 mixed), in final (reordered) line order.  Slot layout per
#: granule-channel: 0..21 long sfb, 22 + sfb*3 + w short (sfb, window).
def _line2band() -> np.ndarray:
    m = np.zeros((len(T.RATE_ORDER), 3, 576), np.int32)
    for r, sr in enumerate(T.RATE_ORDER):
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
        # cfg 2: mixed — long sfbs below line 36 (8 MPEG-1 / 6 LSF sfbs),
        # short sfb 3.. above
        m[r, 2] = m[r, 1]
        for sfb in range(8 if r < 3 else 6):
            m[r, 2, lb[sfb] : lb[sfb + 1]] = sfb
    return m


_LINE2BAND = _line2band()


def _used_slots() -> np.ndarray:
    """[9 rates, 3 cfgs, 61] bool — slots the band→line map can select.

    The emitters zero every slot they don't fill (notably mixed blocks
    leave long 8..21 and short sfb 0..2 slots at 0), so any exactness
    contract over exp_b must range only over the selectable subset."""
    u = np.zeros(_LINE2BAND.shape[:2] + (61,), bool)
    for r in range(_LINE2BAND.shape[0]):
        for c in range(3):
            u[r, c, np.unique(_LINE2BAND[r, c])] = True
    return u


_USED_SLOTS = _used_slots()


def _l2b_variants() -> list:
    """Distinct band→line maps as one-hot [61, 576] f32 matrices.

    The (rate, cfg) → band-slot map has only 27 variants (and band tables
    repeat across rates, so fewer distinct ones).  Expanding per-slot
    values to per-line values is then a matmul against a CONSTANT one-hot
    matrix plus a masked select over present variants — MXU work instead
    of a per-line dynamic gather.  Each entry: (onehot, [flat variant ids
    rate*3+cfg])."""
    flat = _LINE2BAND.reshape(-1, 576)
    seen: dict[bytes, list[int]] = {}
    for v in range(flat.shape[0]):
        seen.setdefault(flat[v].tobytes(), []).append(v)
    out = []
    for kb, vs in seen.items():
        l2b = np.frombuffer(kb, dtype=flat.dtype)
        onehot = np.zeros((61, 576), np.float32)
        onehot[l2b, np.arange(576)] = 1.0
        out.append((onehot, vs))
    return out


_L2B_VARIANTS = _l2b_variants()


#: stereo-mode byte → (aL, bL, aR, bR) mixing coefficients; rows:
#: 0 identity LR, 1 mid/side, 2+k MPEG-1 intensity with is_pos = k (0..15),
#: 18 + scale*32 + k LSF intensity (io^x one-channel scaling) — frontend.ST_*
def _st_lut() -> np.ndarray:
    lut = np.zeros((18 + 64, 4))
    lut[0] = (1.0, 0.0, 0.0, 1.0)
    s = 1.0 / np.sqrt(2.0)
    lut[1] = (s, s, s, -s)
    for k in range(16):
        r = float(T.IS_RATIO[k])
        lut[2 + k] = (r / (1.0 + r), 0.0, 1.0 / (1.0 + r), 0.0)
    for p in range(2):
        fac = T.lsf_is_factors(p)
        for k in range(32):
            lut[18 + p * 32 + k] = (fac[k, 0], 0.0, fac[k, 1], 0.0)
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
      rate_idx: int8/int32 ``[B]`` sample-rate index (tables.RATE_ORDER:
        44.1k/48k/32k then the MPEG-2 and MPEG-2.5 families).
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

    cfg, win_idx, aa_bound = _expand_blockcfg(blockcfg)
    x = _requantize(is_q, exp_b, cfg, rate_idx)
    if C == 2 and joint_stereo and st_mode is not None:
        x = _stereo_mix(x, st_mode)
    return _hybrid_synthesis(x, win_idx, aa_bound)


def _expand_blockcfg(blockcfg: jax.Array):
    """block_type | mixed<<2 → (cfg id, IMDCT window selects, AA bounds)."""
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
    return cfg, win_idx, aa_bound


def _variant_mask(key: jax.Array, vs) -> jax.Array:
    """True where ``key`` (flat rate*3+cfg ids) matches any id in ``vs``."""
    m = jnp.zeros_like(key, dtype=bool)
    for v in vs:
        m = m | (key == v)
    return m


def _band_to_lines(slot_vals, cfg, rate_idx):
    """Expand per-band-slot values [..., 61] to per-line values [..., 576].

    The band→line map is static per (rate, cfg) — only 27 variants — so
    the expansion is a matmul against a constant one-hot [61, 576] matrix
    (MXU) plus a masked select over the variants actually present, instead
    of a per-line dynamic gather (the slowest op class on TPU: ~100 M
    elem/s vs effectively free on the MXU).  Selection by one-hot f32
    matmul is exact (each output line sums exactly one slot value)."""
    f = jnp.float32
    prec = jax.lax.Precision.HIGHEST
    key = rate_idx.astype(jnp.int32)[:, None, None] * 3 + cfg  # [B,G,C]
    out = jnp.zeros(slot_vals.shape[:-1] + (576,), f)
    sv = slot_vals.astype(f)
    for onehot, vs in _L2B_VARIANTS:
        expanded = jnp.einsum(
            "...s,sj->...j", sv, jnp.asarray(onehot), precision=prec
        )
        out = jnp.where(_variant_mask(key, vs)[..., None], expanded, out)
    return out


def _requantize(is_q, exp_b, cfg, rate_idx):
    """sign(is) * |is|^(4/3) * 2^(exp4/4), exponents expanded per band.

    The per-band 2^(e/4) gain is computed on the 61 band slots first
    (fewer transcendentals) and expanded to lines by the static band→line
    matmul; the expansion is an exact selection, so the result is
    bit-identical to gathering e per line and exponentiating there."""
    f = jnp.float32
    # clamp so no (unused, never-selected) slot can produce inf — the
    # one-hot matmul multiplies unselected slots by 0.0 and 0*inf = NaN;
    # legitimate quarter-exponents are far inside ±500 (2^±125 finite)
    gain_b = jnp.exp2(jnp.clip(exp_b.astype(f), -500.0, 500.0) * 0.25)
    gain = _band_to_lines(gain_b, cfg, rate_idx)  # [B,G,C,576]
    mag = jnp.abs(is_q).astype(f)
    return jnp.sign(is_q).astype(f) * mag ** (4.0 / 3.0) * gain


def _apply_stereo_coeffs(x, st):
    """[B,G,2,576] spectra × [B,G,576,4] (aL,bL,aR,bR) → 2x2 mixed."""
    x0, x1 = x[:, :, 0], x[:, :, 1]
    L = st[..., 0] * x0 + st[..., 1] * x1
    R = st[..., 2] * x0 + st[..., 3] * x1
    return jnp.stack([L, R], axis=2)


def _stereo_mix(x, st_mode):
    """Per-line mode byte → (aL,bL,aR,bR) via LUT, one fused 2x2 mix."""
    st = jnp.asarray(_ST_LUT, jnp.float32)[st_mode.astype(jnp.int32)]
    return _apply_stereo_coeffs(x, st)


def _hybrid_synthesis(x, win_idx, aa_bound):
    """Antialias → hybrid IMDCT → overlap-add → polyphase synthesis."""
    B, G, C, _ = x.shape
    prec = jax.lax.Precision.HIGHEST
    f = jnp.float32
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
    return polyphase_synthesis(TS)


def polyphase_synthesis(TS: jax.Array) -> jax.Array:
    """Polyphase synthesis filterbank, fully parallel over time steps.

    TS: f32 ``[B, C, T, 32]`` subband samples (one 32-vector per output
    block) → flat interleaved PCM ``[B, T*32*C]`` (the AudioBatch device
    layout, core/batch.py — a trailing channel dim would tile-pad 64x+ on
    TPU).  Shared by all three MPEG layers.  On
    TPU the matrixing + FIR run as one fused Pallas kernel (VMEM-resident
    block history, single HBM read/write — ops/pallas_synth.py); the XLA
    fallback materializes V and reads 16 shifted views."""
    B, C, Tsteps, _ = TS.shape
    f = jnp.float32
    if _use_pallas():
        from ...ops.pallas_synth import TILE_T, polyphase_synthesis_pallas

        pad = (-Tsteps) % TILE_T
        flat = TS.reshape(B * C, Tsteps, 32)
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
        out = polyphase_synthesis_pallas(
            flat, jnp.asarray(T.SYNTH_N, f), jnp.asarray(_G2, f)
        )[:, :Tsteps]
        out = out.reshape(B, C, Tsteps, 32)
    else:
        prec = jax.lax.Precision.HIGHEST
        V = jnp.einsum(
            "bctk,nk->bctn", TS, jnp.asarray(T.SYNTH_N, f), precision=prec
        )
        Vp = jnp.pad(V, ((0, 0), (0, 0), (15, 0), (0, 0)))
        g2 = jnp.asarray(_G2, f)
        out = jnp.zeros((B, C, Tsteps, 32), f)
        for k in range(16):
            seg = jax.lax.dynamic_slice_in_dim(Vp, 15 - k, Tsteps, axis=2)
            half = seg[..., :32] if k % 2 == 0 else seg[..., 32:]
            out = out + g2[k] * half
    # [B, C, S] → interleave to flat [B, S*C]: transpose + reshape fuse
    # into one compact-output copy (never materializes a [B, S, C] tile)
    return out.reshape(B, C, Tsteps * 32).transpose(0, 2, 1).reshape(B, -1)


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# On-device stereo-mode derivation (for the fused full-device decode)
# ---------------------------------------------------------------------------

#: line → short segment id sfb*3+w (pre-reorder window-segment layout, the
#: coordinates the ISO intensity bound logic runs in), [9 rates, 576];
#: plus each segment's start position a(sfb, w), [9, 39].
def _seg_maps() -> tuple[np.ndarray, np.ndarray]:
    """Reordered-line → (short sfb, window) maps: line j of band sfb
    (lines [lo*3, hi*3)) belongs to window (j - lo*3) % 3."""
    rates = T.RATE_ORDER
    sfb_map = np.zeros((len(rates), 576), np.int32)
    win_map = np.zeros((len(rates), 576), np.int32)
    for r, sr in enumerate(rates):
        sb = T.SFB_SHORT[sr]
        for sfb in range(13):
            lo3, hi3 = int(sb[sfb]) * 3, int(sb[sfb + 1]) * 3
            for j in range(lo3, hi3):
                sfb_map[r, j] = sfb
                win_map[r, j] = (j - lo3) % 3
    return sfb_map, win_map


_SEG_SFB, _SEG_WIN = _seg_maps()
_LB = np.stack([T.SFB_LONG[sr] for sr in T.RATE_ORDER])  # [9, 23]
#: mixed-block long/short boundary line per rate (= 3*short_bands[3];
#: 36 everywhere except 72 at 8 kHz)
_MIXED_SPLIT = np.array(
    [int(T.SFB_SHORT[sr][3]) * 3 for sr in T.RATE_ORDER], np.int32
)


def derive_stereo_coeffs(
    is_r: jax.Array,
    st_flags: jax.Array,
    sfr_bands: jax.Array,
    blockcfg_r: jax.Array,
    rate_idx: jax.Array,
) -> jax.Array:
    """Per-line (aL, bL, aR, bR) stereo coefficients, derived on device
    (ISO 2.4.3.4.9) — in BAND-SLOT space, then expanded to lines.

    Semantics mirror frontend._stereo_modes exactly: MS over the full
    spectrum (or below the intensity bound), intensity ratio bands above
    the right channel's zero region, detected per window segment for
    short blocks (pinned to mpg123 via crafted streams,
    tests/test_intensity.py, tests/test_mixed_blocks.py).

    Stereo modes are piecewise-constant over scalefactor bands, so the
    whole derivation runs on the 61 band slots (the same slot layout as
    ``exp_b``: 22 long sfb, then 22 + sfb*3 + w short) — long slots get
    the long-block rule, short slots the per-window rule, and the static
    per-(rate, cfg) band→line map picks the right family per region
    (which also subsumes the mixed-block long/short split).  The only
    per-line work left is the nonzero-support reduction; everything else
    is slot-sized arithmetic plus two one-hot matmuls — no per-line
    dynamic gathers (the slowest op class on TPU).

    Args:
      is_r: int ``[B, G, 576]`` right-channel quantized spectrum (line
        order; nonzero support equals the requantized spectrum's).
      st_flags: int8 ``[B, G]`` bit0 joint, bit1 ms, bit2 intensity,
        bit3 LSF intensity_scale.
      sfr_bands: int8 ``[B, G, 61]`` right-channel scalefactors.
      blockcfg_r: int8 ``[B, G]`` right channel block_type | mixed<<2.
      rate_idx: int32 ``[B]``.

    Returns:
      f32 ``[B, G, 576, 4]`` mixing coefficients (the _ST_LUT rows).
    """
    i32 = jnp.int32
    f = jnp.float32
    prec = jax.lax.Precision.HIGHEST
    B, G, _ = is_r.shape
    flags = st_flags.astype(i32)
    joint = (flags & 1) > 0
    ms = (flags & 2) > 0
    inten = (flags & 4) > 0
    base_mode = jnp.where(joint & ms, 1, 0)[..., None]  # [B,G,1]

    nz = is_r != 0
    r = rate_idx.astype(i32)
    # LSF streams (rate families 1/2) use io^x one-channel scaling rows;
    # mode = 18 + intensity_scale*32 + is_pos (frontend.ST_LSF0)
    lsf = (r >= 3)[:, None, None]  # [B,1,1]
    is_base = jnp.where(lsf, 18 + ((flags >> 3) & 1)[..., None] * 32, 2)

    def is_mode(is_pos):
        return is_base + jnp.minimum(is_pos, jnp.where(lsf, 31, 15))

    # ---- long slots 0..21: bound past the right channel's last nonzero
    # line; slot 21 has no scalefactor → is_pos 7 (MS/passthrough) ----
    j1 = jnp.arange(1, 577)
    rzero = jnp.max(jnp.where(nz, j1, 0), axis=-1)  # [B,G]
    lb = jnp.asarray(_LB)[r]  # [B, 23]
    bound_sfb = 1 + jnp.sum(
        (lb[:, None, 1:22] < rzero[..., None]).astype(i32), axis=-1
    )  # [B,G]
    # fully empty right channel: band 0 is intensity too (mpg123 parity)
    bound_sfb = jnp.where(rzero == 0, 0, bound_sfb)
    sfb_iota22 = jnp.arange(22)[None, None, :]
    is_pos_l = jnp.where(
        sfb_iota22 < 21, sfr_bands.astype(i32)[..., :22], 7
    )  # [B,G,22]
    zone_l = sfb_iota22 >= bound_sfb[..., None]
    mode_long = jnp.where(
        zone_l,
        jnp.where(is_pos_l == 7, base_mode, is_mode(is_pos_l)),
        base_mode,
    )  # [B,G,22]

    # ---- short slots 22 + sfb*3 + w: per-window bound past the window's
    # last nonzero band; segment support reduced by a one-hot matmul ----
    sfb_l = jnp.asarray(_SEG_SFB)[r][:, None, :]  # [B,1,576]
    win_l = jnp.asarray(_SEG_WIN)[r][:, None, :]  # [B,1,576]
    seg_id = sfb_l * 3 + win_l  # [B,1,576] in 0..38
    seg_oh = jax.nn.one_hot(seg_id[:, 0], 39, dtype=f)  # [B,576,39]
    seg_nz = jnp.einsum(
        "bgj,bjs->bgs", nz.astype(f), seg_oh, precision=prec
    ).reshape(B, G, 13, 3)
    # bound per window = 1 + last band with any nonzero (0 when empty)
    sfb_iota = jnp.arange(13)[None, None, :, None]
    bound_w = jnp.max(
        jnp.where(seg_nz > 0, sfb_iota + 1, 0), axis=2
    )  # [B, G, 3]
    # sfb 12 transmits no scalefactor: its is_pos reads sfb 11's slots
    # (min(sfb, 11) in the pinned line-space rule, tests/test_intensity.py)
    sfr_s = sfr_bands.astype(i32)[..., 22:]  # [B,G,39]
    is_pos_s = jnp.concatenate([sfr_s[..., :36], sfr_s[..., 33:36]], axis=-1)
    in_zone_s = sfb_iota >= bound_w[:, :, None, :]  # [B,G,13,3]
    mode_short = jnp.where(
        in_zone_s.reshape(B, G, 39),
        jnp.where(is_pos_s == 7, base_mode, is_mode(is_pos_s)),
        base_mode,
    )  # [B,G,39]

    mode = jnp.concatenate([mode_long, mode_short], axis=-1)  # [B,G,61]
    # no intensity: MS everywhere (if ms) / LR; mono-joint handled upstream
    mode = jnp.where(inten[..., None], mode, base_mode)
    mode = jnp.where(joint[..., None], mode, 0)

    # slot mode → coefficients via one-hot matmul (exact selection), then
    # band→line expansion keyed by the RIGHT channel's block cfg — the
    # cfg-2 (mixed) map routes low lines to long slots and high lines to
    # short slots, which IS the mixed-block long/short rule split
    moh = jax.nn.one_hot(mode, _ST_LUT.shape[0], dtype=f)  # [B,G,61,18+64]
    coeff_slots = jnp.einsum(
        "bgse,ec->bgsc", moh, jnp.asarray(_ST_LUT, f), precision=prec
    )  # [B,G,61,4]

    short_r = (blockcfg_r.astype(i32) & 3) == 2
    mixed_r = ((blockcfg_r.astype(i32) >> 2) & 1) > 0
    cfg_r = jnp.where(short_r, jnp.where(mixed_r, 2, 1), 0)  # [B,G]
    key = r[:, None] * 3 + cfg_r  # [B,G]
    out = jnp.zeros((B, G, 576, 4), f)
    for onehot, vs in _L2B_VARIANTS:
        expanded = jnp.einsum(
            "bgsc,sj->bgjc", coeff_slots, jnp.asarray(onehot), precision=prec
        )
        out = jnp.where(_variant_mask(key, vs)[..., None, None], expanded, out)
    return out


# ---------------------------------------------------------------------------
# Fused full-device decode: raw main_data bits → PCM in one jitted program
# ---------------------------------------------------------------------------


def compact_lane_wire(start, end, limit, exp_b, blockcfg, rate_idx):
    """Host-side (numpy) wire compaction for ``mp3_decode_fused``.

    Returns (end_rel u16, limit_rel u16, exp_base i16, exp_d u8, ok bool);
    see the dtype rationale in mp3_decode_fused's docstring.  exp_base is
    the max exponent over the lane's USED band slots — exactly the slots
    the (rate, cfg) band→line map can select (``_USED_SLOTS``; mixed
    blocks use only long 0..7/0..5 and the short slots past the split) —
    so the uint8 delta is exact for every selectable slot; unselectable
    slots may saturate at 255.  The ISO field bounds cap the used-slot
    range at 188 steps, so ``ok`` is always True for spec-legal streams;
    a lane whose emitter output exceeds 255 anyway gets ok=False and the
    caller drops it to the per-lane invalid path instead of corrupting.
    """
    st = np.asarray(start, np.int64)
    end_rel = np.clip(np.asarray(end, np.int64) - st, 0, 65535).astype(np.uint16)
    lim_rel = np.clip(np.asarray(limit, np.int64) - st, 0, 65535).astype(np.uint16)
    e = np.asarray(exp_b, np.int32)  # [..., 61]
    bc = np.asarray(blockcfg, np.int32)
    shortb = (bc & 3) == 2
    cfg = np.where(shortb, np.where(((bc >> 2) & 1) == 1, 2, 1), 0)
    rate = np.broadcast_to(
        np.asarray(rate_idx, np.int32).reshape((-1,) + (1,) * (cfg.ndim - 1)),
        cfg.shape,
    )
    used = _USED_SLOTS[rate, cfg]  # [..., 61]
    base = np.where(used, e, -(1 << 30)).max(axis=-1).astype(np.int16)
    dr = base[..., None].astype(np.int32) - e
    ok = ~np.any((dr > 255) & used, axis=-1)
    return end_rel, lim_rel, base, np.clip(dr, 0, 255).astype(np.uint8), ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "channels", "joint_stereo", "n_big", "n_c1", "granules_per_frame",
        "buckets", "impl",
    ),
)
def mp3_decode_fused(
    main_u8: jax.Array,
    start_bit: jax.Array,
    end_rel: jax.Array,
    limit_rel: jax.Array,
    big_values: jax.Array,
    region1: jax.Array,
    region2: jax.Array,
    tsel: jax.Array,
    c1sel: jax.Array,
    valid: jax.Array,
    exp_base: jax.Array,
    exp_d: jax.Array,
    blockcfg: jax.Array,
    st_flags: jax.Array,
    sfr_bands: jax.Array,
    rate_idx: jax.Array,
    perm: jax.Array | None = None,
    *,
    channels: int,
    joint_stereo: bool,
    n_big: int = 512,
    n_c1: int = 144,
    granules_per_frame: int = 2,
    buckets: tuple | None = None,
    impl: str = "xla",
) -> jax.Array:
    """Raw concatenated main_data + per-lane side metadata → PCM.

    The whole Layer III decode below the frame/scalefactor layer runs on
    device: lane-parallel Huffman (huffman_device.decode_spectra), band
    exponent expansion, stereo derivation, antialias, hybrid IMDCT and the
    polyphase synthesis — one compiled program, ~50 bytes of metadata plus
    the compressed bitstream per granule over the wire.

    Lane array shapes are flat ``[B, G*C]`` (tsel ``[B, G*C*3]``);
    exp_d is ``[B, G*C*61]``, st_flags ``[B, G]``, sfr ``[B, G*61]``.

    Wire compactness: the side tensors use the smallest exact dtypes —
    on tunnel/DCN-attached hosts the host→device copy, not compute, is
    the MP3 bottleneck.  ``end_rel``/``limit_rel`` are uint16 offsets
    from start_bit (part2_3_length < 4096 bits, and the scan can only
    overshoot the limit by one step, so a 65535 clamp never changes
    behavior), and band exponents ship as a per-lane int16 ``exp_base``
    minus a uint8 ``exp_d`` delta (used-band dynamic range is at most
    4*(31+2)+8*7 = 188 quarter-log2 steps; unused slots may clip — the
    band→line expansion never selects them).  ``compact_lane_wire``
    builds these from the absolute host tensors.

    Lane bucketing: big_values is max-driven per batch but extremely
    skewed in practice (sparse granules encode almost everything in the
    count1 region), so the host may pass ``perm`` (a lane sort by
    descending big_values) plus static ``buckets`` — a tuple of
    (lane_count, n_big, n_c1) covering the permuted lanes in order; each
    bucket runs its own scan lengths and one row scatter restores lane
    order.  The scan is the gather-bound hot loop, so cutting its trip
    count for the sparse majority is a direct win
    (decoder._plan_buckets).  Without ``buckets``, one scan of
    ``n_big``/``n_c1`` covers all lanes.
    """
    from .huffman_device import decode_spectra

    B = start_bit.shape[0]
    C = channels
    G = start_bit.shape[1] // C
    N = B * G * C
    tsel = tsel.reshape(B, G * C, 3)

    blockcfg_ = blockcfg.reshape(B, G, C)
    cfg, win_idx, aa_bound = _expand_blockcfg(blockcfg_)
    file_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), G * C)
    rate_lane = jnp.repeat(rate_idx.astype(jnp.int32), G * C)

    start_i = start_bit.reshape(N).astype(jnp.int32)
    lane_args = [
        file_idx,
        start_i,
        start_i + end_rel.reshape(N).astype(jnp.int32),
        start_i + limit_rel.reshape(N).astype(jnp.int32),
        big_values.reshape(N).astype(jnp.int32),
        region1.reshape(N).astype(jnp.int32),
        region2.reshape(N).astype(jnp.int32),
        tsel.reshape(N, 3).astype(jnp.int32),
        c1sel.reshape(N).astype(jnp.int32),
        valid.reshape(N).astype(jnp.int32),
        rate_lane,
        cfg.reshape(N),
    ]
    if buckets is None:
        buckets = ((N, n_big, n_c1),)
    if len(buckets) == 1:
        _cnt, nb, nc = buckets[0]
        lines, fail = decode_spectra(main_u8, *lane_args, n_big=nb, n_c1=nc,
                                     impl=impl)
    else:
        p = perm.astype(jnp.int32)
        pa = [a[p] for a in lane_args]
        parts = []
        start = 0
        for cnt, nb, nc in buckets:
            sl = slice(start, start + cnt)
            start += cnt
            parts.append(decode_spectra(
                main_u8, *[a[sl] for a in pa], n_big=nb, n_c1=nc, impl=impl
            ))
        # un-permute by SCATTER: int16 row gathers are pathologically slow
        # on this TPU path (~13x the scatter cost at [24k, 576]).  Plain
        # int16 rows, NOT int32-packed pairs: packing halves scatter
        # elements (41→29 ms) but the bitcast forces a tiled-layout
        # round-trip on the [N, 576] result that costs ~15 ms (profiled
        # reshape.409 + copy.751) — a net loss.
        lines_p = jnp.concatenate([x for x, _ in parts], axis=0)
        fail_p = jnp.concatenate([x for _, x in parts], axis=0)
        lines = jnp.zeros_like(lines_p).at[p].set(lines_p)
        fail = jnp.zeros_like(fail_p).at[p].set(fail_p)
    # Host parity: an entropy failure silences the whole frame (2 granules
    # for MPEG-1, 1 for LSF); failed-but-invalid lanes are already zero.
    gpf = granules_per_frame
    fail_real = fail & (valid.reshape(N) > 0)
    fail_f = jnp.any(fail_real.reshape(B, G // gpf, gpf * C), axis=-1)
    fail_g = jnp.repeat(fail_f, gpf, axis=1)  # [B, G]
    is_q = jnp.where(fail_g[..., None, None], 0, lines.reshape(B, G, C, 576))

    exp_b = (
        exp_base.reshape(B, G, C, 1).astype(jnp.int32)
        - exp_d.reshape(B, G, C, 61).astype(jnp.int32)
    ).astype(jnp.int16)
    x = _requantize(is_q, exp_b, cfg, rate_idx)
    if C == 2 and joint_stereo:
        st = derive_stereo_coeffs(
            is_q[:, :, 1], st_flags, sfr_bands.reshape(B, G, 61),
            blockcfg_[:, :, 1], rate_idx,
        )
        x = _apply_stereo_coeffs(x, st)
    return _hybrid_synthesis(x, win_idx, aa_bound)
