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


def _requantize(is_q, exp_b, cfg, rate_idx):
    """sign(is) * |is|^(4/3) * 2^(exp4/4), exponents gathered per band."""
    f = jnp.float32
    l2b = jnp.asarray(_LINE2BAND)[rate_idx.astype(jnp.int32)[:, None, None], cfg]
    exp4 = jnp.take_along_axis(exp_b.astype(jnp.int32), l2b, axis=-1)
    mag = jnp.abs(is_q).astype(f)
    return jnp.sign(is_q).astype(f) * mag ** (4.0 / 3.0) * jnp.exp2(
        exp4.astype(f) * 0.25
    )


def _stereo_mix(x, st_mode):
    """Per-line mode byte → (aL,bL,aR,bR) via LUT, one fused 2x2 mix."""
    f = jnp.float32
    st = jnp.asarray(_ST_LUT, f)[st_mode.astype(jnp.int32)]  # [B,G,576,4]
    x0, x1 = x[:, :, 0], x[:, :, 1]
    L = st[..., 0] * x0 + st[..., 1] * x1
    R = st[..., 2] * x0 + st[..., 3] * x1
    return jnp.stack([L, R], axis=2)


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
    block) → PCM ``[B, T*32, C]``.  Shared by all three MPEG layers.  On
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
    return out.reshape(B, C, Tsteps * 32).transpose(0, 2, 1)


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# On-device stereo-mode derivation (for the fused full-device decode)
# ---------------------------------------------------------------------------

#: line → long sfb index, [9 rates, 576]
def _line2sfb_long() -> np.ndarray:
    m = np.zeros((len(T.RATE_ORDER), 576), np.int32)
    for r, sr in enumerate(T.RATE_ORDER):
        lb = T.SFB_LONG[sr]
        for sfb in range(22):
            m[r, lb[sfb] : lb[sfb + 1]] = sfb
    return m


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


_LINE2SFB_LONG = _line2sfb_long()
_SEG_SFB, _SEG_WIN = _seg_maps()
_LB = np.stack([T.SFB_LONG[sr] for sr in T.RATE_ORDER])  # [9, 23]
#: mixed-block long/short boundary line per rate (= 3*short_bands[3];
#: 36 everywhere except 72 at 8 kHz)
_MIXED_SPLIT = np.array(
    [int(T.SFB_SHORT[sr][3]) * 3 for sr in T.RATE_ORDER], np.int32
)


def derive_stereo_modes(
    is_r: jax.Array,
    st_flags: jax.Array,
    sfr_bands: jax.Array,
    blockcfg_r: jax.Array,
    rate_idx: jax.Array,
) -> jax.Array:
    """Per-line stereo mode bytes, computed on device (ISO 2.4.3.4.9).

    Mirrors frontend._stereo_modes exactly: MS over the full spectrum (or
    below the intensity bound), intensity ratio bands above the right
    channel's zero region, detected per window segment for short blocks.

    Args:
      is_r: int ``[B, G, 576]`` right-channel quantized spectrum (line
        order; nonzero support equals the requantized spectrum's).
      st_flags: int8 ``[B, G]`` bit0 joint, bit1 ms, bit2 intensity,
        bit3 LSF intensity_scale.
      sfr_bands: int8 ``[B, G, 61]`` right-channel scalefactors (22 long,
        then sf_s[sfb, w] at 22 + sfb*3 + w).
      blockcfg_r: int8 ``[B, G]`` right channel block_type | mixed<<2.
      rate_idx: int32 ``[B]``.

    Returns:
      int32 ``[B, G, 576]`` mode bytes (0 LR, 1 MS, 2+k intensity pos k).
    """
    i32 = jnp.int32
    B, G, _ = is_r.shape
    flags = st_flags.astype(i32)
    joint = (flags & 1) > 0
    ms = (flags & 2) > 0
    inten = (flags & 4) > 0
    base_mode = jnp.where(joint & ms, 1, 0)[..., None]  # [B,G,1]

    short_r = (blockcfg_r.astype(i32) & 3) == 2  # [B,G]
    nz = is_r != 0
    r = rate_idx.astype(i32)
    # LSF streams (rate families 1/2) use io^x one-channel scaling rows;
    # mode = 18 + intensity_scale*32 + is_pos (frontend.ST_LSF0)
    lsf = (r >= 3)[:, None, None]  # [B,1,1]
    is_base = jnp.where(lsf, 18 + ((flags >> 3) & 1)[..., None] * 32, 2)

    def is_mode(is_pos):
        return is_base + jnp.minimum(is_pos, jnp.where(lsf, 31, 15))

    # ---- long-block intensity ----
    j1 = jnp.arange(1, 577)
    rzero = jnp.max(jnp.where(nz, j1, 0), axis=-1)  # [B,G]
    lb = jnp.asarray(_LB)[r]  # [B, 23]
    bound_sfb = 1 + jnp.sum(
        (lb[:, None, 1:22] < rzero[..., None]).astype(i32), axis=-1
    )  # [B,G]
    # fully empty right channel: band 0 is intensity too (mpg123 parity)
    bound_sfb = jnp.where(rzero == 0, 0, bound_sfb)
    sfb_line = jnp.asarray(_LINE2SFB_LONG)[r][:, None, :]  # [B,1,576]
    sfr_l = jnp.take_along_axis(
        sfr_bands.astype(i32), jnp.minimum(sfb_line, 20), axis=-1
    )
    is_pos_l = jnp.where(sfb_line < 21, sfr_l, 7)
    zone_l = sfb_line >= bound_sfb[..., None]
    mode_long = jnp.where(
        zone_l,
        jnp.where(is_pos_l == 7, base_mode, is_mode(is_pos_l)),
        base_mode,
    )

    # ---- short-block intensity: per-window bound past the window's last
    # nonzero band; segments strided in reordered line space (pinned to
    # mpg123 via crafted streams, tests/test_intensity.py) ----
    sfb_l = jnp.asarray(_SEG_SFB)[r][:, None, :]  # [B,1,576]
    win_l = jnp.asarray(_SEG_WIN)[r][:, None, :]  # [B,1,576]
    seg_id = sfb_l * 3 + win_l  # [B,1,576] in 0..38
    seg_oh = jax.nn.one_hot(seg_id[:, 0], 39, dtype=jnp.float32)  # [B,576,39]
    seg_nz = jnp.einsum(
        "bgj,bjs->bgs", nz.astype(jnp.float32), seg_oh
    ).reshape(B, G, 13, 3)
    # bound per window = 1 + last band with any nonzero (0 when empty)
    sfb_iota = jnp.arange(13)[None, None, :, None]
    bound_w = jnp.max(
        jnp.where(seg_nz > 0, sfb_iota + 1, 0), axis=2
    )  # [B, G, 3]
    bound_line_w = jnp.take_along_axis(
        bound_w, jnp.broadcast_to(win_l, (B, G, 576)), axis=-1
    )  # [B,G,576] — each line's window bound
    is_pos_s = jnp.take_along_axis(
        sfr_bands.astype(i32),
        22 + jnp.minimum(sfb_l, 11) * 3 + win_l,
        axis=-1,
    )  # [B,G,576]
    in_zone = sfb_l >= bound_line_w
    mode_short = jnp.where(
        in_zone,
        jnp.where(is_pos_s == 7, base_mode, is_mode(is_pos_s)),
        base_mode,
    )

    # mixed blocks: lines below 3*short_bands[3] (36, or 72 at 8 kHz) are
    # the LONG region — long-band rule with the GLOBAL bound (any
    # short-region right content pushes it past the whole long part);
    # lines above use the per-window short rule (pinned to mpg123,
    # tests/test_mixed_blocks.py)
    mixed_r = short_r & (((blockcfg_r.astype(i32) >> 2) & 1) > 0)  # [B,G]
    line_iota = jnp.arange(576)[None, None, :]
    split = jnp.asarray(_MIXED_SPLIT)[r][:, None, None]  # [B,1,1]
    use_long = (~short_r[..., None]) | (
        mixed_r[..., None] & (line_iota < split)
    )
    mode = jnp.where(use_long, mode_long, mode_short)
    # no intensity: MS everywhere (if ms) / LR; mono-joint handled upstream
    mode = jnp.where(inten[..., None], mode, base_mode)
    return jnp.where(joint[..., None], mode, 0)


# ---------------------------------------------------------------------------
# Fused full-device decode: raw main_data bits → PCM in one jitted program
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "channels", "joint_stereo", "n_big", "n_c1", "granules_per_frame",
        "k_big", "n_big_small", "n_c1_small",
    ),
)
def mp3_decode_fused(
    main_u8: jax.Array,
    start_bit: jax.Array,
    end_bit: jax.Array,
    limit_bit: jax.Array,
    big_values: jax.Array,
    region1: jax.Array,
    region2: jax.Array,
    tsel: jax.Array,
    c1sel: jax.Array,
    valid: jax.Array,
    exp_b: jax.Array,
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
    k_big: int | None = None,
    n_big_small: int = 32,
    n_c1_small: int | None = None,
) -> jax.Array:
    """Raw concatenated main_data + per-lane side metadata → PCM.

    The whole Layer III decode below the frame/scalefactor layer runs on
    device: lane-parallel Huffman (huffman_device.decode_spectra), band
    exponent expansion, stereo derivation, antialias, hybrid IMDCT and the
    polyphase synthesis — one compiled program, ~50 bytes of metadata plus
    the compressed bitstream per granule over the wire.

    Lane array shapes are flat ``[B, G*C]`` (tsel ``[B, G*C*3]``);
    exp_b is ``[B, G*C*61]``, st_flags ``[B, G]``, sfr ``[B, G*61]``.

    Lane bucketing: big_values is max-driven per batch but extremely
    skewed in practice (sparse granules encode almost everything in the
    count1 region), so the host may pass ``perm`` (a lane sort by
    descending big_values) plus static ``k_big``: the first ``k_big``
    permuted lanes run the full ``n_big``-pair scan, the rest a short
    ``n_big_small`` scan, and one row scatter restores lane order.  The
    scan is the gather-bound hot loop, so cutting its trip count for the
    sparse majority is a direct win (decoder._split_lanes).
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

    lane_args = [
        file_idx,
        start_bit.reshape(N).astype(jnp.int32),
        end_bit.reshape(N).astype(jnp.int32),
        limit_bit.reshape(N).astype(jnp.int32),
        big_values.reshape(N).astype(jnp.int32),
        region1.reshape(N).astype(jnp.int32),
        region2.reshape(N).astype(jnp.int32),
        tsel.reshape(N, 3).astype(jnp.int32),
        c1sel.reshape(N).astype(jnp.int32),
        valid.reshape(N).astype(jnp.int32),
        rate_lane,
        cfg.reshape(N),
    ]
    if k_big is None:
        lines, fail = decode_spectra(
            main_u8, *lane_args, n_big=n_big, n_c1=n_c1
        )
    else:
        p = perm.astype(jnp.int32)
        pa = [a[p] for a in lane_args]
        lines_b, fail_b = decode_spectra(
            main_u8, *[a[:k_big] for a in pa], n_big=n_big, n_c1=n_c1
        )
        lines_s, fail_s = decode_spectra(
            main_u8, *[a[k_big:] for a in pa], n_big=n_big_small,
            n_c1=n_c1 if n_c1_small is None else n_c1_small,
        )
        # un-permute by SCATTER: int16 row gathers are pathologically slow
        # on this TPU path (~13x the scatter cost at [24k, 576])
        lines_p = jnp.concatenate([lines_b, lines_s], axis=0)
        fail_p = jnp.concatenate([fail_b, fail_s], axis=0)
        lines = jnp.zeros_like(lines_p).at[p].set(lines_p)
        fail = jnp.zeros_like(fail_p).at[p].set(fail_p)
    # Host parity: an entropy failure silences the whole frame (2 granules
    # for MPEG-1, 1 for LSF); failed-but-invalid lanes are already zero.
    gpf = granules_per_frame
    fail_real = fail & (valid.reshape(N) > 0)
    fail_f = jnp.any(fail_real.reshape(B, G // gpf, gpf * C), axis=-1)
    fail_g = jnp.repeat(fail_f, gpf, axis=1)  # [B, G]
    is_q = jnp.where(fail_g[..., None, None], 0, lines.reshape(B, G, C, 576))

    x = _requantize(is_q, exp_b.reshape(B, G, C, 61), cfg, rate_idx)
    if C == 2 and joint_stereo:
        st_mode = derive_stereo_modes(
            is_q[:, :, 1], st_flags, sfr_bands.reshape(B, G, 61),
            blockcfg_[:, :, 1], rate_idx,
        )
        x = _stereo_mix(x, st_mode)
    return _hybrid_synthesis(x, win_idx, aa_bound)
