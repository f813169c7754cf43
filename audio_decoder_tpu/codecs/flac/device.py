"""FLAC fused device decode — rice scan, predictors, stereo, assembly.

One jitted program per static shape config decodes a whole batch of
FLAC files from raw bytes to ``[B, S, C]`` float32 PCM:

1. **Rice lane scan** — the FLAC analogue of the MPEG Huffman scan
   (codecs/mpeg/huffman_device.py), sharing its 8-word row-gather bit
   windows.  Each lane is one rice-coded partition; a ``lax.scan`` step
   decodes ``K`` codes per lane: unary quotient = count-leading-zeros
   on a 64-bit window (NO table gathers), remainder = one more windowed
   read.  Device cost is the row gathers; the ALU fuses to noise
   (measured: tools/flac_rice_probe.py, ~740 Mcodes/s device-side).
2. **Fixed-width lanes** — warmup samples, VERBATIM bodies, CONSTANT
   values and escaped partitions are position-parallel (no serial
   cursor): value i sits at ``bitpos + i*width`` exactly.
3. **Predictor reconstruction** — every subframe is an integer LPC
   (FIXED = spec coefficients with shift 0, VERBATIM = order 0): one
   ``lax.scan`` over samples with a [Ls, 32] coefficient dot per step.
   The 46-bit exact MAC runs on i32+f32 hardware via modular residue
   reconstruction (see ``_exact_mac``).
4. **Stereo decorrelation + assembly** — elementwise channel solves
   per frame mode, then one flat scatter into per-file PCM rows.

The quotient cap: unary runs are unbounded in the spec; the walk counts
each lane's worst quotient, and lanes that see q > Q_CAP (impossible for
any rate-efficient encoder output — the 64-bit window handles q to 40
directly) are routed OUT of the rice scan by the packer: the frontend
decodes those rare values on the host and ships them down the dv
(direct-value) lane, so any legal stream still decodes exactly
(frontend.py outlier routing).  The in-program overflow flag remains as
a belt-and-braces guard and is surfaced per file.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.window_add import window_add as _pallas_window_add
from ...ops.window_add import window_add2 as _pallas_window_add2
from ...ops.window_add import window_add_spmd as _spmd_window_add
from ..mpeg.huffman_device import (
    _aligned_windows,
    _overlap_rows,
    _shift64,
    _win_at,
)
from .frontend import Q_CAP  # max in-lane unary quotient (see module doc)

# Rice scan window geometry.  The scan's wall cost is the per-lane
# column extraction of the fetched window words plus the _win_at select
# trees, so the per-step bit window IS the scan cost model.  Two static
# variants, chosen per batch by the max rice parameter (sizing_for):
#   narrow (param <= 16, i.e. all 16-bit-audio content): with
#     Q_CAP < 32 a whole code q+1+param <= 32 fits the FIRST window
#     read — the remainder is a shift of w1, ONE _win_at per code —
#     and 8 codes stay inside two 8-word rows;
#   wide (any param to 31, rice2 on >16-bit audio): remainder needs its
#     own _win_at; 6 codes per step keep the span inside two rows.
# Max read START offset within a step: code k begins at most
# k*(Q_CAP+1+pmax) bits in, and its last read starts <= Q_CAP+1
# further (narrow: the whole code is read AT the code start).
# Constraint: (127 + span)//32 + 1 <= 14 (two 8-word rows, _win_at's
# hi/lo pair tree) -> span <= 289.
assert Q_CAP < 32
K_NARROW, K_WIDE = 8, 6
K_MAX_NARROW = (K_NARROW - 1) * (Q_CAP + 1 + 16)
K_MAX_WIDE = (K_WIDE - 1) * (Q_CAP + 1 + 31) + Q_CAP + 1
assert K_MAX_NARROW <= 289 and K_MAX_WIDE <= 289
K_MAX = K_MAX_WIDE  # padding worst case


def rice_k(narrow: bool) -> int:
    """Rice codes per scan step for the batch's parameter class."""
    return K_NARROW if narrow else K_WIDE


#: per-file word padding so rows stay in range (8-aligned: the row
#: machinery reshapes words by 4)
PAD_WORDS = -(-(K_MAX // 32 + 24) // 8) * 8


def _be_words(bytes_u8: jax.Array) -> jax.Array:
    """uint8 [B, N] → big-endian u32 words [B, W], padded for the row
    machinery (W % 4 == 0 plus PAD_WORDS of lookahead slack)."""
    B, N = bytes_u8.shape
    if N % 4:
        bytes_u8 = jnp.pad(bytes_u8, ((0, 0), (0, (-N) % 4)))
    b = bytes_u8.reshape(B, -1, 4).astype(jnp.uint32)
    w = (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]
    pad = (-w.shape[1]) % 4 + PAD_WORDS
    return jnp.pad(w, ((0, 0), (0, pad)))


def _sign_extend(u: jax.Array, width: jax.Array) -> jax.Array:
    """Two's-complement sign extension of ``width``-bit values (vector
    width, 0 yields 0)."""
    u = u.astype(jnp.int32)
    sign = (u >> jnp.maximum(width - 1, 0)) & 1
    return jnp.where(width > 0, u - (sign << width), 0)


def _rice_scan(rows8, file_idx, bitpos, count, param, limit, steps: int,
               narrow: bool):
    """Lane-parallel rice decode: [L] lanes, ``steps * rice_k(narrow)``
    codes each (codes past ``count`` are decoded-and-discarded with the
    cursor frozen).  Returns (values i32 [L, steps*K], ovf bool [L])."""
    L = bitpos.shape[0]
    kc = rice_k(narrow)
    k_max = K_MAX_NARROW if narrow else K_MAX_WIDE
    param = param.astype(jnp.uint32)
    pshift = jnp.maximum(32 - param, 1).astype(jnp.uint32)

    def step(carry, ordbase):
        pos, ovf = carry
        a = _aligned_windows(rows8, file_idx, pos, k_max)
        off = jnp.zeros((L,), jnp.int32)
        outs = []
        for k in range(kc):
            live = ordbase + k < count
            w1 = _win_at(a, off)
            # Q_CAP < 32: the unary quotient fits one window read (an
            # all-zero window reads as q = 32 > Q_CAP -> ovf)
            q = lax.clz(w1.astype(jnp.int32))
            ovf = ovf | (live & (q > Q_CAP))
            q = jnp.minimum(q, Q_CAP)
            if narrow:
                # q+1+param <= 32: the whole code rides w1 — no second
                # window read (the scan's dominant ALU saving)
                rem = (w1 << (q + 1).astype(jnp.uint32)) >> pshift
            else:
                rem = _win_at(a, off + q + 1) >> pshift
            rem = jnp.where(param > 0, rem, 0)
            v = ((q.astype(jnp.uint32) << param) | rem).astype(jnp.int32)
            outs.append((v >> 1) ^ -(v & 1))  # unzigzag
            adv = q + 1 + param.astype(jnp.int32)
            off = off + jnp.where(live, adv, 0)
        pos = jnp.minimum(pos + off, limit)
        return (pos, ovf), jnp.stack(outs, axis=1)

    pos0 = jnp.minimum(bitpos, limit)
    ovf0 = jnp.zeros((L,), bool)
    ords = jnp.arange(steps, dtype=jnp.int32) * kc
    (_, ovf), ys = lax.scan(step, (pos0, ovf0), ords)
    return jnp.transpose(ys, (1, 0, 2)).reshape(L, steps * kc), ovf


def _fixed_width(rows8, file_idx, bitpos, width, limit, imax: int):
    """Position-parallel fixed-width signed reads: value i of lane l is
    the ``width[l]``-bit field at ``bitpos[l] + i*width[l]``.  Returns
    i32 [L, imax] (width 0 → zeros)."""
    L = bitpos.shape[0]
    pos = bitpos[:, None] + jnp.arange(imax, dtype=jnp.int32)[None, :] * width[:, None]
    pos = jnp.minimum(pos, limit[:, None]).reshape(-1)
    fidx = jnp.broadcast_to(file_idx[:, None], (L, imax)).reshape(-1)
    # one row gather per element; _win_at with k=0 selects the pair
    a = _aligned_windows(rows8, fidx, pos, 32)
    win = _win_at(a, jnp.zeros_like(pos))
    w = jnp.broadcast_to(width[:, None], (L, imax)).reshape(-1)
    u = win >> jnp.maximum(32 - w, 1).astype(jnp.uint32)
    return _sign_extend(jnp.where(w > 0, u, 0), w).reshape(L, imax)


def _window_add(x: jax.Array, starts: jax.Array, updates: jax.Array
                ) -> jax.Array:
    """Scatter-ADD contiguous windows: ``x[starts[l] + i] += updates[l, i]``.

    The FLAC value layout makes every lane's destinations contiguous
    (dest = lane base + i), so the value scatter is a ROW scatter — on
    this hardware ~an order of magnitude faster than the equivalent
    element scatter (docs/PERFORMANCE.md "row SCATTER is ~13x faster").
    Overlap is harmless by construction: updates beyond a lane's live
    count are zeros, and x starts at zero, so overlapping windows only
    ever add zeros onto real values.  Callers must leave a window of
    slack at the end of ``x`` (CLIP keeps the window in bounds; padding
    lanes start at 0 and add zeros)."""
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    return lax.scatter_add(
        x, starts[:, None], updates, dn,
        indices_are_sorted=False, unique_indices=False,
        mode=lax.GatherScatterMode.CLIP)


def _exact_mac(hist: jax.Array, coef_i: jax.Array, coef_f: jax.Array,
               shift: jax.Array) -> jax.Array:
    """Exact ``(sum_j coef[j] * hist[j]) >> shift`` for 46-bit sums on
    i32+f32 hardware.

    The i32 dot is exact mod 2^32; the f32 dot locates the true sum to
    within << 2^31 (|coef| < 2^14 exact in f32, |hist| < 2^26 rounds
    with error ≤ 2^2 ⇒ per-product error ≤ 2^16, accumulation error
    ≤ 32·2^21 ⇒ total < 2^27).  Their difference is, up to that error,
    an exact multiple of 2^32 — rounding recovers the high word, and
    the arithmetic shift recombines exactly because the true result
    fits i32."""
    lo = jnp.sum(hist * coef_i, axis=1)  # i32, wraps: exact mod 2^32
    accf = jnp.sum(hist.astype(jnp.float32) * coef_f, axis=1)
    k = jnp.floor((accf - lo.astype(jnp.float32)) * jnp.float32(2.0 ** -32)
                  + jnp.float32(0.5)).astype(jnp.int32)
    hi = k - (lo < 0)  # (lo<0) ⇔ lo_u ≥ 2^31 folded into the rounding
    lo_u = lo.astype(jnp.uint32)
    sh = shift.astype(jnp.uint32)
    part = (lo_u >> sh).astype(jnp.int32)
    full = (hi << jnp.minimum(32 - shift, 31).astype(jnp.uint32)) + part
    return jnp.where(shift == 0, lo, full)


K_PRED = 8      # samples reconstructed per predictor scan step


def _predict(vals, kind, order, shift, wasted, coeffs, nmax: int):
    """Reconstruct samples from residuals+warmup for every sublane.

    ``vals`` i32 [Ls, nmax]: positions < order hold warmup samples,
    the rest residuals.  LPC recurrence s[i] = r[i] +
    (Σ c[j]·s[i-1-j] >> shift) via lax.scan over samples; FIXED and
    VERBATIM ride the same path (integer coefficients / order 0).
    The scan is unrolled K_PRED samples per step: the recurrence is
    inherently serial (the shift truncation is nonlinear), so the win
    is amortizing per-step scan overhead, not parallelism — nmax/8
    steps instead of nmax (every bucketed nmax is a multiple of 8)."""
    Ls = vals.shape[0]
    coef_i = coeffs.astype(jnp.int32)
    coef_f = coeffs.astype(jnp.float32)

    def step(hist, xs):
        rs, i0 = xs  # rs [K_PRED, Ls], i0 scalar sample base
        outs = []
        for k in range(K_PRED):
            pred = _exact_mac(hist, coef_i, coef_f, shift)
            s = jnp.where(i0 + k < order, rs[k], rs[k] + pred)
            hist = jnp.concatenate([s[:, None], hist[:, :-1]], axis=1)
            outs.append(s)
        return hist, jnp.stack(outs)

    hist0 = jnp.zeros((Ls, 32), jnp.int32)
    steps = nmax // K_PRED
    xs = (vals.T[:nmax].reshape(steps, K_PRED, Ls),
          jnp.arange(steps, dtype=jnp.int32) * K_PRED)
    _, ys = lax.scan(step, hist0, xs)
    s = ys.reshape(nmax, Ls).T  # [Ls, nmax]
    s = jnp.where(kind[:, None] == 1, vals[:, :1], s)  # CONSTANT broadcast
    return s << wasted[:, None].astype(jnp.uint32)


def _stereo(sub_pcm, fr_mode, channels: int):
    """Undo inter-channel decorrelation: [F, C, N] coded channels →
    [F, C, N] L/R samples, selected per frame mode (0 independent,
    8 left/side, 9 side/right, 10 mid/side)."""
    if channels != 2:
        return sub_pcm
    a, b = sub_pcm[:, 0], sub_pcm[:, 1]
    m = fr_mode[:, None]
    m2 = (a << 1) | (b & 1)
    left = jnp.where(m == 8, a,
           jnp.where(m == 9, a + b,
           jnp.where(m == 10, (m2 + b) >> 1, a)))
    right = jnp.where(m == 8, a - b,
            jnp.where(m == 9, b,
            jnp.where(m == 10, (m2 - b) >> 1, b)))
    return jnp.stack([left, right], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("channels", "nmax", "smax", "rice_steps", "fw_imax",
                     "rice_narrow", "stage", "window_impl", "spmd_mesh"),
)
def flac_decode_batch(
    bytes_u8,       # u8 [Ntot] raw bytes of ALL files, concatenated
    #                 word-aligned (the wire carries actual bytes, not a
    #                 [B, max_file] rectangle)
    file_off,       # i32 [B] absolute start BIT of each file
    file_bits,      # i32 [B] valid bit length per file
    rl_file, rl_sub, rl_bitpos, rl_count, rl_param, rl_dest,  # [Lr]
    fw_file, fw_sub, fw_bitpos, fw_count, fw_width, fw_dest,  # [Lw]
    dv_sub, dv_dest, dv_val,                                  # [Ld]
    sub_kind, sub_order, sub_shift, sub_wasted,               # [Ls]
    sub_coeffs,                                               # [Ls, 32]
    fr_file, fr_start, fr_n, fr_mode,                         # [F]
    fr_scale,                                                 # f32 [F]
    *,
    channels: int,
    nmax: int,
    smax: int,
    rice_steps: int,
    fw_imax: int,
    rice_narrow: bool = False,
    stage: str = "full",
    window_impl: str = "xla",
    spmd_mesh=None,
):
    """Whole-batch FLAC decode → (pcm f32 [B, smax, channels],
    ovf bool [B]).  Sublanes are frame-major/channel-minor, so
    Ls == F * channels and the predictor output reshapes straight into
    frames.  Lane bit positions are ABSOLUTE into the flat stream; the
    per-file lane index only selects the scan limit and the overflow
    slot."""
    words = _be_words(bytes_u8[None, :])
    rows8 = _overlap_rows(words)
    # the static bound is a Python int: clamp it to int32 range — a
    # 240-256 MiB group buckets to a 2^28-byte array whose bit length
    # exceeds int32 (actual lane positions are guarded < 2^31 by the
    # packer, so the clamp never bites a real position)
    limit = jnp.minimum(file_off + file_bits,
                        min(words.shape[1] * 32 - K_MAX - 256, 2**31 - 1))

    Ls = sub_kind.shape[0]
    F = fr_file.shape[0]
    # window slack so every lane's CLIPped window stays in bounds
    W = rice_steps * rice_k(rice_narrow)
    n_vals = Ls * (nmax + 1) + max(W, fw_imax)

    # element-scatter padding sentinel: > any array size → always
    # dropped (headroom below INT32_MAX so per-channel offsets added
    # later cannot wrap)
    oob = np.int32(2**31 - 256)

    # --- fixed-width lanes (warmups, verbatim, constant, escapes)
    # (row gathers all hit batch row 0 — the flat stream)
    fwv = _fixed_width(rows8, jnp.zeros_like(fw_file), fw_bitpos, fw_width,
                       limit[fw_file], fw_imax)
    fi = jnp.arange(fw_imax, dtype=jnp.int32)[None, :]
    fvalid = fi < fw_count[:, None]

    # --- rice lanes
    rv, ovf_l = _rice_scan(rows8, jnp.zeros_like(rl_file), rl_bitpos,
                           rl_count, rl_param, limit[rl_file], rice_steps,
                           rice_narrow)
    if stage == "scan":
        return (rv.sum() + fwv.sum()).astype(jnp.float32)[None], \
            ovf_l.any()[None]
    ri = jnp.arange(W, dtype=jnp.int32)[None, :]
    rvalid = ri < rl_count[:, None]

    # Every value source lands at a CONTIGUOUS per-lane window
    # (dest = lane base + i), so the assembly is two row scatter-adds
    # (an order of magnitude cheaper than the element scatter they
    # replace — see _window_add) plus one small element scatter for the
    # host-decoded rice outliers (q > Q_CAP; padding rows carry an
    # out-of-bounds dest from the packer and drop).  The packer emits
    # lanes in stream order == destination order, which is exactly the
    # sorted-starts contract of the Pallas tile-sequential kernel
    # (ops/window_add.py) — the local TPU path selects it because XLA's
    # scatter lowering runs ~100 M elem/s here regardless of hints.
    rl_starts = rl_sub * (nmax + 1) + rl_dest
    fw_starts = fw_sub * (nmax + 1) + fw_dest
    rl_upd = jnp.where(rvalid, rv, 0)
    fw_upd = jnp.where(fvalid, fwv, 0)
    if window_impl == "pallas" and spmd_mesh is not None:
        # mesh-sharded lanes: per-shard Pallas kernels + one psum
        # (ops/window_add.window_add_spmd)
        vals_flat = (_spmd_window_add(rl_starts, rl_upd, n_vals,
                                      mesh=spmd_mesh)
                     + _spmd_window_add(fw_starts, fw_upd, n_vals,
                                        mesh=spmd_mesh))
    elif window_impl == "pallas":
        # one kernel pass over both lane sets: each output tile is
        # written once (no second full-array materialize + add)
        vals_flat = _pallas_window_add2(rl_starts, rl_upd,
                                        fw_starts, fw_upd, n_vals)
    else:
        vals_flat = jnp.zeros((n_vals,), jnp.int32)
        vals_flat = _window_add(vals_flat, rl_starts, rl_upd)
        vals_flat = _window_add(vals_flat, fw_starts, fw_upd)
    vals_flat = vals_flat.at[dv_sub * (nmax + 1) + dv_dest].add(
        dv_val, mode="drop", unique_indices=True)

    vals = vals_flat[: Ls * (nmax + 1)].reshape(Ls, nmax + 1)[:, :nmax]
    if stage == "vals":
        return vals.sum()[None].astype(jnp.float32), ovf_l.any()[None]

    # --- predictors → samples, stereo, scale
    s = _predict(vals, sub_kind, sub_order, sub_shift, sub_wasted,
                 sub_coeffs, nmax)
    if stage == "predict":
        return s.sum().astype(jnp.float32)[None], ovf_l.any()[None]
    sub_pcm = _stereo(s.reshape(F, channels, nmax), fr_mode, channels)
    pcm_f = sub_pcm.astype(jnp.float32) * fr_scale[:, None, None]

    # --- assemble frames into per-file streams
    # In the flat interleaved [B, smax*channels] output, one frame's
    # samples land CONTIGUOUSLY (all channels interleaved), so the
    # assembly is a row scatter-add too (see _window_add): transpose-
    # reshape the frame PCM to interleaved [F, nmax*channels] rows (a
    # fused relayout copy into a wide trailing dim — NOT a resident
    # [F, nmax, C] tensor, which would tile-pad 64x at C=2) and add each
    # row at its frame's start offset.  Positions past fr_n carry zeros,
    # so window overlap with the next frame is harmless by the
    # scatter-add argument.
    B_out = file_bits.shape[0]
    W_pcm = nmax * channels
    n_pcm = B_out * smax * channels + W_pcm
    ji = jnp.arange(W_pcm, dtype=jnp.int32)[None, :]
    jvalid = (ji // channels) < fr_n[:, None]
    upd = jnp.where(jvalid,
                    jnp.transpose(pcm_f, (0, 2, 1)).reshape(F, W_pcm), 0.0)
    starts = fr_file * (smax * channels) + fr_start * channels
    if window_impl == "pallas" and spmd_mesh is not None:
        out = _spmd_window_add(starts, upd, n_pcm, mesh=spmd_mesh)
    elif window_impl == "pallas":
        out = _pallas_window_add(starts, upd, n_pcm)
    else:
        out = _window_add(jnp.zeros((n_pcm,), jnp.float32), starts, upd)
    # flat interleaved [B, smax*channels] — the AudioBatch device layout
    # (core/batch.py; a trailing channel dim would tile-pad 64x+ on TPU)
    pcm = out[: B_out * smax * channels].reshape(B_out, smax * channels)

    ovf = jnp.zeros((B_out,), bool).at[rl_file].max(ovf_l, mode="drop")
    return pcm, ovf


@functools.partial(
    jax.jit,
    static_argnames=("channels", "nmax", "smax", "rice_steps", "fw_imax",
                     "rice_narrow", "spmd_mesh", "B", "F", "Lr", "Lw", "Ld",
                     "stage", "window_impl"),
)
def flac_decode_wire(
    bytes_u8,       # u8 [Ntot] flat concatenated stream (as decode_batch)
    desc,           # i32 [D] ALL descriptor fields, one tensor
    *,
    channels: int,
    nmax: int,
    smax: int,
    rice_steps: int,
    fw_imax: int,
    rice_narrow: bool,
    spmd_mesh=None,
    B: int,
    F: int,
    Lr: int,
    Lw: int,
    Ld: int,
    stage: str = "full",
    window_impl: str = "xla",
):
    """Two-transfer entry: identical to ``flac_decode_batch`` but every
    descriptor rides ONE int32 tensor (decoder.pack_wire's layout).

    Exists for the tunnel/PCIe wire, not the device: 28 separate
    device_puts pay 28 transfer-latency floors per group (measured
    26 ms each in tunnel-degraded windows — tools/wire_probe.py); one
    tensor pays one.  The static-offset slices below fuse to nothing.
    The per-array entry remains the mesh-sharding surface
    (parallel.decode.sharded_flac_fn shards lanes over 'data'; a flat
    heterogeneous block has no lane axis to shard)."""
    Ls = F * channels
    sizes = ([B, B] + [Lr] * 6 + [Lw] * 6 + [Ld] * 3 + [Ls] * 4
             + [Ls * 32] + [F] * 5)
    parts = []
    at = 0
    for s in sizes:
        parts.append(lax.slice(desc, (at,), (at + s,)))
        at += s
    (file_off, file_bits,
     rl_file, rl_sub, rl_bitpos, rl_count, rl_param, rl_dest,
     fw_file, fw_sub, fw_bitpos, fw_count, fw_width, fw_dest,
     dv_sub, dv_dest, dv_val,
     sub_kind, sub_order, sub_shift, sub_wasted,
     coeffs_flat, fr_file, fr_start, fr_n, fr_mode, fr_scale_i) = parts
    return flac_decode_batch(
        bytes_u8, file_off, file_bits,
        rl_file, rl_sub, rl_bitpos, rl_count, rl_param, rl_dest,
        fw_file, fw_sub, fw_bitpos, fw_count, fw_width, fw_dest,
        dv_sub, dv_dest, dv_val,
        sub_kind, sub_order, sub_shift, sub_wasted,
        coeffs_flat.reshape(Ls, 32),
        fr_file, fr_start, fr_n, fr_mode,
        lax.bitcast_convert_type(fr_scale_i, jnp.float32),
        channels=channels, nmax=nmax, smax=smax,
        rice_steps=rice_steps, fw_imax=fw_imax, rice_narrow=rice_narrow,
        stage=stage, window_impl=window_impl, spmd_mesh=spmd_mesh)
