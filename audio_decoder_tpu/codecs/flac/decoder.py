"""FLAC group decoder: host walk → packed lanes → one fused device program.

Mirrors the MPEG family's shape (codecs/mpeg/decoder.py): the host
front-end (``frontend.analyze``) walks each file's *structure* and this
module packs the resulting flat descriptors for every file of a group
into bucketed batch tensors, then runs ONE jitted device program
(``device.flac_decode_batch``) that rice-decodes, reconstructs the
predictors, undoes stereo decorrelation and assembles per-file PCM.

Grouping key is the channel count (the only true static of the device
program); every other static dimension (block size, stream length, lane
counts, scan depth) is bucketed to the next power of two so recompiles
are logarithmic in workload size, like every other family.

A beyond-reference family — the reference project (blast) decodes
WAV/AIFF and frames MPEG only; there is no FLAC counterpart to cite.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import jax

from ...core import errors as E
from ...core.batch import AudioBatch
from ...utils.trace import TRACE
from . import frontend
from .device import flac_decode_batch, flac_decode_wire, rice_k

def _window_impl() -> str:
    """Value/PCM assembly implementation for the LOCAL decode path: the
    Pallas tile-sequential window-add on TPU (XLA's scatter lowering
    runs ~100 M elem/s there regardless of sorted/unique hints —
    tools/scatter_probe.py; hardware-validated 2026-08-20 on v5e:
    tools/window_add_probe.py bit-exact vs the XLA oracle at both FLAC
    shapes, value assembly 411 ms -> 34 ms); the XLA scatter elsewhere.
    ``ADT_FLAC_WINDOW_IMPL=pallas|xla`` overrides — the escape hatch if
    Mosaic ever rejects/miscompiles on a new runtime, and the way to
    pick the right path under a ``jax.default_device(cpu)`` context on
    a TPU host (this keys on the default BACKEND, not the committed
    execution device).  Resolved lazily so importing this module never
    initializes a backend."""
    import os

    forced = os.environ.get("ADT_FLAC_WINDOW_IMPL")
    if forced in ("pallas", "xla"):
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "xla"


#: the PHYSICAL packing limit: lane bit positions ride int32 on the
#: device.  Distinct from frontend.BIT_CAP (the ROUTING policy, equal in
#: production but shrunk by tests): the chunked path legitimately packs
#: single frames whose span exceeds a shrunken BIT_CAP, and the int32
#: bound never moves.
POS_CAP = 1 << 31

def _bucket(n: int, minimum: int = 1) -> int:
    """Round n up to a power of two OR 3/4 of one (two sizes per octave,
    like the MPEG family's _bucket): pure powers of two waste up to 50%
    padding on wire bytes and scan lanes; the 3/4 step caps it at ~1/3."""
    size = minimum
    while size < n:
        size *= 2
    if size > minimum and n <= size // 4 * 3:
        return size // 4 * 3
    return size


def _bucket_fine(n: int, minimum: int = 1024) -> int:
    """8 geometric steps per octave for the BYTE tensor — the one wire-
    dominant dim.  Padding waste ≤ 1/8 (vs ≤ 1/3 for _bucket); compile
    count stays logarithmic (8 shapes per octave)."""
    size = minimum
    while size < n:
        size *= 2
    if size <= minimum:
        return size
    half = size // 2
    for k in range(1, 8):
        cand = half + half * k // 8
        if n <= cand:
            return cand
    return size


def _pad1(arrs: list[np.ndarray], cap: int, dtype) -> np.ndarray:
    """Concatenate per-file 1-D descriptor arrays and zero-pad to cap."""
    out = np.zeros((cap,), dtype)
    if arrs:
        cat = np.concatenate(arrs)
        out[: cat.shape[0]] = cat
    return out


def _error_batch(names, codes) -> AudioBatch:
    n = len(names)
    return AudioBatch(
        data=jnp.zeros((n, 1), jnp.float32),
        sample_rate=jnp.zeros((n,), jnp.int32),
        num_channels=jnp.zeros((n,), jnp.int32),
        bits_per_sample=jnp.zeros((n,), jnp.int32),
        valid_frames=jnp.zeros((n,), jnp.int32),
        err=jnp.asarray(codes, jnp.int32),
        names=tuple(names),
        formats=("flac",) * n,
    )


def _aligned_size(nbytes: int) -> int:
    """Per-file byte footprint in the flat concatenated stream: files
    start word-aligned so every local bit position maps to
    ``start*8 + local`` with the word fold untouched."""
    return (nbytes + 3) // 4 * 4


def sizing_for(analyses: list[frontend.FlacAnalysis],
               combine: str = "sum") -> dict:
    """Bucketed static dims of the fused program for a group — separable
    so a stream can take the max over its chunks and compile ONCE.

    combine: how the flat byte tensor sizes across the analyses —
    "sum" for a group packed together (decode_group), "max" when each
    analysis packs ALONE against this sizing (stream / chunked paths)."""
    sizes = [_aligned_size(len(a.data)) for a in analyses]
    ntot = (sum(sizes) if combine == "sum" else max(sizes)) + 4
    # the narrow scan variant (one window read per code, 8 codes/step)
    # is legal when every rice parameter fits with Q_CAP in one 32-bit
    # window — i.e. param <= 16, which is every <=16-bit-audio stream
    narrow = all(int(a.rl_param.max(initial=0)) <= 16 for a in analyses)
    return dict(
        rice_narrow=narrow,
        ntot=_bucket_fine(ntot, 1024),
        nmax=_bucket(max(int(a.blocksizes.max()) if a.n_frames else 1
                         for a in analyses), 64),
        smax=_bucket(max(a.total for a in analyses) or 1, 256),
        rice_steps=_bucket(-(-max((int(a.rl_count.max()) for a in analyses
                                   if a.rl_count.size), default=0)
                             // rice_k(narrow)) or 1),
        fw_imax=_bucket(max((int(a.fw_count.max()) for a in analyses
                             if a.fw_count.size), default=0) or 1, 8),
        F=_bucket(sum(a.n_frames for a in analyses) or 1),
        Lr=_bucket(sum(a.rl_sub.size for a in analyses) or 1),
        Lw=_bucket(sum(a.fw_sub.size for a in analyses) or 1),
        Ld=_bucket(sum(a.dv_sub.size for a in analyses) or 1),
    )


def _plan_stream(datas: list[bytes]) -> tuple[np.ndarray, np.ndarray, int]:
    """Flat-stream layout for a list of blobs — knowable BEFORE the walk
    (decode_group ships the bytes while the walk runs).  Returns
    (file_off bits i32 [B], file_bits i32 [B], packed bytes incl. the
    +4 fold tail)."""
    B = len(datas)
    file_off = np.zeros((B,), np.int64)
    file_bits = np.zeros((B,), np.int64)
    at = 0
    for i, d in enumerate(datas):
        file_off[i] = at * 8
        file_bits[i] = len(d) * 8
        at += _aligned_size(len(d))
    packed = at + 4
    # bit positions ride int32 on the device — the PHYSICAL limit on the
    # whole CONCATENATED stream; the routing policy (frontend.BIT_CAP +
    # decode_group's group splitting) keeps packed groups under it.
    # Guard on the ACTUAL packed size, not the bucketed ntot: bucketing
    # may round a legal 240-256 MiB group up to exactly 2^28 bytes, and
    # lane positions only ever reach the actual concatenated length
    # (device.py clamps its own limit arithmetic to int32 range).
    if packed * 8 >= POS_CAP:
        raise E.UnsupportedFormatError(
            "group exceeds int32 device bit positions; split the group")
    return file_off.astype(np.int32), file_bits.astype(np.int32), packed


def _build_stream(datas: list[bytes], file_off: np.ndarray,
                  ntot: int) -> np.ndarray:
    """Materialize the flat byte stream: files concatenate word-aligned,
    so the wire carries actual bytes (+ one bucket step of tail
    padding), not a [B, max_file] rectangle (ntot includes +4 so
    _be_words' 4-byte fold never truncates a partial trailing word)."""
    bufs = np.zeros((ntot,), np.uint8)
    for off, d in zip(file_off, datas):
        b = off // 8
        bufs[b: b + len(d)] = np.frombuffer(d, np.uint8)
    return bufs


def _pack_np(analyses: list[frontend.FlacAnalysis],
             sizing: dict | None = None,
             stream: tuple | None = None) -> tuple[list, dict]:
    """Shared packer: per-field numpy arrays in wire order + statics.

    ``stream`` = (file_off, file_bits) skips rebuilding the byte tensor
    (fields[0] is None then) — decode_group ships the bytes before the
    walk and packs descriptors against the same layout afterwards."""
    B = len(analyses)
    ch = analyses[0].channels

    sz = sizing or sizing_for(analyses)
    ntot, nmax, smax = sz["ntot"], sz["nmax"], sz["smax"]
    rice_steps, fw_imax = sz["rice_steps"], sz["fw_imax"]
    rice_narrow = sz.get("rice_narrow", False)
    F, Lr, Lw, Ld = sz["F"], sz["Lr"], sz["Lw"], sz["Ld"]

    if stream is None:
        file_off, file_bits, _ = _plan_stream([a.data for a in analyses])
        bufs = _build_stream([a.data for a in analyses], file_off, ntot)
    else:
        file_off, file_bits = stream
        _plan_stream([a.data for a in analyses])  # re-assert the guard
        bufs = None

    # --- per-file offsets: frames and sublanes concatenate in stream
    #     order, so global sublane index = (frame_base + f)*ch + c and
    #     the device's frame-major/channel-minor contract is preserved
    fr_file, fr_start, fr_n, fr_mode, fr_scale = [], [], [], [], []
    sub_kind, sub_order, sub_shift, sub_wasted, sub_coeffs = [], [], [], [], []
    rl = {k: [] for k in ("file", "sub", "bitpos", "count", "param", "dest")}
    fw = {k: [] for k in ("file", "sub", "bitpos", "count", "width", "dest")}
    dv = {k: [] for k in ("sub", "dest", "val")}
    frame_base = 0
    for i, a in enumerate(analyses):
        fr_file.append(np.full((a.n_frames,), i, np.int32))
        fr_start.append(a.starts.astype(np.int32))
        fr_n.append(a.blocksizes)
        fr_mode.append(a.ch_mode)
        fr_scale.append(np.full((a.n_frames,), 2.0 ** (1 - a.bits),
                                np.float32))
        sub_kind.append(a.sub_kind)
        sub_order.append(a.sub_order)
        sub_shift.append(a.sub_shift)
        sub_wasted.append(a.sub_wasted)
        sub_coeffs.append(a.sub_coeffs)
        sub_off = frame_base * ch
        rl["file"].append(np.full(a.rl_sub.shape, i, np.int32))
        rl["sub"].append(a.rl_sub + sub_off)
        rl["bitpos"].append(
            (a.rl_bitpos.astype(np.int64) + int(file_off[i]))
            .astype(np.int32))  # in-range: ntot*8 < 2^31 checked above
        rl["count"].append(a.rl_count)
        rl["param"].append(a.rl_param)
        rl["dest"].append(a.rl_dest)
        fw["file"].append(np.full(a.fw_sub.shape, i, np.int32))
        fw["sub"].append(a.fw_sub + sub_off)
        fw["bitpos"].append(
            (a.fw_bitpos.astype(np.int64) + int(file_off[i]))
            .astype(np.int32))
        fw["count"].append(a.fw_count)
        fw["width"].append(a.fw_width)
        fw["dest"].append(a.fw_dest)
        dv["sub"].append(a.dv_sub + sub_off)
        dv["dest"].append(a.dv_dest)
        dv["val"].append(a.dv_val)
        frame_base += a.n_frames

    # dv padding routes out of bounds (dest 0 would clobber sublane 0's
    # first sample; in-bounds sentinels would also duplicate indices,
    # which the device scatter now declares unique)
    dv_dest = np.full((Ld,), 2**31 - 1, np.int32)
    if dv["dest"]:
        cat = np.concatenate(dv["dest"])
        dv_dest[: cat.shape[0]] = cat

    coeffs = np.zeros((F * ch, 32), np.int32)
    if sub_coeffs:
        cat = np.concatenate(sub_coeffs, axis=0)
        coeffs[: cat.shape[0]] = cat

    fields = [
        bufs, file_off, file_bits,
        _pad1(rl["file"], Lr, np.int32), _pad1(rl["sub"], Lr, np.int32),
        _pad1(rl["bitpos"], Lr, np.int32), _pad1(rl["count"], Lr, np.int32),
        _pad1(rl["param"], Lr, np.int32), _pad1(rl["dest"], Lr, np.int32),
        _pad1(fw["file"], Lw, np.int32), _pad1(fw["sub"], Lw, np.int32),
        _pad1(fw["bitpos"], Lw, np.int32), _pad1(fw["count"], Lw, np.int32),
        _pad1(fw["width"], Lw, np.int32), _pad1(fw["dest"], Lw, np.int32),
        _pad1(dv["sub"], Ld, np.int32), dv_dest,
        _pad1(dv["val"], Ld, np.int32),
        _pad1(sub_kind, F * ch, np.int32), _pad1(sub_order, F * ch, np.int32),
        _pad1(sub_shift, F * ch, np.int32),
        _pad1(sub_wasted, F * ch, np.int32),
        coeffs,
        _pad1(fr_file, F, np.int32), _pad1(fr_start, F, np.int32),
        _pad1(fr_n, F, np.int32), _pad1(fr_mode, F, np.int32),
        _pad1(fr_scale, F, np.float32),
    ]
    statics = dict(channels=ch, nmax=nmax, smax=smax,
                   rice_steps=rice_steps, fw_imax=fw_imax,
                   rice_narrow=rice_narrow)
    return fields, statics


def pack_group(analyses: list[frontend.FlacAnalysis],
               sizing: dict | None = None) -> tuple[tuple, dict]:
    """Pack one same-channel-count group into the fused program's
    ``(positional args, static kwargs)`` — the per-array surface the
    mesh-sharded path (parallel.decode.sharded_flac_fn) and the device
    tests consume.  The local decode path rides ``pack_wire`` instead
    (two transfers beat 28 on high-latency wires)."""
    fields, statics = _pack_np(analyses, sizing)
    return tuple(jnp.asarray(f) for f in fields), statics


def pack_wire(analyses: list[frontend.FlacAnalysis],
              sizing: dict | None = None,
              stream: tuple | None = None) -> tuple[tuple, dict]:
    """Pack for ``device.flac_decode_wire``: (bytes, desc) — every
    descriptor field concatenated into ONE int32 tensor so a group
    costs two transfer-latency floors, not 28.

    ``stream`` = (bufs_dev, file_off, file_bits): a byte tensor already
    shipped (decode_group sends it before the walk); its layout MUST
    match _plan_stream's for the same file list."""
    if stream is not None:
        bufs_dev, file_off, file_bits = stream
        fields, statics = _pack_np(analyses, sizing,
                                   stream=(file_off, file_bits))
    else:
        fields, statics = _pack_np(analyses, sizing)
        bufs_dev = jnp.asarray(fields[0])
    B = fields[1].shape[0]
    Lr, Lw, Ld = fields[3].shape[0], fields[9].shape[0], fields[15].shape[0]
    F = fields[23].shape[0]
    desc = np.concatenate(
        [f.reshape(-1) for f in fields[1:27]]
        + [np.ascontiguousarray(fields[27]).view(np.int32)])
    statics = dict(statics, B=B, F=F, Lr=Lr, Lw=Lw, Ld=Ld)
    return (bufs_dev, jnp.asarray(desc)), statics


def _decode_batch(analyses: list[frontend.FlacAnalysis], names: list[str],
                  sizing: dict | None = None,
                  stream: tuple | None = None) -> AudioBatch:
    """Pack one same-channel-count group and run the fused program."""
    B = len(analyses)
    ch = analyses[0].channels
    args, statics = pack_wire(analyses, sizing, stream=stream)
    pcm, ovf = flac_decode_wire(*args, window_impl=_window_impl(),
                                **statics)
    return AudioBatch(
        data=pcm, channels=ch,
        sample_rate=jnp.asarray([a.sample_rate for a in analyses], jnp.int32),
        num_channels=jnp.full((B,), ch, jnp.int32),
        bits_per_sample=jnp.asarray([a.bits for a in analyses], jnp.int32),
        valid_frames=jnp.asarray([a.total for a in analyses], jnp.int32),
        err=jnp.where(ovf, E.ERR_INVALID, 0).astype(jnp.int32),
        names=tuple(names),
        formats=("flac",) * B,
    )


def _host_piece(idxs: list[int], assets) -> tuple[list[int], AudioBatch]:
    """Decode 26-32-bit files on the host (int64-exact; host.decode_ints)
    and batch the nearest-f32 PCM — the f32 surface is lossless through
    25 bits, same contract as 32-bit-int WAV."""
    from . import host

    names, codes, pcms, infos = [], [], [], []
    for i in idxs:
        names.append(assets[i].name)
        try:
            ints, info = host.decode_ints(assets[i].data)
            pcms.append(ints.astype(np.float64)
                        * 2.0 ** (1 - info["bits"]))
            infos.append(info)
            codes.append(0)
        except E.DecodeError as e:
            pcms.append(np.zeros((0, 1)))
            infos.append(dict(rate=0, channels=0, bits=0, total=0))
            codes.append(e.code)
    smax = max((p.shape[0] for p in pcms), default=1) or 1
    cmax = max((p.shape[1] for p in pcms), default=1) or 1
    data = np.zeros((len(idxs), smax * cmax), np.float32)
    for k, p in enumerate(pcms):
        if p.size:
            row = np.zeros((smax, cmax), np.float32)
            row[: p.shape[0], : p.shape[1]] = p.astype(np.float32)
            data[k] = row.reshape(-1)
    return idxs, AudioBatch(
        data=jnp.asarray(data), channels=cmax,
        sample_rate=jnp.asarray([i_["rate"] for i_ in infos], jnp.int32),
        num_channels=jnp.asarray([i_["channels"] for i_ in infos],
                                 jnp.int32),
        bits_per_sample=jnp.asarray([i_["bits"] for i_ in infos],
                                    jnp.int32),
        valid_frames=jnp.asarray([i_["total"] for i_ in infos], jnp.int32),
        err=jnp.asarray(codes, jnp.int32),
        names=tuple(names), formats=("flac",) * len(idxs),
    )


def _chunked_piece(i: int, an: frontend.FlacAnalysis, name: str
                   ) -> tuple[list[int], AudioBatch]:
    """One-shot decode of a >BIT_CAP file through the frame-chunked path
    (stream.slice_frames rebases every chunk's bit positions near zero,
    so int32 device lanes hold them no matter the file size)."""
    from .stream import slice_frames

    F = an.n_frames
    # greedy frame windows: each chunk's byte span stays far inside the
    # cap (so the sliced analyses pass pack_group's int32 guard), and at
    # most 2048 frames so device memory stays bounded
    byte_cap = max(frontend.BIT_CAP // 8 // 16,
                   int((an.byte_offs[1:] - an.byte_offs[:-1]).max()))
    cuts = [0]
    while cuts[-1] < F:
        a = cuts[-1]
        b = min(a + 2048, F)
        while b > a + 1 and int(an.byte_offs[b] - an.byte_offs[a]) > byte_cap:
            b = a + max(1, (b - a) // 2)
        cuts.append(b)
    outs = []
    slices = [slice_frames(an, a, b) for a, b in zip(cuts, cuts[1:])]
    sz = sizing_for(slices, combine="max") if slices else None
    for sl in slices:
        b = _decode_batch([sl], [name], sizing=sz)
        code = int(np.asarray(b.err)[0])
        if code:
            # per-file catch-and-skip, same contract as _host_piece: a
            # bad chunk fails THIS file (error piece), not the family
            return [i], _error_batch([name], [code])
        outs.append(np.asarray(b.data)[0].reshape(
            -1, b.channels)[: sl.total])
    pcm = (np.concatenate(outs, axis=0) if outs
           else np.zeros((0, an.channels), np.float32))
    return [i], AudioBatch(
        data=jnp.asarray(pcm.reshape(1, -1)), channels=an.channels,
        sample_rate=jnp.asarray([an.sample_rate], jnp.int32),
        num_channels=jnp.asarray([an.channels], jnp.int32),
        bits_per_sample=jnp.asarray([an.bits], jnp.int32),
        valid_frames=jnp.asarray([an.total], jnp.int32),
        err=jnp.zeros((1,), jnp.int32),
        names=(name,), formats=("flac",),
    )


#: pipeline granularity: packed bytes per fused-program chunk.  Small
#: enough that chunk k's device program overlaps chunk k+1's h2d (the
#: wire is the binding constraint on tunnel/PCIe hosts), big enough to
#: amortize per-dispatch latency and keep compile shapes few.
CHUNK_BYTES = 12 << 20


def decode_group(assets) -> list[tuple[list[int], AudioBatch]]:
    """Family decoder: ``[(family_local_indices, AudioBatch), ...]``.

    Pipelined: STREAMINFO (cheap header parse) routes and chunk-plans
    every file BEFORE the walk, so each chunk's flat byte stream ships
    host→device while the native walk runs, and chunk k's fused device
    program overlaps chunk k+1's transfer.  Per-file walk failures
    become error-batch pieces (catch-and-skip, like every family).
    Two routes exist beside the fused batch program: 26-32-bit streams
    decode on the host (int64-exact, ``host.decode_ints``), and files
    past BIT_CAP decode frame-chunked (rebased int32 lane positions) —
    no legal RFC 9639 stream is rejected."""
    host_route: list[int] = []
    walk_idx: list[int] = []
    chans: dict[int, int] = {}

    for i, a in enumerate(assets):
        try:
            si = frontend.parse_streaminfo(a.data)
            if si["bits"] > frontend.MAX_BPS:
                host_route.append(i)
                continue
            chans[i] = si["channels"]
        except E.DecodeError:
            pass  # let the walk assign the authoritative error code
        walk_idx.append(i)

    # --- pre-walk chunk plan: same-channel files, flushed at
    #     CHUNK_BYTES (pipeline granularity) and the packed-size caps
    big: list[int] = []
    plans: list[list[int]] = []
    cur: dict[int, tuple[list[int], int]] = {}
    cap_bytes = min(frontend.BIT_CAP, POS_CAP) // 8
    for i in walk_idx:
        ch = chans.get(i)
        if ch is None:
            continue  # walk will fail it with the authoritative code
        fb = _aligned_size(len(assets[i].data))
        # admission mirrors _plan_stream's guard on the PACKED size
        # (word alignment + the +4 fold tail), so a file a few bytes
        # under BIT_CAP cannot slip into the fused route and raise there
        if fb + 8 >= cap_bytes:
            big.append(i)
            continue
        sub, bts = cur.get(ch, ([], 0))
        if sub and (bts + fb + 8 >= cap_bytes or bts + fb > CHUNK_BYTES):
            plans.append(sub)
            sub, bts = [], 0
        sub.append(i)
        cur[ch] = (sub, bts + fb)
    plans.extend(sub for sub, _ in cur.values() if sub)

    # --- EARLY h2d: ship every chunk's byte stream NOW, before the
    #     walk — the stream layout needs only byte lengths.  On the
    #     binding-constraint wire these transfers run while the host
    #     walks the same bytes.
    pending = []
    for sub in plans:
        datas = [assets[i].data for i in sub]
        file_off, file_bits, packed = _plan_stream(datas)
        ntot = _bucket_fine(packed, 1024)
        bufs_dev = jnp.asarray(_build_stream(datas, file_off, ntot))
        pending.append((sub, bufs_dev, file_off, file_bits, ntot))

    analyses: dict[int, frontend.FlacAnalysis] = {}
    failed: list[tuple[int, int]] = []
    with TRACE.stage("flac/walk"):
        # one native session walks every blob exactly once, threaded in
        # C (frontend.analyze_batch; Python thread-pool fallback inside)
        results = frontend.analyze_batch([assets[i].data for i in walk_idx])
        for i, r in zip(walk_idx, results):
            if isinstance(r, E.DecodeError):
                failed.append((i, r.code))
            else:
                analyses[i] = r

    pieces: list[tuple[list[int], AudioBatch]] = []
    if failed:
        pieces.append((
            [i for i, _ in failed],
            _error_batch([assets[i].name for i, _ in failed],
                         [c for _, c in failed]),
        ))
    if host_route:
        with TRACE.stage("flac/host"):
            pieces.append(_host_piece(host_route, assets))

    for sub, bufs_dev, file_off, file_bits, ntot in pending:
        ok = [i for i in sub if i in analyses]
        if not ok:
            continue  # every file already in the error piece
        with TRACE.stage("flac/device"):
            if len(ok) == len(sub):
                sz = sizing_for([analyses[i] for i in sub])
                sz["ntot"] = ntot  # MUST match the pre-shipped tensor
                batch = _decode_batch(
                    [analyses[i] for i in sub],
                    [assets[i].name for i in sub], sizing=sz,
                    stream=(bufs_dev, file_off, file_bits))
            else:
                # rare: a walk failure inside a pre-shipped chunk —
                # repack the survivors fresh (their bytes re-ship)
                batch = _decode_batch([analyses[i] for i in ok],
                                      [assets[i].name for i in ok])
        pieces.append((ok, batch))
    for i in big:
        if i in analyses:
            with TRACE.stage("flac/device"):
                pieces.append(_chunked_piece(i, analyses[i], assets[i].name))
    return pieces
