"""Batched MPEG-1 Layer III decode orchestration.

Completes the reference's decode TODO (blast/src/main.rs:44-54): its
mpeg.rs stops at frame framing and returns compressed bytes; here a host
bitstream front-end (``frontend.analyze``, or the C++ ``mp3fe`` library
when built) emits dense per-granule tensors and the jitted batch-parallel
DSP tail (``dsp.mp3_dsp_tail``) turns them into PCM on the TPU.

Files are grouped by (channels, joint-stereo) so each group runs as one
compiled program; granule counts are padded to power-of-two buckets to
bound the number of compiled shapes.
"""

from __future__ import annotations

import itertools
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from ...core import errors as E
from ...core.batch import AudioBatch
from . import frontend
from . import native
from .dsp import compact_lane_wire, mp3_decode_fused, mp3_dsp_tail

if TYPE_CHECKING:  # pragma: no cover
    from ...io.assets import Asset


def _scan_impl() -> str:
    """Entropy-scan implementation for the LOCAL decode path: the Pallas
    VMEM-resident scan on TPU (zero gathers in the walk — the XLA scan
    pays 2-3 HBM row gathers per step plus one serial 677k-entry LUT
    gather per pair; hardware-validated 2026-08-21 on v5e:
    tools/mp3_scan_probe.py bit-exact vs the XLA scans at the benchmark
    lane scale), the XLA scans elsewhere.  ``ADT_MP3_SCAN_IMPL=pallas|
    xla`` overrides — the escape hatch if Mosaic ever rejects or
    miscompiles on a new runtime.  Resolved lazily so importing this
    module never initializes a backend."""
    import os

    import jax

    forced = os.environ.get("ADT_MP3_SCAN_IMPL")
    if forced in ("pallas", "xla"):
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _bucket(n: int, minimum: int = 8) -> int:
    """Round n up to a power of two OR 3/4 of one (two sizes per octave).

    Pure powers of two waste up to 50% padding on every per-granule
    tensor (wire bytes AND scan lanes); the extra 3/4 step caps waste at
    ~1/3 while keeping the compiled-shape count bounded.  3/4 sizes stay
    even (gpf grouping) and keep m_cap % 32 == 0 (row-gather reshape)."""
    size = minimum
    while size < n:
        size *= 2
    if size > minimum and n <= size // 4 * 3:
        return size // 4 * 3
    return size


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
        formats=("mp3",) * n,
    )


def analyze_assets(assets: "list[Asset]"):
    """Host front-end over a list of assets → (analyses, failures).

    analyses: list of (local_index, Mp3Analysis); failures: (idx, errcode).
    """
    analyses = []
    failures = []
    for i, a in enumerate(assets):
        try:
            analyses.append((i, frontend.analyze(a.data)))
        except E.DecodeError as e:
            failures.append((i, e.code))
        except Exception:
            failures.append((i, E.ERR_INVALID))
    return analyses, failures


def decode_analyses(
    idxs: list[int], ans: list["frontend.Mp3Analysis"]
) -> tuple[list[int], AudioBatch]:
    """Run one uniform (channels, joint) group through the DSP tail."""
    ch = ans[0].channels
    joint = any(a.joint_stereo for a in ans)
    B = len(ans)
    G = _bucket(max(a.n_granules for a in ans))
    is_q = np.zeros((B, G, ch, 576), np.int16)
    exp_b = np.zeros((B, G, ch, 61), np.int16)
    st = None
    if ch == 2 and joint:
        st = np.zeros((B, G, 576), np.int8)
    cfg = np.zeros((B, G, ch), np.int8)
    for b, a in enumerate(ans):
        g = a.n_granules
        is_q[b, :g] = a.is_q
        exp_b[b, :g] = a.exp_b
        if st is not None and a.st_mode is not None:
            st[b, :g] = a.st_mode
        cfg[b, :g] = a.blockcfg
    pcm = mp3_dsp_tail(
        jnp.asarray(is_q.reshape(B, G * ch, 576)),
        jnp.asarray(exp_b.reshape(B, G * ch * 61)),
        None if st is None else jnp.asarray(st.reshape(B, G * 576)),
        jnp.asarray(cfg.reshape(B, G * ch)),
        jnp.asarray([a.rate_idx for a in ans], jnp.int32),
        channels=ch,
        joint_stereo=joint,
    )
    batch = AudioBatch(
        data=pcm, channels=ch,
        sample_rate=jnp.asarray([a.sample_rate for a in ans], jnp.int32),
        num_channels=jnp.asarray([a.channels for a in ans], jnp.int32),
        bits_per_sample=jnp.full((B,), 16, jnp.int32),  # MP3 nominal depth
        valid_frames=jnp.asarray([a.n_granules * 576 for a in ans], jnp.int32),
        err=jnp.zeros((B,), jnp.int32),
        names=tuple(str(i) for i in idxs),
        formats=("mp3",) * B,
    )
    return idxs, batch


def _decode_group_native(assets: "list[Asset]") -> list[tuple[list[int], AudioBatch]]:
    """Native-front-end path: threaded C++ bitstream analysis straight into
    the padded tensors, one jitted DSP-tail call per (channels, joint)."""
    probes = [native.probe(a.data) for a in assets]

    pieces: list[tuple[list[int], AudioBatch]] = []
    failed = [i for i, p in enumerate(probes) if p["err"] != 0]
    if failed:
        pieces.append(
            (failed, _error_batch([assets[i].name for i in failed],
                                  [probes[i]["err"] for i in failed]))
        )

    groups: dict[tuple, list[int]] = {}
    for i, p in enumerate(probes):
        if p["err"] == 0:
            groups.setdefault((p["channels"], p["joint"]), []).append(i)

    for (ch, joint), idxs in groups.items():
        g_cap = _bucket(max(probes[i]["n_granules"] for i in idxs))
        r = native.analyze_batch(
            [assets[i].data for i in idxs], g_cap, ch, joint
        )
        rate_idx = _rate_idx_arr(r["sample_rate"])
        B = len(idxs)
        pcm = mp3_dsp_tail(
            jnp.asarray(r["is_q"].reshape(B, g_cap * ch, 576)),
            jnp.asarray(r["exp_b"].reshape(B, g_cap * ch * 61)),
            None if r["st"] is None else jnp.asarray(r["st"].reshape(B, g_cap * 576)),
            jnp.asarray(r["cfg"].reshape(B, g_cap * ch)),
            jnp.asarray(rate_idx),
            channels=ch,
            joint_stereo=joint,
        )
        batch = AudioBatch(
            data=pcm, channels=ch,
            sample_rate=jnp.asarray(r["sample_rate"], jnp.int32),
            num_channels=jnp.asarray(r["channels"], jnp.int32),
            bits_per_sample=jnp.full((B,), 16, jnp.int32),
            valid_frames=jnp.asarray(r["n_granules"] * 576, jnp.int32),
            err=jnp.asarray(r["err"], jnp.int32),
            names=tuple(assets[i].name for i in idxs),
            formats=("mp3",) * B,
        )
        pieces.append((idxs, batch))
    return pieces


def _rate_idx_arr(sample_rate: np.ndarray) -> np.ndarray:
    from . import tables as T

    out = np.zeros(len(sample_rate), np.int32)
    for i, sr in enumerate(np.asarray(sample_rate)):
        out[i] = T.RATE_IDX.get(int(sr), 0)
    return out


def _plan_buckets(big, valid, n_big: int):
    """Pick a static multi-bucket lane split for the device Huffman scan.

    big_values is max-driven per batch but heavily skewed (sparse
    granules put nearly everything in the count1 region; MS side
    channels are nearly empty), so running every lane for the max lane's
    pair count wastes most scan steps.  Sort lanes by descending
    big_values and partition into up to 3 buckets at pair caps chosen by
    a cost model (pairs + half-weight count1 double-lookups); bucket
    boundaries are rounded up to N/8 quanta so distinct compiled shapes
    stay bounded.  Count1 bounds are per bucket: the sort order means a
    dense bucket's count1 region is bounded by its LAST lane.

    Returns (perm, buckets): perm None → no permutation needed (single
    bucket); buckets = ((lane_count, n_big, n_c1), ...) in sorted-lane
    order, counts summing to N, empty buckets dropped."""
    v = np.asarray(valid).reshape(-1) > 0
    bv = np.where(v, np.asarray(big).reshape(-1).astype(np.int64), 0)
    N = bv.size
    order = np.argsort(-bv, kind="stable").astype(np.int32)
    sbv = bv[order]
    # quads actually placeable per lane (invalid lanes place none)
    squads = np.where(v[order], (576 - 2 * sbv).clip(0) // 4 + 1, 0).clip(0, 144)
    quantum = max(32, -(-N // 8))

    def r32(x, cap):
        return int(min(cap, max(32, -(-int(x) // 32) * 32)))

    def eval_plan(caps_desc):
        """caps_desc: descending pair caps, first = n_big (dense)."""
        ks = [int(np.count_nonzero(sbv > cap)) for cap in caps_desc[1:]]
        bounds = []
        prev = 0
        for k in ks:
            kq = min(N, -(-k // quantum) * quantum) if k else 0
            kq = max(kq, prev)
            bounds.append(kq)
            prev = kq
        bounds.append(N)
        buckets = []
        cost = 0.0
        prev = 0
        for cap, b in zip(caps_desc, bounds):
            cnt = b - prev
            if cnt > 0:
                q = r32(squads[prev:b].max(), 144)
                buckets.append((cnt, int(cap), q))
                cost += cnt * (cap + 0.5 * q)
            prev = b
        return cost, tuple(buckets)

    single_cost, single = eval_plan([n_big])
    best_cost, best = single_cost, single
    caps = [c for c in (32, 96, 160, 224) if c < n_big]
    for r in (1, 2):
        for combo in itertools.combinations(caps, r):
            cost, plan = eval_plan([n_big] + sorted(combo, reverse=True))
            if cost < best_cost:
                best_cost, best = cost, plan

    if best == single or best_cost > 0.85 * single_cost:
        return None, single
    if len(best) == 1:  # every lane fits one smaller cap: no perm needed
        return None, best
    return order, best


def _decode_group_fused(
    assets: "list[Asset]", sess=None, sess_idx: list[int] | None = None
) -> list[tuple[list[int], AudioBatch]]:
    """On-device-Huffman path: the host (C++ when available, else Python)
    emits raw main_data + lane metadata; the entire entropy decode + DSP
    runs as ONE jitted program per (channels, joint) group — the wire
    carries the compressed bitstream itself (~50 B metadata/granule).

    With a ``native.Mp3Session`` (sess + the assets' session indices),
    probes come from the session's single open-time frame walk and lane
    emission reuses the stored frame tables — one walk per blob total."""
    use_native = sess is not None or native.available()
    probes = []
    lanes_py: list = []
    if sess is not None:
        probes = [sess.infos[i] for i in sess_idx]
        lanes_py = [None] * len(assets)
    else:
        for a in assets:
            if use_native:
                probes.append(native.probe(a.data))
                lanes_py.append(None)
            else:
                try:
                    ln = frontend.analyze_lanes(a.data)
                    probes.append(dict(
                        err=0, channels=ln.channels, joint=ln.joint_stereo,
                        n_granules=ln.n_granules, sample_rate=ln.sample_rate,
                        main_bytes=len(ln.main_data),
                    ))
                    lanes_py.append(ln)
                except E.DecodeError as e:
                    probes.append(dict(err=e.code))
                    lanes_py.append(None)

    pieces: list[tuple[list[int], AudioBatch]] = []
    failed = [i for i, p in enumerate(probes) if p["err"] != 0]
    if failed:
        pieces.append(
            (failed, _error_batch([assets[i].name for i in failed],
                                  [probes[i]["err"] for i in failed]))
        )

    groups: dict[tuple, list[int]] = {}
    for i, p in enumerate(probes):
        if p["err"] == 0:
            gpf = 2 if p["sample_rate"] >= 32000 else 1  # MPEG-1 vs LSF
            groups.setdefault((p["channels"], bool(p["joint"]), gpf), []).append(i)

    for (ch, joint, gpf), idxs in groups.items():
        B = len(idxs)
        g_cap = _bucket(max(probes[i]["n_granules"] for i in idxs))
        m_cap = _bucket(max(probes[i]["main_bytes"] for i in idxs), 1024)
        if sess is not None:
            r = sess.lanes_batch([sess_idx[i] for i in idxs], g_cap, m_cap, ch)
            sample_rate = r["sample_rate"]
            n_gran = r["n_granules"]
            errs = r["err"]
        elif use_native:
            r = native.lanes_batch([assets[i].data for i in idxs], g_cap, m_cap, ch)
            sample_rate = r["sample_rate"]
            n_gran = r["n_granules"]
            errs = r["err"]
        else:
            r = _pack_python_lanes([lanes_py[i] for i in idxs], g_cap, m_cap, ch)
            sample_rate = r["sample_rate"]
            n_gran = r["n_granules"]
            errs = r["err"]
        act = r["valid"].reshape(-1) > 0
        bvs = r["big"].reshape(-1)[act]
        # pairs beyond 288 still consume bits (count1 cursor), so n_big
        # follows the true max big_values (<= 511), not the 576-line cap
        n_big = 32 if bvs.size == 0 else min(512, int(-(-int(bvs.max()) // 32) * 32))
        perm, buckets = _plan_buckets(
            r["big"].reshape(-1), r["valid"].reshape(-1), n_big
        )
        pcm = mp3_decode_fused(
            *fused_wire_args(r, _rate_idx_arr(sample_rate)),
            None if perm is None else jnp.asarray(perm),
            channels=ch,
            joint_stereo=joint,
            granules_per_frame=gpf,
            buckets=buckets,
            impl=_scan_impl(),
        )
        batch = AudioBatch(
            data=pcm, channels=ch,
            sample_rate=jnp.asarray(sample_rate, jnp.int32),
            num_channels=jnp.asarray(r["channels"], jnp.int32),
            bits_per_sample=jnp.full((B,), 16, jnp.int32),
            valid_frames=jnp.asarray(n_gran * 576, jnp.int32),
            err=jnp.asarray(errs, jnp.int32),
            names=tuple(assets[i].name for i in idxs),
            formats=("mp3",) * B,
        )
        pieces.append((idxs, batch))
    return pieces


def fused_wire_args(r: dict, rate_idx) -> list:
    """Packed lane dict (native.lanes_batch / _pack_python_lanes layout) →
    the positional device arrays of ``dsp.mp3_decode_fused`` (sans perm),
    wire-compacted via ``compact_lane_wire``.  A lane whose exponents
    can't ship exactly (impossible for spec-legal streams) is dropped to
    the invalid path — its frame decodes silent, like other lane errors."""
    B, G, ch = r["start"].shape
    L = G * ch
    end_rel, lim_rel, exp_base, exp_d, ok = compact_lane_wire(
        r["start"], r["end"], r["limit"], r["exp_b"], r["cfg"], rate_idx
    )
    valid = np.where(ok, np.asarray(r["valid"]), 0)
    return [
        jnp.asarray(r["main"]),
        jnp.asarray(r["start"].reshape(B, L)),
        jnp.asarray(end_rel.reshape(B, L)),
        jnp.asarray(lim_rel.reshape(B, L)),
        jnp.asarray(r["big"].reshape(B, L)),
        jnp.asarray(r["r1"].reshape(B, L)),
        jnp.asarray(r["r2"].reshape(B, L)),
        jnp.asarray(r["tsel"].reshape(B, L * 3)),
        jnp.asarray(r["c1sel"].reshape(B, L)),
        jnp.asarray(valid.reshape(B, L)),
        jnp.asarray(exp_base.reshape(B, L)),
        jnp.asarray(exp_d.reshape(B, L * 61)),
        jnp.asarray(r["cfg"].reshape(B, L)),
        jnp.asarray(r["stflags"].reshape(B, G)),
        jnp.asarray(r["sfr"].reshape(B, G * 61)),
        jnp.asarray(np.asarray(rate_idx, np.int32)),
    ]


def _pack_python_lanes(lanes, g_cap: int, m_cap: int, ch: int) -> dict:
    """Pad per-file Python Mp3Lanes into the batch tensors (native layout)."""
    B = len(lanes)
    r = dict(
        main=np.zeros((B, m_cap), np.uint8),
        start=np.zeros((B, g_cap, ch), np.int32),
        end=np.zeros((B, g_cap, ch), np.int32),
        limit=np.zeros((B, g_cap, ch), np.int32),
        big=np.zeros((B, g_cap, ch), np.int16),
        r1=np.zeros((B, g_cap, ch), np.int16),
        r2=np.zeros((B, g_cap, ch), np.int16),
        tsel=np.zeros((B, g_cap, ch, 3), np.int8),
        c1sel=np.zeros((B, g_cap, ch), np.int8),
        valid=np.zeros((B, g_cap, ch), np.int8),
        exp_b=np.zeros((B, g_cap, ch, 61), np.int16),
        cfg=np.zeros((B, g_cap, ch), np.int8),
        stflags=np.zeros((B, g_cap), np.int8),
        sfr=np.zeros((B, g_cap, 61), np.int8),
        err=np.zeros((B,), np.int32),
        n_granules=np.zeros((B,), np.int32),
        sample_rate=np.zeros((B,), np.int32),
        channels=np.zeros((B,), np.int32),
    )
    for b, ln in enumerate(lanes):
        g = ln.n_granules
        r["main"][b, : len(ln.main_data)] = ln.main_data
        r["start"][b, :g] = ln.start_bit
        r["end"][b, :g] = ln.end_bit
        r["limit"][b, :g] = ln.limit_bit
        r["big"][b, :g] = ln.big_values
        r["r1"][b, :g] = ln.region1
        r["r2"][b, :g] = ln.region2
        r["tsel"][b, :g] = ln.tsel
        r["c1sel"][b, :g] = ln.c1sel
        r["valid"][b, :g] = ln.valid
        r["exp_b"][b, :g] = ln.exp_b
        r["cfg"][b, :g] = ln.blockcfg
        r["stflags"][b, :g] = ln.st_flags
        r["sfr"][b, :g] = ln.sfr_bands
        r["n_granules"][b] = g
        r["sample_rate"][b] = ln.sample_rate
        r["channels"][b] = ln.channels
    return r


def _decode_group_layer12(
    assets: "list[Asset]", layer: int
) -> list[tuple[list[int], AudioBatch]]:
    """Layer I/II path: host fixed-width parse → jitted requantize +
    shared polyphase synthesis (layer12.py)."""
    from . import layer12 as L12

    analyze = L12.analyze_l1 if layer == 1 else L12.analyze_l2
    analyses: list = []
    failures: list = []
    for i, a in enumerate(assets):
        try:
            analyses.append((i, analyze(a.data)))
        except E.DecodeError as e:
            failures.append((i, e.code))
        except Exception:
            failures.append((i, E.ERR_INVALID))

    pieces: list[tuple[list[int], AudioBatch]] = []
    if failures:
        idxs = [i for i, _ in failures]
        pieces.append(
            (idxs, _error_batch([assets[i].name for i in idxs],
                                [c for _, c in failures]))
        )

    groups: dict[int, list] = {}
    for i, an in analyses:
        groups.setdefault(an.channels, []).append((i, an))
    for ch, items in groups.items():
        idxs = [i for i, _ in items]
        ans = [a for _, a in items]
        B = len(ans)
        steps = ans[0].steps_per_frame
        F = _bucket(max(a.n_frames for a in ans))
        codes = np.zeros((B, F, ch, 32, steps), np.int32)
        cls = np.zeros((B, F, ch, 32), np.int8)
        sf_idx = np.full((B, F, ch, 32, 3), 63, np.int8)
        for b, a in enumerate(ans):
            codes[b, : a.n_frames] = a.codes
            cls[b, : a.n_frames] = a.cls
            sf_idx[b, : a.n_frames] = a.sf_idx
        pcm = L12.l12_synthesize(
            jnp.asarray(codes), jnp.asarray(cls), jnp.asarray(sf_idx),
            channels=ch, steps=steps,
        )
        batch = AudioBatch(
            data=pcm, channels=ch,
            sample_rate=jnp.asarray([a.sample_rate for a in ans], jnp.int32),
            num_channels=jnp.asarray([a.channels for a in ans], jnp.int32),
            bits_per_sample=jnp.full((B,), 16, jnp.int32),
            valid_frames=jnp.asarray(
                [a.n_frames * steps * 32 for a in ans], jnp.int32
            ),
            err=jnp.zeros((B,), jnp.int32),
            names=tuple(assets[i].name for i in idxs),
            formats=((f"mp{layer}",) * B),
        )
        pieces.append((idxs, batch))
    return pieces


def decode_group(assets: "list[Asset]") -> list[tuple[list[int], AudioBatch]]:
    """Decode a group of MPEG-audio assets → (local_indices, AudioBatch).

    Routes by the layer of the first valid frame: Layer III takes the
    fused on-device-Huffman path; Layers I/II take the fixed-width
    subband path.  The host-Huffman Layer III paths remain available for
    reference and tests.

    With the native front-end, every blob is frame-walked exactly ONCE:
    an ``Mp3Session`` walks at open time and serves layer routing, the
    grouping probes, the channel guard, and lane emission from the
    stored frame tables (the reference walks once too, mpeg.rs:7-128;
    the pre-session code here walked up to 4x per blob)."""
    sess = None
    if native.available():
        sess = native.Mp3Session([a.data for a in assets])
        layers = sess.layers
    else:
        layers = [frontend.probe_layer(a.data) for a in assets]

    try:
        by_layer: dict[int, list[int]] = {}
        for i, layer in enumerate(layers):
            by_layer.setdefault(layer, []).append(i)

        pieces: list[tuple[list[int], AudioBatch]] = []
        for layer, idxs in by_layer.items():
            sub = [assets[i] for i in idxs]
            if layer in (1, 2):
                sub_pieces = _decode_group_layer12(sub, layer)
            else:  # Layer III or undetected (fused path reports errors)
                sub_pieces = _decode_group_fused(sub, sess=sess, sess_idx=idxs)
            for local, batch in sub_pieces:
                pieces.append(([idxs[j] for j in local], batch))
        return pieces
    finally:
        if sess is not None:
            sess.close()


def decode_group_hosthuff(
    assets: "list[Asset]",
) -> list[tuple[list[int], AudioBatch]]:
    """Host-Huffman decode path (C++ or Python front-end + DSP tail)."""
    if native.available():
        return _decode_group_native(assets)
    analyses, failures = analyze_assets(assets)

    pieces: list[tuple[list[int], AudioBatch]] = []
    if failures:
        idxs = [i for i, _ in failures]
        pieces.append(
            (idxs, _error_batch([assets[i].name for i in idxs],
                                [c for _, c in failures]))
        )

    groups: dict[tuple, list[tuple[int, frontend.Mp3Analysis]]] = {}
    for i, an in analyses:
        groups.setdefault((an.channels, an.joint_stereo), []).append((i, an))

    for (_ch, _joint), items in groups.items():
        idxs = [i for i, _ in items]
        ans = [a for _, a in items]
        got_idxs, batch = decode_analyses(idxs, ans)
        batch = AudioBatch(
            data=batch.data, channels=batch.channels,
            sample_rate=batch.sample_rate,
            num_channels=batch.num_channels,
            bits_per_sample=batch.bits_per_sample,
            valid_frames=batch.valid_frames,
            err=batch.err,
            names=tuple(assets[i].name for i in idxs),
            formats=batch.formats,
        )
        pieces.append((got_idxs, batch))

    return pieces


class Mp3Stream:
    """Chunked single-file Layer III decode: bounded memory, static shapes.

    The batch path materializes a whole file's PCM in one program whose
    shapes scale with file length — fine for asset folders, wrong for a
    two-hour stream (every new length bucket is a fresh compile and the
    granule tensors grow without bound).  This decoder walks the file
    ONCE on the host (the same ``lanes_batch``/``analyze_lanes`` emission
    the batch path uses), then decodes fixed-size granule windows through
    the same fused device program, so ONE compiled shape serves any file
    length and device memory is O(granules_per_chunk).

    Chunk boundaries are made exact with a 2-granule warm-up re-decoded
    at the head of every chunk (and discarded):

      * the bit reservoir needs no decoded state at all — each lane's
        absolute bit window into the concatenated main_data already
        resolves ``main_data_begin``, the chunk just ships the byte
        slice its windows cover;
      * hybrid-IMDCT overlap-add is one granule of memory, and the
        overlap TAIL a granule hands forward is a pure function of that
        granule's own spectra — so warm-up granule #2 hands the first
        kept granule its exact overlap;
      * the polyphase synthesis FIR window spans 16 V-steps < the 18
        steps one granule pushes, so the kept region's history lies
        entirely inside correctly-overlapped warm-up output.

    Yields float32 ``[samples, channels]`` host chunks; concatenated
    output is bit-identical to the one-shot batch decode (pinned by
    tests/test_mp3_stream.py).  The reference has no streaming decode of
    any kind (its mpeg.rs stops at framing; playback streams via the
    ALSA ring, runtime.rs:282-291)."""

    WARMUP = 2

    def __init__(self, data: bytes, granules_per_chunk: int = 512):
        if frontend.probe_layer(data) != 3:
            raise E.UnsupportedFormatError(
                "Mp3Stream decodes Layer III; use decode_group for I/II")
        if granules_per_chunk < 8:
            raise ValueError("granules_per_chunk must be >= 8")
        self.gpc = int(granules_per_chunk)
        if native.available():
            p = native.probe(data)
            E.raise_for_code(int(p["err"]), "mp3 stream probe")
            ch = int(p["channels"])
            g_tot = int(p["n_granules"])
            m_cap = -(-int(p["main_bytes"]) // 32) * 32
            self._r = native.lanes_batch([data], max(g_tot, 1), m_cap, ch)
            self._joint = bool(p["joint"])
        else:
            ln = frontend.analyze_lanes(data)
            ch, g_tot = ln.channels, ln.n_granules
            m_cap = -(-len(ln.main_data) // 32) * 32
            self._r = _pack_python_lanes([ln], max(g_tot, 1), m_cap, ch)
            self._joint = bool(ln.joint_stereo)
        E.raise_for_code(int(self._r["err"][0]), "mp3 stream")
        self.channels = ch
        self.n_granules = g_tot
        self.sample_rate = int(self._r["sample_rate"][0])
        self.total_samples = g_tot * 576
        self._gpf = 2 if self.sample_rate >= 32000 else 1
        self._rate_idx = _rate_idx_arr(self._r["sample_rate"])
        # One static plan for the WHOLE stream: a per-chunk plan would
        # recompile the fused program every time its quantized shape
        # moved; here every chunk shares one (g_cap, m_cap, n_big,
        # bucket) signature, so the stream costs ONE compile total (the
        # batch path optimizes per-batch instead — its lanes all run in
        # the same program anyway).
        v = self._r["valid"][0] > 0
        bvs = self._r["big"][0][v]
        self._n_big = (32 if bvs.size == 0
                       else min(512, int(-(-int(bvs.max()) // 32) * 32)))
        g_cap = self.gpc + self.WARMUP
        need = 64
        for a in range(0, g_tot, self.gpc):
            lo, hi = max(a - self.WARMUP, 0), min(a + self.gpc, g_tot)
            _b, n = self._byte_window(lo, hi)
            need = max(need, n)
        self._m_cap = _bucket(need, 1024)
        self._buckets = ((g_cap * ch, self._n_big, 144),)

    def _byte_window(self, lo: int, hi: int) -> tuple[int, int]:
        """(byte_lo, byte_count) of main_data covering granules [lo, hi)
        — every reservoir reach-back and scan row-gather slack included."""
        r = self._r
        act = r["valid"][0, lo:hi] > 0
        if not act.any():
            return 0, 64
        bit_lo = int(r["start"][0, lo:hi][act].min())
        bit_hi = int(max(r["end"][0, lo:hi][act].max(),
                         r["limit"][0, lo:hi][act].max()))
        byte_lo = (bit_lo // 8) // 32 * 32
        return byte_lo, bit_hi // 8 + 1 - byte_lo + 64

    def _chunk_pcm(self, lo: int, hi: int, g_cap: int) -> np.ndarray:
        """Decode granules [lo, hi) into a [g_cap*576, C] array."""
        r = self._r
        g_n = hi - lo
        ch = self.channels
        sl = dict(
            start=np.zeros((1, g_cap, ch), np.int32),
            end=np.zeros((1, g_cap, ch), np.int32),
            limit=np.zeros((1, g_cap, ch), np.int32),
            big=np.zeros((1, g_cap, ch), np.int16),
            r1=np.zeros((1, g_cap, ch), np.int16),
            r2=np.zeros((1, g_cap, ch), np.int16),
            tsel=np.zeros((1, g_cap, ch, 3), np.int8),
            c1sel=np.zeros((1, g_cap, ch), np.int8),
            valid=np.zeros((1, g_cap, ch), np.int8),
            exp_b=np.zeros((1, g_cap, ch, 61), np.int16),
            cfg=np.zeros((1, g_cap, ch), np.int8),
            stflags=np.zeros((1, g_cap), np.int8),
            sfr=np.zeros((1, g_cap, 61), np.int8),
        )
        for k in sl:
            sl[k][0, :g_n] = r[k][0, lo:hi]
        # rebase the bit windows onto the chunk's main_data byte slice:
        # the reservoir reaches backward only through these windows, so
        # covering [min start, max limit/end) bytes is sufficient by
        # construction (+64 slack for the scan's 8-word row gathers)
        act = sl["valid"][0, :g_n] > 0
        for k in ("start", "end", "limit"):  # invalid lanes keep absolute
            sl[k][0, :g_n][~act] = 0         # offsets — zero, like padding
        byte_lo, _need = self._byte_window(lo, hi)
        main = np.zeros((1, self._m_cap), np.uint8)
        avail = min(self._m_cap, r["main"].shape[1] - byte_lo)
        main[0, :avail] = r["main"][0, byte_lo : byte_lo + avail]
        for k in ("start", "end", "limit"):
            sl[k][0, :g_n][act] -= byte_lo * 8
        rc = dict(sl, main=main)

        pcm = mp3_decode_fused(
            *fused_wire_args(rc, self._rate_idx),
            None,
            channels=self.channels,
            joint_stereo=self._joint,
            granules_per_frame=self._gpf,
            buckets=self._buckets,
            impl=_scan_impl(),
        )
        # the kernel emits flat interleaved [B, S*C]; host reshape is free
        return np.asarray(pcm[0]).reshape(-1, self.channels)

    def chunks(self, start_sample: int = 0):
        """Yield float32 [samples, channels] host arrays in stream order.

        `start_sample` seeks: output begins exactly at that sample of the
        one-shot decode (concatenated chunks == ``oneshot[start_sample:]``
        bit-identically).  Seeking costs nothing extra — the 2-granule
        warm-up that makes every chunk boundary exact also makes any
        granule a valid entry point (the reservoir is resolved through
        absolute byte windows, not decoded state)."""
        if not 0 <= start_sample <= self.total_samples:
            raise ValueError(
                f"start_sample {start_sample} outside [0, {self.total_samples}]")
        g0 = start_sample // 576
        trim = start_sample - g0 * 576
        g_cap = self.gpc + self.WARMUP
        for a in range(g0, self.n_granules, self.gpc):
            lo = max(a - self.WARMUP, 0)
            hi = min(a + self.gpc, self.n_granules)
            pcm = self._chunk_pcm(lo, hi, g_cap)
            keep = a - lo
            out = pcm[keep * 576 : (keep + hi - a) * 576, : self.channels]
            if trim:
                out, trim = out[trim:], 0
            yield out

    def __iter__(self):
        return self.chunks()


class L12Stream:
    """Chunked single-file Layer I/II streaming decode.

    Layers I/II have NO bit reservoir — every frame's payload is
    self-contained — so unlike Layer III the host analysis can also be
    O(chunk): __init__ walks the sync headers once (positions only), and
    each chunk re-parses just the byte slice its frames occupy.  The only
    cross-chunk state is the polyphase synthesis FIR history (16
    V-steps); re-decoding ceil(16 / steps_per_frame) warm-up frames at
    each chunk head — 1 frame for Layer II (36 steps), 2 for Layer I
    (12) — reproduces it exactly, so concatenated chunks are
    bit-identical to the one-shot decode (pinned by
    tests/test_mp3_stream.py).  The reference has no streaming decode of
    any kind (mpeg.rs stops at framing)."""

    def __init__(self, data: bytes, layer: int | None = None,
                 frames_per_chunk: int = 128):
        from . import layer12 as L12

        if layer is None:
            layer = frontend.probe_layer(data)
        if layer not in (1, 2):
            raise E.UnsupportedFormatError(
                f"L12Stream decodes Layers I/II (probed layer {layer})")
        if frames_per_chunk < 2:
            raise ValueError("frames_per_chunk must be >= 2")
        code = 3 if layer == 1 else 2  # header layer code
        frames = [(p, h) for p, h in frontend.find_frames(data)
                  if h["layer"] == code]
        if not frames:
            raise E.InvalidDataError(f"no Layer {'I' * layer} frames")
        h0 = frames[0][1]
        # same consistency filter as analyze_l1/l2 so framing matches
        self._frames = [
            (p, h) for p, h in frames
            if h["sr"] == h0["sr"] and h["channels"] == h0["channels"]
            and h["version"] == h0["version"]
        ]
        self._blob = data
        self._analyze = L12.analyze_l1 if layer == 1 else L12.analyze_l2
        self.layer = layer
        self.fpc = int(frames_per_chunk)
        self.channels = h0["channels"]
        self.sample_rate = h0["sr"]
        self.spf = 12 if layer == 1 else 36  # V-steps per frame
        #: the synthesis FIR window spans 16 V-steps of history
        self.WARMUP = -(-16 // self.spf)
        self.n_frames = len(self._frames)
        self.total_samples = self.n_frames * self.spf * 32

    def chunks(self, start_sample: int = 0):
        """Yield float32 [samples, channels] host chunks; `start_sample`
        seeks (output == one-shot ``pcm[start_sample:]`` bit-identically)."""
        from . import layer12 as L12

        if not 0 <= start_sample <= self.total_samples:
            raise ValueError(
                f"start_sample {start_sample} outside [0, {self.total_samples}]")
        spfr = self.spf * 32  # samples per frame
        f0 = start_sample // spfr
        trim = start_sample - f0 * spfr
        F_cap = self.fpc + self.WARMUP
        ch = self.channels
        for a in range(f0, self.n_frames, self.fpc):
            lo = max(a - self.WARMUP, 0)
            hi = min(a + self.fpc, self.n_frames)
            sub = self._frames[lo:hi]
            b0 = sub[0][0]
            b1 = sub[-1][0] + sub[-1][1]["frame_len"]
            an = self._analyze(
                self._blob[b0:b1], frames=[(p - b0, h) for p, h in sub])
            n = hi - lo
            codes = np.zeros((1, F_cap, ch, 32, self.spf), np.int32)
            cls = np.zeros((1, F_cap, ch, 32), np.int8)
            sf_idx = np.full((1, F_cap, ch, 32, 3), 63, np.int8)
            codes[0, :n] = an.codes
            cls[0, :n] = an.cls
            sf_idx[0, :n] = an.sf_idx
            pcm = np.asarray(L12.l12_synthesize(
                jnp.asarray(codes), jnp.asarray(cls), jnp.asarray(sf_idx),
                channels=ch, steps=self.spf,
            )[0]).reshape(-1, ch)  # kernel emits flat interleaved
            keep = a - lo
            out = pcm[keep * spfr : (keep + hi - a) * spfr, :ch]
            if trim:
                out, trim = out[trim:], 0
            yield out

    def __iter__(self):
        return self.chunks()


def mpeg_stream(data: bytes, *, granules_per_chunk: int = 512,
                frames_per_chunk: int = 128):
    """Streaming decoder for any MPEG audio layer: probes the first valid
    frame and returns an Mp3Stream (Layer III) or L12Stream (I/II).
    Both yield float32 [samples, channels] chunks whose concatenation is
    bit-identical to the one-shot decode, and both seek via
    ``.chunks(start_sample=N)``."""
    layer = frontend.probe_layer(data)
    if layer == 3:
        return Mp3Stream(data, granules_per_chunk=granules_per_chunk)
    if layer in (1, 2):
        return L12Stream(data, layer=layer, frames_per_chunk=frames_per_chunk)
    raise E.InvalidDataError("no MPEG audio frames found")


#: standard MDCT + synthesis filterbank decoder delay (samples): the
#: first 529 output samples of any conformant decoder are filter warm-up
DECODER_DELAY = 529


def gapless_bounds(blob: bytes, total_frames: int) -> tuple[int, int] | None:
    """(start, length) window of the true audio within the decoded PCM.

    Uses the LAME tag's encoder delay/padding plus the standard
    529-sample decoder delay, so ``pcm[start : start + length]`` is the
    encoder's input sample-exactly in position and length (the raw
    decode leads with delay+529 warm-up samples and trails with
    padding-529 flush samples).  None when the stream carries no tag."""
    info = frontend.lame_gapless(blob)
    if info is None:
        return None
    start = info["delay"] + DECODER_DELAY
    if info["frames"]:
        length = (info["frames"] * info["samples_per_frame"]
                  - info["delay"] - info["padding"])
    else:
        length = total_frames - start - max(
            info["padding"] - DECODER_DELAY, 0)
    length = max(0, min(length, total_frames - start))
    if start >= total_frames:
        return None
    return start, length
