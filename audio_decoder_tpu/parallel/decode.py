"""Fused, shardable decode steps.

These are the single-jit production paths: header parse + sample unpack in
one compiled program (no host roundtrip), annotated for a ('data','model')
mesh so the batch axis scales across chips.  The registry's grouped path is
the flexible front door; these fused steps are what the benchmark and the
serving loop run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np

from ..codecs import aiff as aiff_codec
from ..codecs import wav as wav_codec
from ..dsp.consensus import consensus_config
from ..ops.unpack import unpack_pcm
from .mesh import pad_to_multiple


def pad_batch(bufs, lens, multiple: int):
    """Pad the file axis to a multiple of the mesh's data-axis size.

    Sharding requires B % data == 0; uneven batches append zero-length
    rows which the parsers reject (err != 0, n_frames == 0), so padding
    rows contribute nothing to consensus or frame totals.  Returns
    (bufs, lens, valid) with valid[b] False on padding — host-side
    numpy, applied before the device transfer."""
    bufs = np.asarray(bufs)
    lens = np.asarray(lens)
    B = bufs.shape[0]
    Bp = pad_to_multiple(max(B, 1), multiple)
    valid = np.zeros((Bp,), bool)
    valid[:B] = True
    if Bp == B:
        return bufs, lens, valid
    bufs = np.concatenate(
        [bufs, np.zeros((Bp - B,) + bufs.shape[1:], bufs.dtype)])
    lens = np.concatenate([lens, np.zeros((Bp - B,), lens.dtype)])
    return bufs, lens, valid


@functools.partial(
    jax.jit, static_argnames=("bits", "channels", "max_frames", "family")
)
def decode_pcm_step(
    bufs: jax.Array,
    lens: jax.Array,
    *,
    bits: int = 16,
    channels: int = 2,
    max_frames: int,
    family: str = "wav",
):
    """Parse + unpack a uniform-config batch in ONE compiled program.

    Returns (pcm [B, max_frames*channels] flat interleaved — the
    AudioBatch device layout, core/batch.py — plus a meta dict).  Files
    whose actual
    geometry disagrees with the static config get err=ERR_INVALID rather
    than silently mis-decoding.
    """
    if family == "wav":
        meta = jax.vmap(wav_codec._parse_one)(bufs, lens)
        big_endian = False
        unsigned8 = bits == 8
        # only plain integer PCM matches this step's static unpack
        # config — floats, G.711 and ADPCM (err=OK with their own
        # bits) must NOT fall through to the integer path
        fmt_plain = meta["fmt_code"] == wav_codec.FORMAT_PCM
    else:
        meta = jax.vmap(aiff_codec._parse_one)(bufs, lens)
        big_endian = True
        unsigned8 = False
        # aiff fmt_code 0 = big-endian integer PCM; 1 (sowt) is
        # LITTLE-endian and 2+ (floats/G.711/ima4) need other kernels
        fmt_plain = meta["fmt_code"] == 0
    geom_ok = jnp.logical_and(
        fmt_plain,
        jnp.logical_and(meta["bits"] == bits, meta["channels"] == channels),
    )
    err = jnp.where(
        jnp.logical_and(meta["err"] == 0, jnp.logical_not(geom_ok)), 3, meta["err"]
    )
    n_frames = jnp.where(err == 0, meta["n_frames"], 0)
    pcm = unpack_pcm(
        bufs,
        meta["data_off"],
        n_frames,
        bits=bits,
        channels=channels,
        big_endian=big_endian,
        unsigned8=unsigned8,
        is_float=False,
        max_frames=max_frames,
    )
    meta = dict(meta, err=err, n_frames=n_frames)
    return pcm, meta


def sharded_mp3_decode_fn(mesh: Mesh, *, channels: int, joint_stereo: bool,
                          n_big: int = 288, n_c1: int = 144):
    """Bind the fused on-device MP3 decoder to a mesh: every per-file axis
    (raw main_data streams, lane metadata) shards over 'data', so entropy
    decode + DSP run data-parallel across chips with no collectives —
    decode is embarrassingly parallel over files; only downstream
    consensus reduces."""
    from ..codecs.mpeg.dsp import mp3_decode_fused

    data = NamedSharding(mesh, P("data"))

    def step(*args):
        return mp3_decode_fused(
            *args, channels=channels, joint_stereo=joint_stereo,
            n_big=n_big, n_c1=n_c1,
        )

    return jax.jit(step, in_shardings=(data,) * 16, out_shardings=data)


def sharded_l12_fn(mesh: Mesh, *, channels: int, steps: int):
    """Bind the Layer I/II subband synthesis to a mesh: the per-file axis
    of codes/classes/scalefactors shards over 'data' (like the fused L3
    path, decode is collective-free data parallelism)."""
    from ..codecs.mpeg.layer12 import l12_synthesize

    data = NamedSharding(mesh, P("data"))

    def step(codes, cls, sf_idx):
        return l12_synthesize(codes, cls, sf_idx, channels=channels,
                              steps=steps)

    return jax.jit(step, in_shardings=(data, data, data), out_shardings=data)


def sharded_flac_fn(mesh: Mesh, *, window_impl: str = "xla", **static):
    """Bind the fused FLAC decode to a mesh.

    FLAC decode is embarrassingly parallel too, but its work axes are
    LANES (rice partitions / fixed-width runs), not files: the per-lane
    descriptor arrays and per-file metadata shard over 'data'.  The flat
    concatenated byte stream (decoder.pack_group) REPLICATES — lanes
    window into it at absolute bit positions, so a replicated buffer
    costs no collectives on the row gathers (its HBM cost is the
    compressed bytes, small next to the PCM); the final frame scatter
    re-assembles per-file PCM across shards.

    ``window_impl="pallas"`` routes BOTH window assemblies through
    per-shard Pallas kernels composed with the mesh via ``shard_map``
    (ops/window_add.window_add_spmd: local tile-sequential kernels +
    one psum) — GSPMD cannot partition an opaque pallas_call, but the
    lane axis shards cleanly around it.  The XLA scatter remains the
    default for non-TPU meshes."""
    from ..codecs.flac.device import flac_decode_batch

    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    spmd_mesh = mesh if window_impl == "pallas" else None

    def step(*args):
        return flac_decode_batch(*args, window_impl=window_impl,
                                 spmd_mesh=spmd_mesh, **static)

    return jax.jit(step, in_shardings=(rep,) + (data,) * 27,
                   out_shardings=(data, data))


def sharded_decode_fn(mesh: Mesh, **static):
    """Bind decode_pcm_step to a mesh: inputs sharded over 'data', outputs
    likewise; consensus reduction included (a cross-shard collective)."""

    def step(bufs, lens):
        pcm, meta = decode_pcm_step(bufs, lens, **static)
        rate, ch = consensus_config(meta["sample_rate"], meta["channels"], meta["err"])
        return pcm, meta, rate, ch

    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    # the meta dict's keys are family-specific (wav carries block_align);
    # a sharding LEAF is a valid pytree prefix — every [B] meta array
    # shards over 'data' without enumerating keys here
    return jax.jit(
        step,
        in_shardings=(data, data),
        out_shardings=(data, data, rep, rep),
    )
