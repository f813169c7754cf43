"""Extension-dispatched batch decoding — the TPU-native ``main()`` pipeline.

The reference's entry loop decodes files one at a time and skips failures
(blast/src/main.rs:18-89).  Here the pipeline is batch-first:

  1. partition assets by codec family (extension dispatch, main.rs:43-77);
  2. per family, pack all files into one ``[B, N]`` uint8 tensor and run the
     family's *vectorized header parser* once on device;
  3. group files by static unpack config (bit depth / channels / endianness)
     and run one fused unpack kernel per group;
  4. reassemble a single ``AudioBatch`` in the original asset order.

Per-file failures never raise mid-batch: they surface as per-file error
codes (``AudioBatch.err``), mirroring the reference's catch-and-continue.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core import errors as E
from ..core.batch import AudioBatch, concat_batches
from ..io.assets import Asset, load_assets, pack_bytes, scan_assets
from ..ops.unpack import (
    unpack_ima4,
    unpack_ima_adpcm,
    unpack_ms_adpcm,
    unpack_pcm,
)
from ..utils.trace import TRACE
from . import aiff as aiff_codec
from . import au as au_codec
from . import caf as caf_codec
from . import wav as wav_codec

# family name → (vectorized header parser, unpack-config fn, big_endian)
# for the PCM container families; extension routing lives in the model
# registry (audio_decoder_tpu.models.MODELS — the one dispatch surface)
_PARSERS = {
    "wav": (wav_codec.parse_meta_batch, wav_codec.unpack_args, False),
    "aiff": (aiff_codec.parse_meta_batch, aiff_codec.unpack_args, True),
    "au": (au_codec.parse_meta_batch, au_codec.unpack_args, True),
    "caf": (caf_codec.parse_meta_batch, caf_codec.unpack_args, True),
}


def _bucket_frames(n: int, minimum: int = 256) -> int:
    size = minimum
    while size < n:
        size *= 2
    return size


def _error_batch(names, formats, codes) -> AudioBatch:
    n = len(names)
    return AudioBatch(
        data=jnp.zeros((n, 1), jnp.float32),
        sample_rate=jnp.zeros((n,), jnp.int32),
        num_channels=jnp.zeros((n,), jnp.int32),
        bits_per_sample=jnp.zeros((n,), jnp.int32),
        valid_frames=jnp.zeros((n,), jnp.int32),
        err=jnp.asarray(codes, jnp.int32),
        names=tuple(names),
        formats=tuple(formats),
    )


def decode_pcm_family(
    family: str, assets: list[Asset]
) -> list[tuple[list[int], AudioBatch]]:
    """Decode one WAV/AIFF family batch.

    Returns ``(family_local_indices, group_batch)`` pieces — one piece per
    static unpack config (bits/channels/float/endianness) plus one piece for
    files whose header parse failed.
    """
    parse_meta, unpack_args_fn, big_endian = _PARSERS[family]
    bufs_np, lens_np = pack_bytes([a.data for a in assets])
    bufs = jnp.asarray(bufs_np)
    meta = parse_meta(bufs, jnp.asarray(lens_np))
    meta_host = {k: np.asarray(v) for k, v in meta.items()}

    groups: dict[tuple, list[int]] = {}
    failed: list[int] = []
    for i in range(len(assets)):
        if meta_host["err"][i] != E.ERR_OK:
            failed.append(i)
            continue
        row = {k: v[i] for k, v in meta_host.items()}
        cfg = unpack_args_fn(row)
        key = (cfg["bits"], int(row["channels"]), cfg["is_float"],
               cfg["unsigned8"], cfg.get("companded"),
               cfg.get("big_endian", big_endian),
               cfg.get("adpcm"), cfg.get("block_align"))
        groups.setdefault(key, []).append(i)

    pieces: list[tuple[list[int], AudioBatch]] = []
    if failed:
        pieces.append(
            (
                failed,
                _error_batch(
                    [assets[i].name for i in failed],
                    [family] * len(failed),
                    [int(meta_host["err"][i]) for i in failed],
                ),
            )
        )

    for (bits, channels, is_float, unsigned8, companded, be, adpcm,
         block_align), idxs in groups.items():
        sel = np.asarray(idxs, np.int32)
        max_frames = _bucket_frames(int(meta_host["n_frames"][sel].max()))
        if adpcm is not None:
            kern = {"ima": unpack_ima_adpcm, "ms": unpack_ms_adpcm,
                    "ima4": unpack_ima4}[adpcm]
            kw = {} if adpcm == "ima4" else dict(block_align=block_align)
            pcm = kern(
                bufs[sel],
                jnp.asarray(meta_host["data_off"][sel]),
                jnp.asarray(meta_host["n_frames"][sel]),
                channels=channels,
                max_frames=max_frames,
                **kw,
            )
        else:
            pcm = unpack_pcm(
                bufs[sel],
                jnp.asarray(meta_host["data_off"][sel]),
                jnp.asarray(meta_host["n_frames"][sel]),
                bits=bits,
                channels=channels,
                big_endian=be,
                unsigned8=unsigned8,
                is_float=is_float,
                companded=companded,
                max_frames=max_frames,
            )
        batch = AudioBatch(
            data=pcm, channels=channels,
            sample_rate=jnp.asarray(meta_host["sample_rate"][sel]),
            num_channels=jnp.asarray(meta_host["channels"][sel]),
            bits_per_sample=jnp.asarray(meta_host["bits"][sel]),
            valid_frames=jnp.asarray(meta_host["n_frames"][sel]),
            err=jnp.zeros((len(idxs),), jnp.int32),
            names=tuple(assets[i].name for i in idxs),
            formats=(family,) * len(idxs),
        )
        pieces.append((idxs, batch))

    return pieces


def decode_assets(assets: Sequence[Asset]) -> AudioBatch:
    """Decode a mixed list of assets into one ``AudioBatch`` (asset order).

    Routing goes through the model registry (models.MODELS), the single
    extension→decoder dispatch surface."""
    from .. import models  # late: models binds this module's family fns

    assets = list(assets)
    by_family: dict[str, list[int]] = {}
    unknown: list[int] = []
    for i, a in enumerate(assets):
        m = models.for_extension(a.ext)
        if m is None:
            unknown.append(i)  # ≙ "unsupported format" skip, main.rs:73-76
        else:
            by_family.setdefault(m.name, []).append(i)

    pieces: list[tuple[list[int], AudioBatch]] = []
    if unknown:
        pieces.append(
            (
                unknown,
                _error_batch(
                    [assets[i].name for i in unknown],
                    [assets[i].ext for i in unknown],
                    [E.ERR_UNSUPPORTED] * len(unknown),
                ),
            )
        )

    for fam, idxs in by_family.items():
        fam_assets = [assets[i] for i in idxs]
        with TRACE.stage(f"decode/{fam}"):
            fam_pieces = list(models.MODELS[fam].decode_group(fam_assets))
        for local_idxs, batch in fam_pieces:
            # decoded audio-seconds counter (SURVEY §5: per-batch
            # audio-sec/sec observability the reference lacks)
            rate = np.maximum(np.asarray(batch.sample_rate), 1)
            TRACE.add(
                f"decode/{fam}",
                float((np.asarray(batch.valid_frames) / rate).sum()),
            )
            pieces.append(([idxs[j] for j in local_idxs], batch))

    if not pieces:
        return _error_batch([], [], [])

    order = np.concatenate([np.asarray(ix, np.int64) for ix, _ in pieces])
    merged = concat_batches([b for _, b in pieces])
    perm = jnp.asarray(np.argsort(order), jnp.int32)
    return AudioBatch(
        data=merged.data[perm], channels=merged.channels,
        sample_rate=merged.sample_rate[perm],
        num_channels=merged.num_channels[perm],
        bits_per_sample=merged.bits_per_sample[perm],
        valid_frames=merged.valid_frames[perm],
        err=merged.err[perm],
        names=tuple(merged.names[i] for i in np.argsort(order)),
        formats=tuple(merged.formats[i] for i in np.argsort(order)),
    )


def decode_paths(paths: Sequence[str]) -> AudioBatch:
    return decode_assets(load_assets(paths))


def decode_dir(asset_dir: str) -> tuple[AudioBatch, dict[str, int]]:
    """Scan + decode an asset folder (≙ main.rs:13-89).

    Duplicate file stems are rejected after the first occurrence
    (main.rs:82-88); returns the batch plus a name→batch-index map of the
    accepted tracks.
    """
    assets = load_assets(scan_assets(asset_dir))
    seen: dict[str, int] = {}
    kept: list[Asset] = []
    for a in assets:
        if a.name in seen:
            continue  # "multiple files with the same name" skip
        seen[a.name] = len(kept)
        kept.append(a)
    return decode_assets(kept), seen
