"""audio_decoder_tpu — a TPU-native audio decode & real-time processing
framework with the capabilities of gitxandert/audio_decoder ("BLAST").

Built from scratch for TPU: batched JAX/XLA/Pallas decode of WAV/AIFF/MPEG
into a unified f32 ``AudioBatch``, consensus configuration + fused DSP, a
voice/group/tempo/sequencer playback engine, sharded multi-chip decode, and
a C++ host runtime (command queue, terminal REPL, audio sink).
"""

from .core import AudioBatch, AudioFileView, DecodeError
from .codecs import decode_assets, decode_dir, decode_paths
from .dsp import (
    consensus_for,
    resample_batch,
    resample_to_consensus,
    route_channels,
)
from .io.assets import scan_assets
from .io.encode import (
    encode_aiff, encode_au, encode_caf, encode_wav, export_batch,
    write_audio,
)
from .io.stream import stream_decode, stream_file

__version__ = "0.1.0"

__all__ = [
    "AudioBatch",
    "AudioFileView",
    "DecodeError",
    "decode_assets",
    "decode_dir",
    "decode_paths",
    "scan_assets",
    "stream_decode",
    "stream_file",
    "encode_wav",
    "encode_aiff",
    "encode_au",
    "encode_caf",
    "write_audio",
    "export_batch",
    "consensus_for",
    "resample_batch",
    "resample_to_consensus",
    "route_channels",
    "__version__",
]


def __getattr__(name):
    # EngineLoop pulls in the runtime stack; keep the import lazy so
    # plain decode users don't pay for it
    if name in ("Engine", "EngineLoop"):
        from .runtime.loop import EngineLoop

        return EngineLoop
    raise AttributeError(name)
