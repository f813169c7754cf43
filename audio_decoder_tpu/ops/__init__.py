from . import bytes  # noqa: A004 — module name mirrors its subject
from .unpack import unpack_pcm

__all__ = ["bytes", "unpack_pcm"]
