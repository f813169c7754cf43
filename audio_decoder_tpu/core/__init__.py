from .batch import AudioBatch, AudioFileView, concat_batches
from .errors import (
    ERR_EOF,
    ERR_INVALID,
    ERR_IO,
    ERR_OK,
    ERR_UNSUPPORTED,
    DecodeError,
    InvalidDataError,
    IoError,
    UnexpectedEofError,
    UnsupportedFormatError,
    code_name,
    raise_for_code,
)

__all__ = [
    "AudioBatch",
    "AudioFileView",
    "concat_batches",
    "DecodeError",
    "IoError",
    "UnsupportedFormatError",
    "UnexpectedEofError",
    "InvalidDataError",
    "ERR_OK",
    "ERR_EOF",
    "ERR_UNSUPPORTED",
    "ERR_INVALID",
    "ERR_IO",
    "code_name",
    "raise_for_code",
]
