from .assets import (
    KNOWN_EXTENSIONS,
    Asset,
    bucket_size,
    load_assets,
    pack_bytes,
    scan_assets,
    split_name,
)

__all__ = [
    "KNOWN_EXTENSIONS",
    "Asset",
    "bucket_size",
    "load_assets",
    "pack_bytes",
    "scan_assets",
    "split_name",
]
