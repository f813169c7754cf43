from .registry import decode_assets, decode_dir, decode_paths

__all__ = ["decode_assets", "decode_dir", "decode_paths"]
