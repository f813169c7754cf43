from .mesh import batch_sharding, make_mesh, pad_to_multiple, replicated
from .decode import decode_pcm_step, sharded_decode_fn
from .render import shard_engine_state, sharded_render_fn

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "pad_to_multiple",
    "decode_pcm_step",
    "sharded_decode_fn",
    "shard_engine_state",
    "sharded_render_fn",
]
