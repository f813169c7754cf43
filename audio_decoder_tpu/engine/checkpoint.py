"""Engine state checkpoint / resume.

The reference has no persistence at all — voices/groups/tempo are rebuilt
per run and only in-session REPL history survives (SURVEY §5).  Because
this engine's whole state is a pytree of arrays plus a name registry, a
checkpoint is just an npz + a JSON sidecar; a session can stop and resume
mid-performance with sample-exact continuity (the global clock, voice
cursors, tempo phases and RNG key all round-trip).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .state import EngineArrays, HostRegistry

_VERSION = 1


def save_state(path: str, st: EngineArrays, reg: HostRegistry) -> None:
    """Write `path`.npz (arrays) and `path`.json (registry)."""
    arrays = {
        f.name: np.asarray(getattr(st, f.name))
        for f in dataclasses.fields(st)
    }
    np.savez_compressed(path + ".npz", **arrays)
    meta = dict(
        version=_VERSION,
        tracks=reg.tracks,
        voices=reg.voices,
        groups=reg.groups,
        contexts=reg.contexts,
        group_members=reg.group_members,
        free_v=reg._free_v,
        free_g=reg._free_g,
        free_x=reg._free_x,
    )
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_state(path: str) -> tuple[EngineArrays, HostRegistry]:
    """Restore a (state, registry) pair saved by save_state."""
    if not (os.path.exists(path + ".npz") and os.path.exists(path + ".json")):
        raise FileNotFoundError(path)
    with open(path + ".json") as f:
        meta = json.load(f)
    if meta.get("version") != _VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
    z = np.load(path + ".npz")
    kwargs = {}
    for f_ in dataclasses.fields(EngineArrays):
        if f_.name not in z.files:
            # field added after the checkpoint was written: s_jitter
            # defaults to zero (no jitter), matching prior behavior
            if f_.name == "s_jitter":
                kwargs[f_.name] = jnp.zeros_like(
                    jnp.asarray(z["s_chance"], jnp.float32)
                )
                continue
            raise ValueError(f"checkpoint missing field {f_.name}")
        a = z[f_.name]
        kwargs[f_.name] = (
            jax.random.wrap_key_data(jnp.asarray(a))
            if f_.name == "rng_key" and a.dtype != np.uint32
            else jnp.asarray(a)
        )
    st = EngineArrays(**kwargs)
    reg = HostRegistry(list(meta["tracks"]))
    reg.tracks = {k: int(v) for k, v in meta["tracks"].items()}
    reg.voices = {k: int(v) for k, v in meta["voices"].items()}
    reg.groups = {k: int(v) for k, v in meta["groups"].items()}
    reg.contexts = {k: int(v) for k, v in meta["contexts"].items()}
    reg.group_members = {k: list(v) for k, v in meta["group_members"].items()}
    reg._free_v = list(meta["free_v"])
    reg._free_g = list(meta["free_g"])
    reg._free_x = list(meta["free_x"])
    return st, reg
