"""Pallas TPU kernel: fused polyphase synthesis (matrixing + 16-tap FIR).

The XLA formulation (dsp.polyphase_synthesis) materializes the matrixed
block history ``V [B, C, T, 64]`` in HBM and re-reads 16 shifted views of
it for the FIR.  This kernel keeps everything in VMEM per tile: each grid
step loads a [TILE_T, 32] slab of subband samples (plus a 16-row halo
from the previous tile), runs the 32→64 matrixing on the MXU, applies the
FIR locally, and writes only the final [TILE_T, 32] PCM block — HBM
traffic drops to one read of TS and one write of PCM.

The halo is expressed as a second view of the same input whose index map
points at the previous tile (tile 0's halo is masked to zero, matching
the zero-initialized ISO shift register).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 256  # filterbank steps per grid step (multiple of 8)


def _kernel(ts_ref, prev_ref, n_ref, g2_ref, out_ref):
    i = pl.program_id(1)
    ts = ts_ref[0]  # [TILE_T, 32]
    halo = prev_ref[0][TILE_T - 16 :]  # [16, 32] from the previous tile
    halo = jnp.where(i == 0, jnp.zeros_like(halo), halo)
    x = jnp.concatenate([halo, ts], axis=0)  # [TILE_T + 16, 32]
    v = jax.lax.dot_general(
        x, n_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TILE_T + 16, 64]
    acc = jnp.zeros((TILE_T, 32), jnp.float32)
    for k in range(16):
        seg = v[16 - k : 16 - k + TILE_T]
        half = seg[:, :32] if k % 2 == 0 else seg[:, 32:]
        acc = acc + g2_ref[k] * half
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def polyphase_synthesis_pallas(
    TS: jax.Array, n_mat: jax.Array, g2: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """TS f32 [BC, T, 32] → PCM blocks f32 [BC, T, 32] (T % TILE_T == 0)."""
    BC, T, _ = TS.shape
    grid = (BC, T // TILE_T)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_T, 32), lambda b, i: (b, i, 0)),
            pl.BlockSpec(
                (1, TILE_T, 32),
                lambda b, i: (b, jnp.maximum(i - 1, 0), 0),
            ),
            pl.BlockSpec((64, 32), lambda b, i: (0, 0)),
            pl.BlockSpec((16, 32), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, 32), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BC, T, 32), jnp.float32),
        interpret=interpret,
    )(TS, TS, n_mat, g2)
