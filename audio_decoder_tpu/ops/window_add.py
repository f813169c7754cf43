"""Pallas TPU kernel: contiguous-window scatter-add.

``out[starts[l] + i] += upd[l, i]`` for lanes whose windows are
CONTIGUOUS destination ranges in non-decreasing start order — exactly
the FLAC value-assembly and PCM-assembly shape (codecs/flac/device.py).
XLA's ``scatter_add`` lowers this through a generic sort at ~100 M
elem/s on TPU regardless of the sorted/unique hints (measured:
tools/scatter_probe.py), which made the value assembly 542 ms of a
~770 ms program; the destination-major gather inversion measures even
worse (tools/gather_probe.py: 768 ms element gather, 10.9 s 8-wide row
gather at this shape).  This kernel exploits the one structural fact
the XLA primitives cannot: sorted starts mean the lanes touching an
output tile form a CONTIGUOUS range, so a sequential pass over output
tiles visits every lane once (plus tile-boundary overlap), entirely in
VMEM.

Per grid step (one [TILE_R, 512] output tile):

1. the lane range [lo_t, hi_t) overlapping the tile comes from two
   host-side ``searchsorted`` calls (scalar-prefetch arrays);
2. lane update rows DMA HBM->VMEM in CHUNK batches;
3. each lane's [Wp] row is rotated to its in-tile bit... sample offset
   (dynamic-slice of the doubled row = roll by ``shift``), split across
   sublane rows with a column select, and added into a [TILE_R + 2*KU,
   512] accumulator at dynamic sublane offset — the halo rows absorb
   windows that straddle the tile edge (the neighbouring tile re-adds
   its own in-tile part; only the middle rows are ever written out);
4. the tile's middle rows write to the output block.

Zero-padding conventions match the XLA path: callers mask updates past
each lane's live count to zero, so overlapping halos and padding lanes
only ever add zeros.  Padding lanes carry start 0 at the array tail
(which would break sortedness), so the wrapper re-points every start
through a running max — a zero-update lane is harmless wherever it
lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256    # output rows (x512 elements) per grid step
LANE_BATCH = 65536  # elements per DMA chunk (CHUNK = LANE_BATCH // Wp)


def _kernel(tlo_ref, thi_ref, starts_ref, upd_hbm, out_ref, acc_ref,
            lanes_ref, sem, *, ku: int, chunk: int, lg: int):
    t = pl.program_id(0)
    # every dynamic sublane offset below must be PROVABLY 8-aligned for
    # Mosaic: lanes are processed in groups of lg (lg*ku ≡ 0 mod 8) from
    # a group-aligned lo, so DMA offsets (c0*ku) and in-VMEM group
    # offsets (k0*ku) are multiples of 8; the per-lane accumulator
    # placement uses an aligned row base + a sublane roll for the 0..7
    # residual.  Boundary slop from the alignment (lanes below lo /
    # past hi) is masked by the window-overlap validity test.
    lo = (tlo_ref[t] // lg) * lg
    hi = thi_ref[t]
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    base = t * (TILE_R * 512)
    col = jax.lax.broadcasted_iota(jnp.int32, (ku + 1, 512), 1)
    ku8 = -(-ku // 8) * 8    # low-halo rows, 8-aligned
    bs = -(-(ku + 8) // 8) * 8  # 8-aligned store block rows
    wp = ku * 512

    def chunk_body(ci, _):
        c0 = lo + ci * chunk
        cp = pltpu.make_async_copy(
            upd_hbm.at[pl.ds(pl.multiple_of(c0 * ku, 8), chunk * ku), :],
            lanes_ref, sem)
        cp.start()
        cp.wait()
        nl = jnp.minimum(hi - c0, chunk)

        def group_body(kg, _):
            k0 = kg * lg
            grp = lanes_ref[pl.ds(pl.multiple_of(k0 * ku, 8), lg * ku), :]
            for j in range(lg):  # static unroll: value slices below are
                k = k0 + j       # static, no dynamic VMEM offsets
                sg = starts_ref[c0 + k]
                valid = (sg + wp > base) & (sg < base + TILE_R * 512)
                s = jnp.where(valid, sg - base + ku8 * 512, ku8 * 512)
                row0 = s // 512
                shift = s - row0 * 512
                row8 = pl.multiple_of((row0 // 8) * 8, 8)
                u = jnp.where(valid, grp[j * ku:(j + 1) * ku], 0)
                b = pltpu.roll(u, shift, axis=1)  # b[r,c] = u[r,(c-s)%512]
                z = jnp.zeros((1, 512), u.dtype)
                bz = jnp.concatenate([z, b, z], axis=0)
                g = jnp.where(col >= shift, bz[1:], bz[:-1])  # [ku+1, 512]
                blk = jnp.concatenate(
                    [g, jnp.zeros((bs - (ku + 1), 512), u.dtype)], axis=0)
                blk = pltpu.roll(blk, row0 - row8, axis=0)
                acc_ref[pl.ds(row8, bs), :] += blk
            return 0

        jax.lax.fori_loop(0, pl.cdiv(nl, lg), group_body, 0)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(hi - lo, chunk), chunk_body, 0)
    out_ref[...] = acc_ref[ku8:ku8 + TILE_R]


@functools.partial(jax.jit,
                   static_argnames=("n_out", "interpret"))
def window_add(starts: jax.Array, upd: jax.Array, n_out: int,
               *, interpret: bool | None = None) -> jax.Array:
    """``out[starts[l] + i] += upd[l, i]`` → flat [n_out] array.

    Requires window starts non-decreasing over the LIVE lanes (the FLAC
    packers emit lanes in stream order, which is destination order);
    zero-update padding lanes may sit at the tail with start 0 — the
    running max below re-points them at the last live start, where they
    add zeros.  Callers must mask updates past each lane's live count
    to zero and leave ``upd.shape[1]`` slack past the last live
    destination (same contract as the XLA scatter this replaces).
    """
    if interpret is None:
        # Mosaic is TPU-only; interpret elsewhere (CPU tests, dryruns)
        interpret = jax.default_backend() != "tpu"
    L, W = upd.shape
    ku = -(-W // 512)
    wp = ku * 512
    lg = 8 // np.gcd(ku, 8)  # lane group: lg*ku rows ≡ 0 mod 8
    chunk = max(lg, LANE_BATCH // wp // lg * lg)
    nt = (-(-n_out // 512) + TILE_R - 1) // TILE_R
    starts = jax.lax.associative_scan(jnp.maximum, starts)
    if W != wp:
        upd = jnp.pad(upd, ((0, 0), (0, wp - W)))
    # one spare DMA chunk of zero lanes so chunked copies never clamp
    upd = jnp.pad(upd, ((0, chunk), (0, 0)))
    sentinel = jnp.full((chunk,), nt * TILE_R * 512 + 1, starts.dtype)
    starts_p = jnp.concatenate([starts, sentinel])
    # lanes overlapping tile t = starts in (tile_start - Wp, tile_end):
    # contiguous BECAUSE starts are sorted
    edges = jnp.arange(nt + 1, dtype=jnp.int32) * (TILE_R * 512)
    tlo = jnp.searchsorted(starts, edges[:-1] - (wp - 1), side="left")
    thi = jnp.searchsorted(starts, edges[1:], side="left")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE_R, 512), lambda t, *_: (t, 0)),
        scratch_shapes=[
            # TILE_R live rows + ku8 low halo + bs 8-aligned store slack
            pltpu.VMEM((TILE_R + (-(-ku // 8) * 8)
                        + (-(-(ku + 8) // 8) * 8), 512), upd.dtype),
            pltpu.VMEM((chunk * ku, 512), upd.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ku=ku, chunk=chunk, lg=int(lg)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * TILE_R, 512), upd.dtype),
        interpret=interpret,
    )(tlo.astype(jnp.int32), thi.astype(jnp.int32),
      starts_p.astype(jnp.int32), upd.reshape((L + chunk) * ku, 512))
    return out.reshape(-1)[:n_out]
