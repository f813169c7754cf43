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

``window_add2`` accumulates TWO independent lane sets (each with its
own window width) into one output in a single kernel invocation — the
FLAC value assembly's (rice, fixed-width) pair — so the combined
result costs one output-tile write instead of two full [n_out] arrays
materialized and added (advisor r4: that doubled HBM traffic and peak
memory).  ``window_add_spmd`` composes the kernel with a device mesh
via ``shard_map`` (GSPMD cannot partition an opaque pallas_call).

Hardware validation (v5e, 2026-08-20): bit-exact vs the XLA scatter
oracle at both FLAC shapes; value assembly 411 ms -> 34 ms, PCM
assembly 46 ms -> 31 ms (tools/window_add_probe.py).
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


def _accumulate(t, tlo_ref, thi_ref, starts_ref, upd_hbm, acc_ref,
                lanes_ref, sem, *, ku: int, chunk: int, lg: int,
                ku8_acc: int):
    """Add one lane set's tile-overlapping windows into ``acc_ref``.

    ``ku8_acc`` is the accumulator's low-halo row count (the max over
    the lane sets sharing the accumulator) — every window lands at
    ``ku8_acc*512`` plus its in-tile offset so all sets share one
    output origin."""
    # every dynamic sublane offset below must be PROVABLY 8-aligned for
    # Mosaic: lanes are processed in groups of lg (lg*ku ≡ 0 mod 8) from
    # a group-aligned lo, so DMA offsets (c0*ku) and in-VMEM group
    # offsets (k0*ku) are multiples of 8; the per-lane accumulator
    # placement uses an aligned row base + a sublane roll for the 0..7
    # residual.  Boundary slop from the alignment (lanes below lo /
    # past hi) is masked by the window-overlap validity test.
    lo = (tlo_ref[t] // lg) * lg
    hi = thi_ref[t]
    base = t * (TILE_R * 512)
    col = jax.lax.broadcasted_iota(jnp.int32, (ku + 1, 512), 1)
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
                s = jnp.where(valid, sg - base + ku8_acc * 512,
                              ku8_acc * 512)
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


def _kernel(tlo_ref, thi_ref, starts_ref, upd_hbm, out_ref, acc_ref,
            lanes_ref, sem, *, ku: int, chunk: int, lg: int):
    t = pl.program_id(0)
    ku8 = -(-ku // 8) * 8    # low-halo rows, 8-aligned
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    _accumulate(t, tlo_ref, thi_ref, starts_ref, upd_hbm, acc_ref,
                lanes_ref, sem, ku=ku, chunk=chunk, lg=lg, ku8_acc=ku8)
    out_ref[...] = acc_ref[ku8:ku8 + TILE_R]


def _kernel2(tlo_a, thi_a, starts_a, tlo_b, thi_b, starts_b,
             upd_a_hbm, upd_b_hbm, out_ref, acc_ref, lanes_a, lanes_b,
             sem, *, ku_a: int, chunk_a: int, lg_a: int,
             ku_b: int, chunk_b: int, lg_b: int):
    t = pl.program_id(0)
    ku8 = max(-(-ku_a // 8) * 8, -(-ku_b // 8) * 8)
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    _accumulate(t, tlo_a, thi_a, starts_a, upd_a_hbm, acc_ref,
                lanes_a, sem, ku=ku_a, chunk=chunk_a, lg=lg_a, ku8_acc=ku8)
    _accumulate(t, tlo_b, thi_b, starts_b, upd_b_hbm, acc_ref,
                lanes_b, sem, ku=ku_b, chunk=chunk_b, lg=lg_b, ku8_acc=ku8)
    out_ref[...] = acc_ref[ku8:ku8 + TILE_R]


def _lane_geometry(upd, n_out):
    L, W = upd.shape
    ku = -(-W // 512)
    wp = ku * 512
    lg = 8 // np.gcd(ku, 8)  # lane group: lg*ku rows ≡ 0 mod 8
    chunk = max(lg, LANE_BATCH // wp // lg * lg)
    return L, W, ku, wp, int(lg), chunk


def _prep_set(starts, upd, n_out, nt):
    """Sort-normalize starts, pad lanes, compute per-tile lane ranges."""
    L, W, ku, wp, lg, chunk = _lane_geometry(upd, n_out)
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
    return (tlo.astype(jnp.int32), thi.astype(jnp.int32),
            starts_p.astype(jnp.int32),
            upd.reshape((L + chunk) * ku, 512), ku, lg, chunk)


def _acc_rows(ku: int) -> int:
    """Accumulator rows for one lane set: TILE_R live + 8-aligned low
    halo + 8-aligned store-block slack."""
    return TILE_R + (-(-ku // 8) * 8) + (-(-(ku + 8) // 8) * 8)


def window_add_spmd(starts: jax.Array, upd: jax.Array, n_out: int,
                    *, mesh, axis: str = "data",
                    interpret: bool | None = None) -> jax.Array:
    """Mesh-sharded ``window_add``: lane-sharded inputs → replicated out.

    GSPMD cannot partition an opaque ``pallas_call``, but the lane axis
    IS the natural data-parallel axis: each shard's lanes are a
    contiguous slice of the globally start-sorted lane array (the FLAC
    packers emit stream order), so per-shard sortedness holds for free.
    Every shard runs the tile-sequential kernel over its own lanes into
    a full-size [n_out] partial and the partials combine with ONE
    ``psum`` (disjoint destination ranges per shard — the sum never
    mixes real values, it only fills each shard's zeros).  The psum is
    the price of keeping the kernel opaque to GSPMD; it rides ICI at
    allreduce bandwidth and replaces the ~100 M elem/s sharded XLA
    scatter the mesh path previously shipped."""
    from jax.sharding import PartitionSpec as P

    def local(s, u):
        return jax.lax.psum(window_add(s, u, n_out, interpret=interpret),
                            axis)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation; the psum above makes the real invariant (replicated
    # output) true by construction
    return jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                         out_specs=P(), check_vma=False)(starts, upd)


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
    nt = (-(-n_out // 512) + TILE_R - 1) // TILE_R
    tlo, thi, starts_p, upd_r, ku, lg, chunk = _prep_set(
        starts, upd, n_out, nt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE_R, 512), lambda t, *_: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((_acc_rows(ku), 512), upd.dtype),
            pltpu.VMEM((chunk * ku, 512), upd.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ku=ku, chunk=chunk, lg=lg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * TILE_R, 512), upd.dtype),
        interpret=interpret,
    )(tlo, thi, starts_p, upd_r)
    return out.reshape(-1)[:n_out]


@functools.partial(jax.jit,
                   static_argnames=("n_out", "interpret"))
def window_add2(starts_a: jax.Array, upd_a: jax.Array,
                starts_b: jax.Array, upd_b: jax.Array, n_out: int,
                *, interpret: bool | None = None) -> jax.Array:
    """Two lane sets accumulated into ONE [n_out] array in one pass.

    Same per-set contract as ``window_add``; the sets may have
    different window widths.  Equivalent to
    ``window_add(a) + window_add(b)`` but writes each output tile once
    instead of materializing and adding two full arrays (halves the
    assembly's HBM write traffic and peak memory)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nt = (-(-n_out // 512) + TILE_R - 1) // TILE_R
    tlo_a, thi_a, st_a, upd_ra, ku_a, lg_a, ch_a = _prep_set(
        starts_a, upd_a, n_out, nt)
    tlo_b, thi_b, st_b, upd_rb, ku_b, lg_b, ch_b = _prep_set(
        starts_b, upd_b, n_out, nt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((TILE_R, 512), lambda t, *_: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((max(_acc_rows(ku_a), _acc_rows(ku_b)), 512),
                       upd_a.dtype),
            pltpu.VMEM((ch_a * ku_a, 512), upd_a.dtype),
            pltpu.VMEM((ch_b * ku_b, 512), upd_b.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel2, ku_a=ku_a, chunk_a=ch_a, lg_a=lg_a,
                          ku_b=ku_b, chunk_b=ch_b, lg_b=lg_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * TILE_R, 512), upd_a.dtype),
        interpret=interpret,
    )(tlo_a, thi_a, st_a, tlo_b, thi_b, st_b, upd_ra, upd_rb)
    return out.reshape(-1)[:n_out]
