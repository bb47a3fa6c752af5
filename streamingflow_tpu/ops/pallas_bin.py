"""Pallas binned reduction: segment-sum as one-hot matmuls on the MXU.

XLA's scatter-add on TPU costs ~150-200 ns per update row regardless of bin
count, dtype, or sortedness hints (it serialises collision handling), which
makes point-cloud binning — the core of pillarisation (models/
pillar_encoder.py) and lift-splat pooling (ops/lift_splat.py), the TPU
re-design of the reference's CUDA scatter kernels bev_pool_cuda.cu:20-42 and
voxelization_cuda.cu — the dominant cost of the LiDAR branch.

This kernel removes the scatter entirely:

  1. XLA: sort points by bin id (bitonic, fast) and locate each bin tile's
     point range with one ``searchsorted`` over the tile boundaries.
  2. Pallas grid over bin tiles: each program DMAs its point chunks from
     HBM, builds a one-hot (chunk x bins_per_tile) against the tile's
     *global* bin iota, and accumulates ``features^T @ one_hot`` on the
     MXU — a dense matmul instead of a scatter.  Comparing global ids makes
     chunk boundaries harmless: a neighbouring tile's points match no
     column, so chunk bases can stay tile-aligned (Mosaic-friendly) without
     any row masking.  An optional ``finalize`` epilogue transforms the
     per-bin sums while they are still VMEM-resident.

Accumulation is fp32-exact: one-hot entries are exact in any dtype and the
contraction accumulates in fp32.  Within a bin, points are summed in MXU
reduction-tree order (sums are permutation-exact in fp32 only up to
reassociation — same caveat as any parallel scatter-add).

Layout note: the kernel produces (C, n_bins) so the bin axis rides the
128-lane dimension; callers transpose once at the end (a cheap XLA relayout)
or consume the transposed form directly.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One-hot cost scales as CHUNK x BINS_PER_TILE per chunk — the kernel's
# dominant term at flagship point counts — while the program count scales
# inversely with BINS_PER_TILE.  Sweepable for measurement
# (tools/exp_bin_variants.py); 2048/256 was the round-2 operating point.
BINS_PER_TILE = int(os.environ.get('SF_BIN_TILE', '2048'))
# 256-row chunks measured fastest on v5e (smaller chunks waste less work on
# sparse tiles; larger ones amortise DMA better — 256 is the sweet spot for
# ~64 points/tile average occupancy)
CHUNK = int(os.environ.get('SF_BIN_CHUNK', '256'))


def _use_pallas() -> bool:
    if os.environ.get('STREAMINGFLOW_DISABLE_PALLAS', '0') == '1':
        return False
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:  # pragma: no cover
        return False


def _bin_sum_kernel(off_ref, data_ref, out_ref, acc_ref, chunk_ref, sem,
                    *, n_chan: int, finalize=None, exact: bool = True):
    """One bin tile: accumulate sorted point chunks via one-hot matmul.

    data_ref (HBM): (P_pad, 128) fp32 — lane 0 = global bin id (fp32, exact
    for ids < 2^24), lanes 1..C = features, rest zero padding (memrefs are
    physically 128-lane tiled, so DMA slices must be 128-wide), sorted by
    id; absent rows carry id -1.
    off_ref (SMEM, prefetched): (n_tiles + 1,) int32 point offsets per tile
    boundary.
    out_ref (VMEM): (C, BINS_PER_TILE) block of the (C, n_bins) output.

    Cross-program double buffering: at ~64 points per tile most programs
    process exactly one chunk, and a serial DMA start/wait per program
    left the kernel latency-bound (measured 23 ms for 5 flagship clouds).
    The TPU grid is sequential and scratch persists across programs, so
    program t waits on the chunk program t-1 prefetched into buffer t%2
    and immediately starts the DMA of tile t+1's first chunk into the
    other buffer; only the rare chunks >= 1 of multi-chunk tiles pay a
    serial DMA."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    # chunk-align the start downward (the global-id compare makes boundary
    # rows from the previous tile inert); the end stays exact so the final
    # (partial) chunk still covers the tail rows
    start = (off_ref[t] // CHUNK) * CHUNK
    end = off_ref[t + 1]
    mybuf = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(data_ref.at[pl.ds(start, CHUNK), :],
                              chunk_ref.at[0], sem.at[0]).start()

    # my first chunk (prefetched by t-1, or just above for t == 0)
    pltpu.make_async_copy(data_ref.at[pl.ds(start, CHUNK), :],
                          chunk_ref.at[mybuf], sem.at[mybuf]).wait()

    @pl.when(t + 1 < nt)
    def _():
        nstart = (off_ref[t + 1] // CHUNK) * CHUNK
        pltpu.make_async_copy(data_ref.at[pl.ds(nstart, CHUNK), :],
                              chunk_ref.at[1 - mybuf],
                              sem.at[1 - mybuf]).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    tile_base = t * BINS_PER_TILE
    iota_bins = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BINS_PER_TILE), 1)
                 + tile_base)
    # HIGHEST: the MXU's default fp32 path multiplies in bf16; the
    # one-hot operand is exact, so full precision recovers fp32-exact
    # sums (multi-pass bf16 expansion, ~6x the MXU passes).  Non-exact
    # callers (learned features) take the single-pass default.
    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)

    def accumulate(rows):
        gid = rows[:, 0:1].astype(jnp.int32)          # (CHUNK, 1)
        # global-id compare: rows from neighbouring tiles match no column
        onehot = jnp.where(gid == iota_bins, 1.0, 0.0)
        acc_ref[:] += jax.lax.dot_general(
            rows[:, 1:1 + n_chan], onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                      # (C, BINS_PER_TILE)

    # chunk 0: even an "empty" tile (start aligned below off[t] == end) may
    # cover a partial chunk of foreign rows — the id compare zeroes them,
    # so computing unconditionally is harmless and keeps the DMA chain
    # uniform
    accumulate(chunk_ref[mybuf])

    def body(i, _):
        base = pl.multiple_of(start + i * CHUNK, CHUNK)
        dma = pltpu.make_async_copy(
            data_ref.at[pl.ds(base, CHUNK), :], chunk_ref.at[mybuf],
            sem.at[mybuf])
        dma.start()
        dma.wait()
        accumulate(chunk_ref[mybuf])
        return 0

    jax.lax.fori_loop(1, pl.cdiv(end - start, CHUNK), body, 0)
    acc = acc_ref[:]
    if finalize is not None:
        # epilogue fused into the kernel: derived statistics are computed on
        # the VMEM-resident tile, so the raw sums never take an HBM round
        # trip (a separate XLA pass over the full grid would)
        acc = finalize(acc)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('n_bins', 'finalize',
                                             'out_dtype', 'exact',
                                             'presorted', 'transposed_out',
                                             'interpret'))
def _bin_sum_pallas(data: jnp.ndarray, ids: jnp.ndarray, n_bins: int,
                    finalize=None, out_dtype=jnp.float32, exact: bool = True,
                    presorted: bool = False, transposed_out: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    p, c = data.shape
    n_tiles = -(-n_bins // BINS_PER_TILE)
    n_pad = n_tiles * BINS_PER_TILE
    c_out = c if finalize is None else jax.eval_shape(
        finalize, jax.ShapeDtypeStruct((c, BINS_PER_TILE),
                                       jnp.float32)).shape[0]

    assert c + 1 <= 128, 'bin_sum supports up to 127 feature channels'
    ids = jnp.clip(ids, 0, n_bins - 1).astype(jnp.int32)
    if presorted:
        # tile-sorted input contract (native.tile_sort_points): rows already
        # grouped by bin tile — no device sort, no gather
        ids_s, rows = ids, data
    else:
        ids_s, order = jax.lax.sort_key_val(
            ids, jnp.arange(p, dtype=jnp.int32))
        rows = data[order]
    packed = jnp.concatenate(
        [ids_s[:, None].astype(jnp.float32), rows.astype(jnp.float32)],
        axis=1)
    # rows pad so every chunk-aligned pl.ds(base, CHUNK) stays in bounds
    # (pad rows carry id -1 and match no bin column); lanes pad to the
    # physical 128-lane tile so chunk DMA slices are aligned
    p_pad = (-(-p // CHUNK)) * CHUNK + CHUNK
    pad = jnp.full((p_pad - p, c + 1), 0.0, jnp.float32).at[:, 0].set(-1.0)
    packed = jnp.concatenate([packed, pad], axis=0)
    packed = jnp.pad(packed, ((0, 0), (0, 128 - (c + 1))))

    # per-tile point ranges; tile ids are nondecreasing in both modes (the
    # tile-sorted contract guarantees exactly this granularity)
    tids = ids_s // BINS_PER_TILE
    offsets = jnp.searchsorted(tids, jnp.arange(n_tiles + 1)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((c_out, BINS_PER_TILE),
                               lambda i, off: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, BINS_PER_TILE), jnp.float32),
            pltpu.VMEM((2, CHUNK, 128), jnp.float32),   # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_bin_sum_kernel, n_chan=c, finalize=finalize,
                          exact=exact),
        out_shape=jax.ShapeDtypeStruct((c_out, n_pad), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, packed)
    if transposed_out:
        return out[:, :n_bins]
    return out[:, :n_bins].T


def bin_sum(data: jnp.ndarray, ids: jnp.ndarray, n_bins: int,
            finalize=None, out_dtype=jnp.float32, exact: bool = True,
            presorted: bool = False, transposed_out: bool = False,
            interpret: bool = False) -> jnp.ndarray:
    """Sum rows of ``data`` (P, C) into ``n_bins`` bins by ``ids`` (P,).

    Out-of-range ids are clipped (route drop-rows to a dedicated trash bin
    before calling).  ``finalize``, if given, maps the raw per-bin sums
    (C, bins_tile) -> (C_out, bins_tile) and is fused into the kernel
    epilogue (pass a top-level function, not a fresh lambda per call — it
    participates in the jit cache key).  ``exact=False`` allows single-pass
    bf16 MXU multiplies (~0.2% feature rounding) — use for learned features,
    never for parity-sensitive sums.  Returns (n_bins, C_out) in
    ``out_dtype``, or (C_out, n_bins) — the kernel's native layout, with the
    bin axis riding the 128-lane dimension — when ``transposed_out`` is set.
    Prefer the transposed form when C_out is small: the (·, C_out) relayout
    uses C_out of 128 lanes and costs ~17 ms on the 2.56 M-bin pillar grid.
    Uses the Pallas MXU kernel on TPU, XLA segment-sum elsewhere."""
    if interpret or _use_pallas():
        return _bin_sum_pallas(data, ids, n_bins, finalize=finalize,
                               out_dtype=out_dtype, exact=exact,
                               presorted=presorted,
                               transposed_out=transposed_out,
                               interpret=interpret)
    ids = jnp.clip(ids, 0, n_bins - 1)
    out = jax.ops.segment_sum(data.astype(jnp.float32), ids,
                              num_segments=n_bins).T
    if finalize is not None:
        out = finalize(out)
    if not transposed_out:
        out = out.T
    return out.astype(out_dtype)
