"""Fused window-gather + banded-dot Pallas kernel for the column engine.

The column engine's wall is the 9-tap gather of fused column rows: ~1.16 s
of a 2.02 s spconv8x encoder forward goes to random 1.3 KB row gathers that
XLA cannot coalesce (docs/PERF.md, tools/exp_subm_micro.py — per-row DMA in
a naive Pallas gather measured WORSE).  The 'win' formulation
(ops/sparse_columns.py::build_window_plan) proved the geometry fix: sorted
x-major column ids make the source slot of a fixed in-plane tap MONOTONE in
the output slot, so a block of consecutive output columns reads a
CONTIGUOUS source window per tap row dx in {-1, 0, +1}.  In plain XLA the
windows, one-hot selectors and tap stacks all round-trip HBM, which ate the
gather savings (measured table in docs/PERF.md).  This kernel keeps them
VMEM-resident:

  per output block (256 columns), per dx window (three static-size slices):
    1. double-buffered DMA of the (W, L) window from HBM (sequential,
       regular — replaces ~768 random 1.3 KB row descriptors),
    2. one-hot selection MATMUL (block, W) x (W, L) on the MXU — the
       "gather" — tap stack never leaves VMEM,
    3. banded z-conv matmul (block, L) x (L, L_out) accumulated in fp32.

Blocks whose window overflows W rows fall back to direct XLA gathers
OUTSIDE the kernel (whole-block residual, capped — static-capacity
semantics identical to the 'win' formulation; their in-kernel taps are
disabled via rel = -1).

Gradients: the fused conv is linear in (feats, weights) and numerically
equal to the XLA 'sep' formulation, so a custom VJP routes the backward
through `jax.vjp` of the reference XLA path — exactness is whatever the
engine-agreement tests already pin, and the Pallas call itself never sees
autodiff (the same strategy as ops/pallas_patch_pool.py).

Reference semantics: SubMConv3d, mmdet3d/ops/spconv/conv.py:255-426 —
outputs only at active sites; masking is the caller's MaskedBatchNorm.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bin import _use_pallas
from .sparse_columns import ColumnMap, _banded_matrix, _mask_fused
from .voxelize import LARGE_ID

# rows per output block (grid step) and window rows per dx slice.  Width is
# bounded by the column density profile: measured max in-window spans stay
# under ~304 rows for block=256 on LiDAR-like clouds at every stage
# (tools/exp_window_stats.py); 384 adds the 8-row alignment slack plus
# safety margin, and overflows fall back to the residual path.  304 (not
# 384): at stage-1 flagship shapes the kernel's VMEM budget (bmats ~9M +
# 2x3 windows + fp32 acc) overflows the 16M scoped limit by 48K at 320 —
# Mosaic REQUIRES the fp32 matmul accumulator ('Expected matmul acc to be
# 32-bit'), so the headroom must come from the window; overflowing spans
# ride the residual path, so a tighter window trades a little speed, never
# correctness.
BLOCK = 256
WINDOW = 304


class FusedPlan(NamedTuple):
    """Kernel geometry for one stage's active-column set.

    starts:  (3, n_blocks) int32 — 8-aligned window start per dx row
    rel:     (n_blocks, 9, BLOCK) int32 — in-window source row per tap;
             -1 = no in-kernel contribution (not found / overflow block)
    rrows:   (resid_blocks*BLOCK,) int32 — residual output rows
    rslots:  (9, resid_blocks*BLOCK) int32 — their per-tap source slots
    rfound:  (9, resid_blocks*BLOCK) bool
    rmask:   (resid_blocks*BLOCK,) bool
    n_dropped: () int32 — found-tap entries lost beyond the residual cap
    """
    starts: jnp.ndarray
    rel: jnp.ndarray
    rrows: jnp.ndarray
    rslots: jnp.ndarray
    rfound: jnp.ndarray
    rmask: jnp.ndarray
    n_dropped: jnp.ndarray


class ColumnFuseGeo(NamedTuple):
    """Stage geometry bundle for the 'winfuse' formulation."""
    cmap: ColumnMap
    plan: FusedPlan


def build_fused_plan(cmap: ColumnMap, col_mask: jnp.ndarray,
                     block: int = BLOCK, window: int = WINDOW,
                     resid_blocks: int = 16) -> FusedPlan:
    """Window starts + per-tap in-window indices from an existing ColumnMap.

    Pure function of the active-column geometry — one plan serves every
    submanifold conv of the stage (spconv's cached indice-pair contract)."""
    cap = col_mask.shape[0]
    window = min(window, cap)
    n_blocks = -(-cap // block)
    v_p = n_blocks * block
    pad = v_p - cap

    nbr = cmap.nbr
    found = cmap.found
    if pad:
        nbr = jnp.pad(nbr, ((0, 0), (0, pad)))
        found = jnp.pad(found, ((0, 0), (0, pad)))
    slots = nbr.reshape(9, n_blocks, block)
    fnd = found.reshape(9, n_blocks, block)

    starts, rels = [], []
    for d in range(3):                       # dx = -1, 0, +1
        s3, f3 = slots[3 * d:3 * d + 3], fnd[3 * d:3 * d + 3]
        smin = jnp.min(jnp.where(f3, s3, LARGE_ID), axis=(0, 2))
        start = jnp.where(smin < LARGE_ID, (smin // 8) * 8, 0)
        start = jnp.clip(start, 0, max(cap - window, 0)).astype(jnp.int32)
        starts.append(start)
        rels.append(s3 - start[None, :, None])
    starts = jnp.stack(starts)
    rel = jnp.concatenate(rels)              # (9, n_blocks, block)

    over = fnd & (rel >= window)
    block_over = jnp.any(over, axis=(0, 2))
    over_rank = jnp.cumsum(block_over) - 1
    in_resid = block_over & (over_rank < resid_blocks)
    # found-tap entries of overflowing blocks beyond the residual cap are
    # DROPPED (counted) — static-capacity semantics, docs/PARITY.md
    lost = block_over & ~in_resid
    n_dropped = jnp.sum(fnd & lost[None, :, None])

    keep = fnd & (rel >= 0) & (rel < window) & ~in_resid[None, :, None]
    rel = jnp.where(keep, rel, -1).astype(jnp.int32)
    rel = jnp.transpose(rel, (1, 0, 2))      # (n_blocks, 9, block)

    rb = max(resid_blocks, 1)
    rblk = jax.ops.segment_min(
        jnp.where(in_resid, jnp.arange(n_blocks), n_blocks),
        jnp.clip(jnp.where(in_resid, over_rank, rb), 0, rb - 1),
        num_segments=rb)
    rok = rblk < n_blocks
    rrows_full = (rblk[:, None] * block
                  + jnp.arange(block)[None, :]).reshape(-1)
    rmask = jnp.repeat(rok, block) & (rrows_full < cap)
    rrows = jnp.clip(rrows_full, 0, cap - 1).astype(jnp.int32)
    rslots = nbr[:, rrows].astype(jnp.int32)
    rfound = found[:, rrows] & rmask[None, :]
    return FusedPlan(starts, rel, rrows, rslots, rfound, rmask,
                     n_dropped.astype(jnp.int32))


def _winfuse_kernel(starts_ref, rel_ref, bmats_ref, feats_ref, out_ref,
                    win_ref, sem, *, window: int, block: int):
    """One output block: 3 double-buffered window DMAs, 9 select+banded
    matmul pairs, fp32 accumulation, one VMEM-resident result write."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _first():
        for d in range(3):
            s0 = pl.multiple_of((starts_ref[d, 0] // 8) * 8, 8)
            pltpu.make_async_copy(
                feats_ref.at[pl.ds(s0, window), :],
                win_ref.at[0, d], sem.at[0, d]).start()

    @pl.when(b + 1 < nb)
    def _prefetch():
        for d in range(3):
            sn = pl.multiple_of((starts_ref[d, b + 1] // 8) * 8, 8)
            pltpu.make_async_copy(
                feats_ref.at[pl.ds(sn, window), :],
                win_ref.at[1 - slot, d], sem.at[1 - slot, d]).start()

    dt = win_ref.dtype
    # fp32 accumulator: Mosaic requires 32-bit matmul accumulation
    # ('tpu.matmul' op Expected matmul acc to be 32-bit — a bf16 acc fails
    # kernel verification on v5e); the VMEM headroom comes from window 320
    acc = jnp.zeros((block, out_ref.shape[-1]), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)
    for d in range(3):
        sb = pl.multiple_of((starts_ref[d, b] // 8) * 8, 8)
        pltpu.make_async_copy(
            feats_ref.at[pl.ds(sb, window), :],
            win_ref.at[slot, d], sem.at[slot, d]).wait()
        w = win_ref[slot, d]
        for j in range(3):
            k = 3 * d + j
            r = rel_ref[0, k].reshape(block, 1)       # (block, 1) int32
            oh = jnp.where(r == iota, 1.0, 0.0).astype(dt)
            tap = jax.lax.dot_general(
                oh, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
            acc += jax.lax.dot_general(
                tap, bmats_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('window', 'block', 'interpret'))
def _winfuse_pallas(feats: jnp.ndarray, starts: jnp.ndarray,
                    rel: jnp.ndarray, bmats: jnp.ndarray,
                    window: int = WINDOW, block: int = BLOCK,
                    interpret: bool = False) -> jnp.ndarray:
    """feats (cap, L), starts (3, nb), rel (nb, 9, block),
    bmats (9, L, L_out) -> (nb*block, L_out) in feats.dtype."""
    cap, L = feats.shape
    n_blocks = rel.shape[0]
    l_out = bmats.shape[-1]
    # row-pad so any 8-aligned start + window stays in bounds; lane-pad to
    # a 128 multiple — dynamic HBM window DMA requires whole lane tiles
    # (measured: a (W, 656) slice of a 656-lane memref fails Mosaic's
    # divisibility check, 768 passes).  The pad lanes are zeros and the
    # matching bmats rows are zero, so results are unchanged.
    rows = max(window, ((cap + 7) // 8) * 8)
    l_pad = ((L + 127) // 128) * 128
    if rows > cap or l_pad > L:
        feats = jnp.pad(feats, ((0, rows - cap), (0, l_pad - L)))
    if l_pad > L:
        bmats = jnp.pad(bmats, ((0, 0), (0, l_pad - L), (0, 0)))
        L = l_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 9, block), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((9, L, l_out), lambda b, s: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((block, l_out), lambda b, s: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, window, L), feats.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_winfuse_kernel, window=window, block=block),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, l_out),
                                       feats.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, rel, bmats, feats)


def _residual_add(out, feats, plan: FusedPlan, bands):
    """Whole-block fallback for window-overflow blocks: direct row gathers
    + banded dots, scatter-added at the residual rows (all 9 taps — their
    in-kernel rel entries are -1)."""
    dt = feats.dtype
    g = (feats[plan.rslots.reshape(-1)].reshape(9, -1, feats.shape[-1])
         * plan.rfound[:, :, None].astype(dt))
    contrib = None
    for k in range(9):
        acc = jnp.dot(g[k], bands[k], preferred_element_type=dt)
        contrib = acc if contrib is None else contrib + acc
    return out.at[plan.rrows].add(contrib * plan.rmask[:, None].astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _winfuse_conv(feats, weights, nbr, found, starts, rel_resid,
                  nz, window, interpret):
    """Fused subm conv primal.  rel_resid = (rel, rrows, rslots, rfound,
    rmask) — the plan's array fields (NamedTuples of arrays are fine as
    inputs but custom_vjp wants plain pytrees)."""
    rel, rrows, rslots, rfound, rmask = rel_resid
    plan = FusedPlan(starts, rel, rrows, rslots, rfound, rmask,
                     jnp.zeros((), jnp.int32))
    dt = feats.dtype
    bands = jnp.stack([
        _banded_matrix(weights[k * 3:(k + 1) * 3], nz, nz, 3, 1, 1)
        for k in range(9)]).astype(dt)
    out = _winfuse_pallas(feats, starts, rel, bands,
                          window=window, block=rel.shape[-1],
                          interpret=interpret)[:feats.shape[0]]
    return _residual_add(out, feats, plan, bands)


def _winfuse_fwd(feats, weights, nbr, found, starts, rel_resid,
                 nz, window, interpret):
    out = _winfuse_conv(feats, weights, nbr, found, starts, rel_resid,
                        nz, window, interpret)
    return out, (feats, weights, nbr, found)


def _winfuse_bwd(nz, window, interpret, res, g):
    """Backward through the XLA 'sep' formulation: the fused conv equals it
    numerically (engine-agreement tests), it is linear in (feats, weights),
    and XLA autodiff of the gather/slice path is already grad-proven
    (tests/test_sparse_columns.py)."""
    from .sparse_columns import subm_conv_columns
    feats, weights, nbr, found = res
    cmap = ColumnMap(nbr, found, *_sep_shift_validity(nbr, found))

    def ref(f, w):
        return subm_conv_columns(f, jnp.ones((f.shape[0], nz), bool),
                                 cmap, w, formulation='sep',
                                 mask_output=False)
    _, vjp = jax.vjp(ref, feats, weights)
    df, dw = vjp(g)
    return (df, dw, None, None, None,
            (None, None, None, None, None))


def _sep_shift_validity(nbr, found):
    """Reconstruct the 'sep' formulation's slot+-1 shift validities from
    the tap map itself: the (0, +1) tap rides slot+1 exactly when the map
    found it there (sorted-id contract, see ColumnMap)."""
    cap = nbr.shape[1]
    idx = jnp.arange(cap, dtype=jnp.int32)
    yup_ok = found[5] & (nbr[5] == idx + 1)
    ydn_ok = found[3] & (nbr[3] == idx - 1)
    return yup_ok, ydn_ok


_winfuse_conv.defvjp(_winfuse_fwd, _winfuse_bwd)


def subm_conv_winfuse(feats: jnp.ndarray, zmask: jnp.ndarray,
                      cmap: ColumnMap, plan: FusedPlan,
                      weights: jnp.ndarray, bias=None,
                      mask_output: bool = True,
                      window: int = WINDOW,
                      interpret: bool = False) -> jnp.ndarray:
    """Submanifold 3x3x3 conv over fused columns via the fused kernel.

    Drop-in for sparse_columns.subm_conv_columns (formulation='winfuse'):
    feats (V, nz*Cin), weights (27, Cin, Cout) x-major -> (V, nz*Cout)."""
    assert weights.shape[0] == 27, 'winfuse is specialised to 3x3x3'
    nz = zmask.shape[-1]
    rel_resid = (plan.rel, plan.rrows, plan.rslots, plan.rfound, plan.rmask)
    out = _winfuse_conv(feats, weights, cmap.nbr, cmap.found, plan.starts,
                        rel_resid, nz, window, interpret)
    if bias is not None:
        out = out + jnp.tile(bias, nz).astype(out.dtype)
    return _mask_fused(out, zmask) if mask_output else out


def winfuse_available() -> bool:
    return _use_pallas()
