"""Pallas camera lift-splat: structural patch pooling, no per-row scatter.

The XLA scatter-add behind `ops/lift_splat.bev_pool` costs ~17 ns per update
row on TPU regardless of width — ~25 ms for the 1.45 M frustum rows of one
forecast (PERF.md), the single largest stage of the camera branch.  Sorting
on device (~30 ms) or per-row VMEM scatters (measured 39 ms) are worse, and
the bin-tile kernel in ops/pallas_bin.py needs sorted rows.

This kernel exploits *structure* instead: frustum rows grouped by
(frame, camera, depth bin, 4-wide image-column block) form a small patch in
BEV space — a single depth slice of a narrow camera wedge, bounded by a
16x24-cell rectangle once out-of-z-bound rows are removed (image-row v maps
almost entirely to world z).  Each group of 112 rows therefore reduces to:

  1. min-reduce the group's quantized coords -> patch origin (vector
     reduction, no scatter),
  2. one-hot (rows x 384 local cells) matmul on the MXU -> the patch,
  3. one dynamic-window add of the patch into a VMEM-resident BEV
     accumulator (origin aligned to the sublane tile).

Rows whose group genuinely exceeds the patch budget are dropped and
*counted* — the returned drop counter is asserted zero in tests and can be
monitored at runtime; with nuScenes-like calibrations the bound holds with
large margin.  Accumulation is fp32 in VMEM; inputs ride bf16 (quantized
coords < 256 are exact in bf16).

Grid: (B*S frames, groups); the BEV accumulator block is revisited across
the inner group axis, so the whole frame pools without touching HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bin import _use_pallas

PATCH_H = 16          # x-cells per patch
PATCH_W = 24          # y-cells per patch (multiple of 8: sublane alignment)
ROWS = 128            # padded rows per group
LANES = 66            # feature lanes (64) + x + y coord lanes
UBLOCK = 4            # image columns per group
GROUPS_PER_STEP = 8   # groups processed per grid step (amortises step cost)


def _patch_pool_kernel(in_ref, out_ref, drop_ref, *, nx: int, ny: int,
                       n_chan: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        drop_ref[:] = jnp.zeros_like(drop_ref)

    for j in range(GROUPS_PER_STEP):
        _one_group(in_ref[0, j], out_ref, drop_ref, nx=nx, ny=ny,
                   n_chan=n_chan)


def _one_group(rows, out_ref, drop_ref, *, nx: int, ny: int, n_chan: int):
    # Mosaic-friendly coord extraction: lane-sliced vectors carry offset
    # layouts that cannot be reduced or converted, so (a) pull the coord
    # lanes out with full-width masked reductions and (b) keep every vector
    # quantity in f32 (coords < 256 are exact; int converts on (128,)
    # vectors trip unsupported relayouts)
    rows_f = rows.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    # (ROWS, 1) columns throughout — 1-D (ROWS,) vectors carry implicit-dim
    # layouts that trip Mosaic relayouts on select/convert/reduce
    x = jnp.sum(jnp.where(lane == n_chan, rows_f, 0.0), axis=1,
                keepdims=True)
    y = jnp.sum(jnp.where(lane == n_chan + 1, rows_f, 0.0), axis=1,
                keepdims=True)
    valid = x >= 0.0

    big = jnp.float32(1e9)
    minx = jnp.min(jnp.where(valid, x, big))
    miny = jnp.min(jnp.where(valid, y, big))
    any_valid = minx < big
    # clamp so the patch window stays inside the grid; valid coords < nx/ny
    # guarantee the clamped window still covers every in-budget cell
    x0 = jnp.minimum(jnp.maximum(minx, 0.0), float(nx - PATCH_H))
    y0 = jnp.minimum(jnp.maximum(jnp.floor(miny / 8.0) * 8.0, 0.0),
                     float(ny - PATCH_W))

    lx = x - x0
    ly = y - y0
    fits = (valid & (lx >= 0.0) & (lx < PATCH_H)
            & (ly >= 0.0) & (ly < PATCH_W))
    lid = jnp.where(fits, lx * PATCH_W + ly, -1.0)       # (ROWS, 1)

    n_local = PATCH_H * PATCH_W
    iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, n_local), 1)
    # bf16 operands at full MXU rate, fp32 accumulate: one-hot 0/1 and the
    # already-bf16 features are exact in bf16.  Select in f32 (the i1 mask
    # lives in 32-bit (8,128) tiles; selecting bf16 directly would need an
    # unsupported mask relayout to (16,128)), then convert.
    onehot = jnp.where(lid == iota.astype(jnp.float32),
                       1.0, 0.0).astype(jnp.bfloat16)
    feats = rows[:, :n_chan]
    patch = jax.lax.dot_general(
        onehot, feats, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (n_local, C)
    patch = patch.reshape(PATCH_H, PATCH_W, n_chan)

    x0i = x0.astype(jnp.int32)          # scalar converts are fine (SREG)
    y0i = y0.astype(jnp.int32)

    @pl.when(any_valid)
    def _acc():
        window = out_ref[pl.ds(x0i, PATCH_H), pl.ds(y0i, PATCH_W), :]
        out_ref[pl.ds(x0i, PATCH_H), pl.ds(y0i, PATCH_W), :] = \
            window + patch

    # drop counter lives in cell [0, 0] of an (8, 128) tile (TPU block
    # shapes must be tile-divisible)
    cnt = jnp.sum(jnp.where(valid & ~fits, 1.0, 0.0))
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    drop_ref[:] += jnp.where((r == 0) & (c == 0), cnt, 0.0)


@functools.partial(jax.jit, static_argnames=('nx', 'ny', 'interpret'))
def _patch_pool_pallas(packed: jnp.ndarray, nx: int, ny: int,
                       interpret: bool = False):
    """packed: (F, G, ROWS, LANES) bf16 — lanes [0:C]=features, C=x, C+1=y
    (x = -1 marks invalid rows).  Returns ((F, nx, ny, C) fp32, (F,) drops).
    """
    f, g = packed.shape[:2]
    n_chan = 64
    gb = GROUPS_PER_STEP
    n_steps = -(-g // gb)
    pad_g = n_steps * gb - g
    if pad_g:
        pad = jnp.zeros((f, pad_g, ROWS, LANES), packed.dtype)
        pad = pad.at[..., n_chan].set(-1.0)
        packed = jnp.concatenate([packed, pad], axis=1)
    packed = packed.reshape(f, n_steps, gb, ROWS, LANES)

    # One kernel call per frame via lax.map: keeps the frame axis out of the
    # grid so the (nx, ny, C) fp32 accumulator block has a constant index
    # map (single VMEM buffer, ~10 MB).  With frames as a grid axis Mosaic
    # multi-buffers the revisited accumulator and blows the 16 MB scoped
    # VMEM limit.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, gb, ROWS, LANES),
                               lambda i: (i, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((nx, ny, n_chan), lambda i: (0, 0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_patch_pool_kernel, nx=nx, ny=ny, n_chan=n_chan),
        out_shape=[jax.ShapeDtypeStruct((nx, ny, n_chan), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )
    out, drops = jax.lax.map(call, packed)
    return out, drops[:, 0, 0]


def pack_frustum_rows(x: jnp.ndarray, coords: jnp.ndarray,
                      kept: jnp.ndarray) -> jnp.ndarray:
    """Arrange frustum features + quantized coords into the kernel layout.

    x:      (F, N, D, fH, fW, C<=64) features
    coords: (F, N, D, fH, fW, 2) int32 BEV cell coords
    kept:   (F, N, D, fH, fW) validity
    Returns (F, G, ROWS, LANES) bf16 with G = N*D*ceil(fW/UBLOCK) groups of
    fH*UBLOCK rows (padded to ROWS with invalid rows)."""
    f, n, d, fh, fw, c = x.shape
    assert c <= 64
    wb = -(-fw // UBLOCK)
    pad_w = wb * UBLOCK - fw
    if pad_w:
        x = jnp.pad(x, ((0, 0),) * 5 + ((0, pad_w), (0, 0)))
        coords = jnp.pad(coords, ((0, 0),) * 5 + ((0, pad_w), (0, 0)))
        kept = jnp.pad(kept, ((0, 0),) * 5 + ((0, pad_w),))

    cx = jnp.where(kept, coords[..., 0], -1)
    cy = jnp.where(kept, coords[..., 1], -1)

    def group(t):
        # (F, N, D, fH, WB, UB, L) -> groups (N, D, WB) x rows (fH, UB)
        l = t.shape[-1]
        t = t.reshape(f, n, d, fh, wb, UBLOCK, l)
        t = jnp.transpose(t, (0, 1, 2, 4, 3, 5, 6))
        return t.reshape(f, n * d * wb, fh * UBLOCK, l)

    # transpose each stream *before* concatenating: the feature transpose
    # moves 64 lanes instead of 128, and the lane count stays at the
    # logical 66 (no zero-padding writes; HBM tiles pad physically anyway)
    lanes = jnp.concatenate(
        [group(x.astype(jnp.bfloat16)),
         group(cx[..., None].astype(jnp.bfloat16)),
         group(cy[..., None].astype(jnp.bfloat16))], axis=-1)
    pad_rows = ROWS - fh * UBLOCK
    assert pad_rows >= 0, 'group rows exceed the ROWS budget'
    if pad_rows:
        pad = jnp.zeros((f, lanes.shape[1], pad_rows, LANES), jnp.bfloat16)
        pad = pad.at[..., c].set(-1.0)
        lanes = jnp.concatenate([lanes, pad], axis=2)
    return lanes


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pool_with_vjp(x, coords, kept, nx, ny, interpret):
    packed = pack_frustum_rows(x, coords, kept)
    return _patch_pool_pallas(packed, nx, ny, interpret=interpret)


def _pool_fwd(x, coords, kept, nx, ny, interpret):
    out = _pool_with_vjp(x, coords, kept, nx, ny, interpret)
    # residuals: coords + kept only — the features themselves are not needed
    # (the pool is linear in x), so backward adds no activation memory.  The
    # zero-size token carries x's dtype/width (residuals must be JAX types).
    token = jnp.zeros((0, x.shape[-1]), x.dtype)
    return out, (coords, kept, token)


def _fits_mask(coords: jnp.ndarray, kept: jnp.ndarray, nx: int, ny: int):
    """Recompute the kernel's per-group within-budget predicate.

    Mirrors `_one_group`: rows are grouped (N, D, fW//UBLOCK); the patch
    origin is the group's kept-coordinate min (x floor-free, y floored to
    the sublane tile), clamped into the grid; a row fits iff its local
    coords land inside the PATCH_H x PATCH_W window.  Rows that do NOT fit
    were dropped by the forward and must get zero cotangent."""
    f, n, d, fh, fw = kept.shape
    wb = -(-fw // UBLOCK)
    pad_w = wb * UBLOCK - fw
    if pad_w:
        coords = jnp.pad(coords, ((0, 0),) * 4 + ((0, pad_w), (0, 0)))
        kept = jnp.pad(kept, ((0, 0),) * 4 + ((0, pad_w),))
    cx = coords[..., 0].reshape(f, n, d, fh, wb, UBLOCK)
    cy = coords[..., 1].reshape(f, n, d, fh, wb, UBLOCK)
    k = kept.reshape(f, n, d, fh, wb, UBLOCK)
    big = jnp.int32(2 ** 30)
    minx = jnp.min(jnp.where(k, cx, big), axis=(3, 5), keepdims=True)
    miny = jnp.min(jnp.where(k, cy, big), axis=(3, 5), keepdims=True)
    x0 = jnp.clip(minx, 0, nx - PATCH_H)
    y0 = jnp.clip((miny // 8) * 8, 0, ny - PATCH_W)
    lx = cx - x0
    ly = cy - y0
    fits = (k & (lx >= 0) & (lx < PATCH_H) & (ly >= 0) & (ly < PATCH_W))
    fits = fits.reshape(f, n, d, fh, wb * UBLOCK)
    return fits[..., :fw]


def _pool_bwd(nx, ny, interpret, res, cots):
    """Backward of the patch pool: the pool is a masked scatter-add of rows
    into bins, so d/dx is a per-row gather of the output cotangent at each
    row's bin (VERDICT r3 item 1a).  The gather is masked with the SAME
    within-budget predicate the forward kernel applies (`_fits_mask`) —
    rows dropped for exceeding the patch budget contributed nothing to the
    output and get exactly zero gradient (VERDICT r4 item 7)."""
    dout, _ddrops = cots
    coords, kept, token = res
    f = dout.shape[0]
    n_chan = dout.shape[-1]
    fits = _fits_mask(coords, kept, nx, ny)               # (F, N, D, fH, fW)
    flat = dout.reshape(f, nx * ny, n_chan)
    cid = coords[..., 0] * ny + coords[..., 1]            # (F, N, D, fH, fW)
    cid = jnp.where(fits, cid, 0).reshape(f, -1)
    g = jnp.take_along_axis(flat, cid[..., None], axis=1)  # (F, rows, C)
    g = g.reshape(*kept.shape, n_chan)
    g = jnp.where(fits[..., None], g, 0.0)
    return (g[..., :token.shape[1]].astype(token.dtype), None, None)


_pool_with_vjp.defvjp(_pool_fwd, _pool_bwd)


def patch_pool_frames(x: jnp.ndarray, coords: jnp.ndarray, kept: jnp.ndarray,
                      nx: int, ny: int, interpret: bool = False):
    """Pool one batch of frames: (F, N, D, fH, fW, C) -> (F, nx, ny, C).

    Returns (bev fp32, drops (F,)) — drops counts rows lost to the patch
    budget (zero for sane calibrations; asserted in tests).  Differentiable:
    a custom VJP gathers the output cotangent at each row's bin, so the
    production camera pool trains (the raw ``pallas_call`` has no JVP rule)."""
    c = x.shape[-1]
    out, drops = _pool_with_vjp(x, coords, kept, nx, ny, interpret)
    return out[..., :c], drops


def patch_pool_available() -> bool:
    return _use_pallas()
