"""Column-sparse execution backend for the sparse 3-D conv engine.

The third (and TPU-natively fastest) spconv engine: sparse over (x, y),
DENSE over z, with features stored in a z-fused layout

    feats: (V_col, nz * C)   — lane index z*C + c

so the minor dim is a few full 128-lane tiles (656 lanes at stage 1)
instead of the raw channel count.  This is the z-fused layout designed in
docs/PERF.md taken to its limit: tile = (1, 1, nz).  It removes both
failure modes of the earlier engines at flagship scale
(sparse_shape 1600x1600x41, mmdet3d sparse_encoder.py:11-133):

* the gather engine (ops/sparse.py) pays one NARROW row gather per
  (site, tap): 27 x 146 k rows x ~21 ns = ~80 ms per conv.  Gathering
  fused COLUMN rows instead moves 41x the payload per row, and wide-row
  gathers are bandwidth-bound, not row-bound (measured 2-12 ns/row at
  64-704 lanes vs 21-26 ns at 16, tools/exp_gather_width.py): the 9-tap
  column gather costs ~2.6 ms at stage-1 scale.
* the dense-tile engine (ops/sparse_tiled.py) pads the channel-minor dim
  to 128 lanes (16x HBM at C=5..32) and burns ~150x FLOPs on empty tile
  cells (LiDAR data averages ~3.4 sites per 512-cell tile); columns waste
  only the z-fill factor (~1.4-8x), and nothing on layout.

Semantics are exactly the reference's (mmdet3d/ops/spconv):
* submanifold conv (SubMConv3d, conv.py:255-426): outputs only at active
  sites — the per-column z occupancy mask `zmask` IS the active set, and
  every conv/BN masks by it;
* strided conv (SparseConv3d, include/spconv/geometry.h:301): outputs at
  every site whose receptive field touches an input — the output zmask is
  the tap-dilation of the gathered input zmasks.

The 3x3x3 neighbourhood factorises as 9 in-plane taps x a dense z-axis
conv.  Two z-conv formulations, selectable per call (both exact, A/B on
hardware via tools/exp_column_conv.py):

* 'banded': out += taps[k] @ B_k with B_k (nz_in*Cin, nz_out*Cout) banded
  (3 z-taps per output block).  Zero relayouts — everything stays fused —
  at (nz_in+...)/3 x FLOP overhead.  Wins where nz is small (late stages).
* 'conv': transpose the 9 tap stacks to (V, nz, 9*Cin) and run one
  lax.conv over z (kernel (kz, 9*Cin, Cout)).  Minimal FLOPs; pays the
  transpose/relayout bandwidth.  Wins where nz is large and C small
  (early stages).

Capacity: active columns are capped statically (COLUMN_CAPS), mirroring
MAX_VOXELS/STAGE_CAPS; overflow drops the highest column ids (see
docs/PARITY.md on static-cap semantics).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import _candidate_outputs_1d
from .voxelize import LARGE_ID


class ColumnSet(NamedTuple):
    """Column-sparse tensor of one point cloud.

    feats:      (V_col, nz*C) fused features, lane = z*C + c
    col_ids:    (V_col,) int32 = x*ny + y, ascending; LARGE_ID pad
    col_coords: (V_col, 2) int32 (x, y)
    col_mask:   (V_col,) bool
    zmask:      (V_col, nz) bool — the exact reference active-site set
    """
    feats: jnp.ndarray
    col_ids: jnp.ndarray
    col_coords: jnp.ndarray
    col_mask: jnp.ndarray
    zmask: jnp.ndarray


class ColumnMap(NamedTuple):
    """9 in-plane neighbour slots per column, x-major (dx, dy) order with
    the self tap at index 4 — plus the sorted-order shift validities that
    let the separable conv replace y-neighbour GATHERS with slot +-1
    SLICES (ids are sorted x-major, so the (0, +1) neighbour of slot s is
    slot s+1 exactly when ids are consecutive and y+1 stays in the row).
    Depends only on the active-column geometry: one map serves every
    submanifold conv of a stage (spconv's cached indice-pair contract,
    ops.py:45-126)."""
    nbr: jnp.ndarray     # (9, V_col) int32
    found: jnp.ndarray   # (9, V_col) bool
    yup_ok: jnp.ndarray  # (V_col,) bool — slot+1 is my (0, +1) neighbour
    ydn_ok: jnp.ndarray  # (V_col,) bool — slot-1 is my (0, -1) neighbour


def from_sites(feats: jnp.ndarray, ids: jnp.ndarray, mask: jnp.ndarray,
               shape: Tuple[int, int, int], cap_cols: int) -> ColumnSet:
    """Compact sorted site rows (V, C) -> ColumnSet.

    `ids` are x-major linearised ids (z minor), ascending — so sites of a
    column are already contiguous and NO sort is needed: one run-rank
    cumsum + one scatter."""
    nx, ny, nz = shape
    V, C = feats.shape
    cid = jnp.where(mask, ids // nz, LARGE_ID)
    z = jnp.where(mask, ids % nz, 0)

    first = jnp.concatenate([jnp.ones((1,), bool), cid[1:] != cid[:-1]]) & mask
    rank = jnp.cumsum(first) - 1
    row_ok = mask & (rank < cap_cols)
    col_ids = jax.ops.segment_min(
        jnp.where(first & row_ok, cid, LARGE_ID),
        jnp.clip(jnp.where(first & row_ok, rank, cap_cols), 0, cap_cols - 1),
        num_segments=cap_cols)
    col_mask = col_ids < LARGE_ID
    col_ids = jnp.where(col_mask, col_ids, LARGE_ID).astype(jnp.int32)
    col_coords = jnp.stack([jnp.where(col_mask, col_ids // ny, 0),
                            jnp.where(col_mask, col_ids % ny, 0)],
                           axis=-1).astype(jnp.int32)

    # scatter straight into the FUSED layout: a (cap*nz, C) scatter would
    # lane-pad C -> 128 (25x HBM at the C=5 entry, measured 67.7 ms for 5
    # clouds); instead build per-site z-one-hot outer products (V, nz*C)
    # and add wide rows per column slot (unique site ids -> no collisions)
    slot = jnp.where(row_ok, rank, cap_cols)
    zoh = jax.nn.one_hot(z, nz, dtype=feats.dtype)
    u = (zoh[:, :, None] * jnp.where(mask[:, None], feats, 0)[:, None, :]
         ).reshape(V, nz * C)
    fz = jnp.zeros((cap_cols + 1, nz * C), feats.dtype).at[slot].add(u)
    zm = jnp.zeros((cap_cols + 1, nz), jnp.int32).at[slot].add(
        jax.nn.one_hot(z, nz, dtype=jnp.int32)
        * row_ok[:, None].astype(jnp.int32))
    return ColumnSet(fz[:cap_cols], col_ids, col_coords, col_mask,
                     zm[:cap_cols] > 0)


def to_sites(cs: ColumnSet, ids: jnp.ndarray, mask: jnp.ndarray,
             nz: int, C: int) -> jnp.ndarray:
    """Read compact (V, C) site rows back out (one gather); `ids` x-major."""
    cap = cs.col_ids.shape[0]
    pos = jnp.clip(jnp.searchsorted(cs.col_ids,
                                    jnp.where(mask, ids // nz, LARGE_ID - 1)),
                   0, cap - 1)
    ok = mask & (cs.col_ids[pos] == ids // nz) & cs.col_mask[pos]
    flat = jnp.where(ok, pos * nz + ids % nz, 0)
    rows = cs.feats.reshape(cap * nz, C)[flat]
    return jnp.where(ok[:, None], rows, 0)


def dropped_sites(cs: ColumnSet, mask: jnp.ndarray) -> jnp.ndarray:
    """Active sites lost to the column capacity (scalar; 0 when sized)."""
    return jnp.sum(mask) - jnp.sum(cs.zmask)


# in-plane taps, x-major, self at index 4
_PLANE_OFFSETS = tuple((dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))


def _slot_table(col_ids: jnp.ndarray, col_mask: jnp.ndarray,
                n_cells: int, lead: int = 0) -> jnp.ndarray:
    """Dense (lead + n_cells + 1,) int32 column-slot lookup; -1 = empty.

    One scatter of V narrow rows.  The 2-D grid is small enough to keep
    dense even at flagship scale (1600^2 x int32 = 10 MB), and table
    gathers replace per-tap `searchsorted` — whose ~16 serial
    binary-search gathers per probe measured 37-95 ms per stage map
    (tools/exp_column_pieces.py) and dominated the whole engine.
    ``lead`` prepends sentinel cells so windowed gathers starting at
    cell-1 never underflow (flat cell c lives at index lead + c)."""
    tbl = jnp.full((lead + n_cells + 1,), -1, jnp.int32)
    return tbl.at[lead + jnp.where(col_mask, col_ids, n_cells)].set(
        jnp.arange(col_ids.shape[0], dtype=jnp.int32))


def _window3(tbl_ext: jnp.ndarray, cell_start: jnp.ndarray) -> jnp.ndarray:
    """Gather 3-lane windows covering flat cells [cell_start, cell_start+2]
    from a lead-1 slot table -> (V, 3).

    One 3-wide windowed gather costs one row descriptor instead of three
    scalar gathers (narrow table lookups measured 3.8 GB/s / ~8 ns per
    ELEMENT — they dominated the map builds at 81 ms per forward).  The
    lead sentinel makes cell_start = -1 (an x-row's y=0 window) a valid
    index; out-of-row lanes are masked by the caller's y-bounds checks,
    and a lane that falls into the PREVIOUS x-row's tail is likewise
    masked (its dy is out of [0, ny))."""
    start = (cell_start + 1)[:, None]     # lead-1 table: flat cell c at c+1
    return jax.lax.gather(
        tbl_ext, start,
        jax.lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
        slice_sizes=(3,), mode='clip')


def build_column_map(cs: ColumnSet, grid: Tuple[int, int]) -> ColumnMap:
    """Three 3-wide windowed table gathers (one per dx row)."""
    nx, ny = grid
    cap = cs.col_ids.shape[0]
    tbl = _slot_table(cs.col_ids, cs.col_mask, nx * ny, lead=1)
    x, y = cs.col_coords[:, 0], cs.col_coords[:, 1]
    rows_pos, rows_found = [], []
    for dx in (-1, 0, 1):
        xq = x + dx
        x_ok = (xq >= 0) & (xq < nx) & cs.col_mask
        w = _window3(tbl, jnp.where(x_ok, xq * ny + y - 1, -1))  # dy=-1,0,1
        for j, dy in enumerate((-1, 0, 1)):
            yq = y + dy
            ok = x_ok & (yq >= 0) & (yq < ny)
            p = w[:, j]
            rows_pos.append(jnp.where(ok & (p >= 0), p, 0).astype(jnp.int32))
            rows_found.append(ok & (p >= 0))
    nbr = jnp.stack(rows_pos)
    found = jnp.stack(rows_found)
    self_slot = jnp.arange(cap, dtype=jnp.int32)
    nbr = nbr.at[4].set(self_slot)
    found = found.at[4].set(cs.col_mask)

    consec = cs.col_ids[1:] == cs.col_ids[:-1] + 1
    pair_ok = consec & cs.col_mask[:-1] & cs.col_mask[1:]
    yup_ok = jnp.concatenate([
        pair_ok & (cs.col_coords[:-1, 1] + 1 < ny), jnp.zeros((1,), bool)])
    ydn_ok = jnp.concatenate([
        jnp.zeros((1,), bool), pair_ok & (cs.col_coords[1:, 1] > 0)])
    return ColumnMap(nbr, found, yup_ok, ydn_ok)


def _gather_taps(feats: jnp.ndarray, nbr: jnp.ndarray,
                 found: jnp.ndarray) -> jnp.ndarray:
    """(T, V_col) slots -> (T, V_col, nz*C) tap stacks (ONE wide gather)."""
    g = feats[nbr]
    return jnp.where(found[:, :, None], g, 0)


class WindowPlan(NamedTuple):
    """Geometry for the block-windowed subm formulation ('win').

    Sorted x-major column ids make the source slot of a fixed in-plane
    tap MONOTONE in the output slot (id' = id + dx*ny + dy preserves
    order), so a block of consecutive output columns reads a CONTIGUOUS
    source window: one wide slice per (block, dx) + an in-VMEM one-hot
    selection MATMUL replaces the per-row random gather that dominates
    the column engine (docs/PERF.md: tap gathers ~1.16 s/forward at
    1.3 KB random-row granularity; measured windows for block=256 stay
    under ~304 rows at every stage, tools/exp_window_stats.py).

    Blocks whose window overflows `window` rows (density cliffs between
    adjacent x-rows; never observed on LiDAR-like clouds at window=2x
    block) fall back to direct per-row gathers, whole-block, capped at
    `resid_blocks` — beyond the cap, side-tap contributions of further
    overflowing blocks are DROPPED and counted (`n_dropped`), mirroring
    the engine's static-capacity semantics (docs/PARITY.md).

    Fields (V_p = n_blocks * block >= V_col; row order = slot order):
    starts:   (2, n_blocks) int32 — window start per dx in (-1, +1)
    rel:      (6, V_p) int32 — in-window source index per side tap
              (x-major order -1..+1 x dy -1..+1); -1 = no contribution
              via the window (not found / overflow / residual block)
    rrows:    (resid_blocks*block,) int32 — residual output rows
    rslots:   (6, resid_blocks*block) int32 — their per-tap source slots
    rfound:   (6, resid_blocks*block) bool
    rmask:    (resid_blocks*block,) bool
    n_dropped: () int32 — side-tap entries lost beyond the residual cap
    """
    starts: jnp.ndarray
    rel: jnp.ndarray
    rrows: jnp.ndarray
    rslots: jnp.ndarray
    rfound: jnp.ndarray
    rmask: jnp.ndarray
    n_dropped: jnp.ndarray


class ColumnWinGeo(NamedTuple):
    """Stage geometry bundle for the 'win' formulation."""
    cmap: ColumnMap
    plan: WindowPlan


# side taps (dx != 0) in x-major order; dx=0 taps ride sorted-order slices
_SIDE_TAPS = (0, 1, 2, 6, 7, 8)


def build_window_plan(cmap: ColumnMap, col_mask: jnp.ndarray,
                      block: int = 256, window: int = 512,
                      resid_blocks: int = 16) -> WindowPlan:
    """Per-stage windowed-gather geometry from an existing ColumnMap.

    Pure function of the active-column geometry — one plan serves every
    submanifold conv of the stage (the indice-pair cache contract)."""
    cap = col_mask.shape[0]
    window = min(window, cap)
    n_blocks = -(-cap // block)
    v_p = n_blocks * block
    pad = v_p - cap

    nbr6 = jnp.stack([cmap.nbr[k] for k in _SIDE_TAPS])
    found6 = jnp.stack([cmap.found[k] for k in _SIDE_TAPS])
    if pad:
        nbr6 = jnp.pad(nbr6, ((0, 0), (0, pad)))
        found6 = jnp.pad(found6, ((0, 0), (0, pad)))

    slots = nbr6.reshape(6, n_blocks, block)
    fnd = found6.reshape(6, n_blocks, block)
    starts, rels = [], []
    for d in range(2):                      # dx = -1 then +1
        s3, f3 = slots[3 * d:3 * d + 3], fnd[3 * d:3 * d + 3]
        smin = jnp.min(jnp.where(f3, s3, LARGE_ID), axis=(0, 2))
        start = jnp.clip(jnp.where(smin < LARGE_ID, smin, 0),
                         0, max(cap - window, 0)).astype(jnp.int32)
        starts.append(start)
        rels.append(s3 - start[None, :, None])
    starts = jnp.stack(starts)
    rel = jnp.concatenate(rels).reshape(6, v_p)

    over = found6 & (rel >= window)
    block_over = jnp.any(over.reshape(6, n_blocks, block), axis=(0, 2))
    over_rank = jnp.cumsum(block_over) - 1
    in_resid = block_over & (over_rank < resid_blocks)
    n_dropped = jnp.sum(over & ~jnp.repeat(in_resid, block)[None, :])

    rel = jnp.where(found6 & (rel < window)
                    & ~jnp.repeat(in_resid, block)[None, :],
                    rel, -1).astype(jnp.int32)

    rb = max(resid_blocks, 1)
    rblk = jax.ops.segment_min(
        jnp.where(in_resid, jnp.arange(n_blocks), n_blocks),
        jnp.clip(jnp.where(in_resid, over_rank, rb), 0, rb - 1),
        num_segments=rb)
    rok = rblk < n_blocks
    rrows_full = (rblk[:, None] * block
                  + jnp.arange(block)[None, :]).reshape(-1)
    rmask = (jnp.repeat(rok, block) & (rrows_full < cap))
    rrows = jnp.clip(rrows_full, 0, cap - 1).astype(jnp.int32)
    rslots = nbr6[:, rrows].astype(jnp.int32)
    rfound = found6[:, rrows] & rmask[None, :]
    return WindowPlan(starts, rel, rrows, rslots, rfound, rmask,
                      n_dropped.astype(jnp.int32))


def _window_gather(feats: jnp.ndarray, starts: jnp.ndarray,
                   window: int) -> jnp.ndarray:
    """(cap, L) feats + (n_blocks,) starts -> (n_blocks, window, L) slices.

    Contiguous wide slices (sequential DMA) instead of random rows."""
    return jax.lax.gather(
        feats, starts[:, None],
        jax.lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
        slice_sizes=(window, feats.shape[-1]), mode='clip')


def _subm_windowed(feats, cmap: ColumnMap, plan: WindowPlan, weights, nz,
                   window: int):
    """3x3x3 subm conv: dx=0 taps as sorted-order slices, dx=+-1 taps via
    block-contiguous window slices + one-hot selection matmuls (MXU), plus
    a capped whole-block residual gather for window-overflow blocks.

    `window` MUST equal the value `plan` was built with (slice length and
    start clipping are tied to it)."""
    dt = feats.dtype
    cap, L = feats.shape
    window = min(window, cap)
    n_blocks = plan.starts.shape[1]
    block = plan.rel.shape[1] // n_blocks
    zrow = jnp.zeros((1, L), dt)
    g_dy0 = {
        -1: jnp.concatenate([zrow, feats[:-1]])
            * cmap.ydn_ok[:, None].astype(dt),
        0: feats,
        1: jnp.concatenate([feats[1:], zrow])
           * cmap.yup_ok[:, None].astype(dt),
    }

    def band(k):
        return _banded_matrix(weights[k * 3:(k + 1) * 3], nz, nz,
                              3, 1, 1).astype(dt)

    out = None
    for dy in (-1, 0, 1):
        acc = jnp.dot(g_dy0[dy], band(3 + (dy + 1)),
                      preferred_element_type=dt)
        out = acc if out is None else out + acc

    pad = n_blocks * block - cap
    rel = plan.rel.reshape(6, n_blocks, block)
    iota = jnp.arange(window, dtype=jnp.int32)
    for d in range(2):
        win = _window_gather(feats, plan.starts[d], window)
        oh = (rel[3 * d:3 * d + 3, :, :, None] == iota).astype(dt)
        taps = jnp.einsum('tbiw,bwc->tbic', oh, win,
                          preferred_element_type=dt)
        taps = taps.reshape(3, n_blocks * block, L)
        if pad:
            taps = taps[:, :cap]
        for j in range(3):
            out = out + jnp.dot(taps[j], band(_SIDE_TAPS[3 * d + j]),
                                preferred_element_type=dt)

    # residual: overflow blocks redo their 6 side taps by direct gather
    g = (feats[plan.rslots.reshape(-1)].reshape(6, -1, L)
         * plan.rfound[:, :, None].astype(dt))
    contrib = None
    for i, k in enumerate(_SIDE_TAPS):
        acc = jnp.dot(g[i], band(k), preferred_element_type=dt)
        contrib = acc if contrib is None else contrib + acc
    out = out.at[plan.rrows].add(contrib
                                 * plan.rmask[:, None].astype(dt))
    return out


def _banded_matrix(w_taps: jnp.ndarray, nz_in: int, nz_out: int,
                   kz: int, sz: int, pz: int) -> jnp.ndarray:
    """(kz, Cin, Cout) z-tap weights -> (nz_in*Cin, nz_out*Cout) band.

    B[zi*Cin + i, zo*Cout + j] = w_taps[tz, i, j] where zi = zo*sz - pz + tz.
    Indices are static; built per conv at trace time (tiny)."""
    kz_, cin, cout = w_taps.shape
    assert kz_ == kz
    rows, cols, taps = [], [], []
    for zo in range(nz_out):
        for tz in range(kz):
            zi = zo * sz - pz + tz
            if 0 <= zi < nz_in:
                rows.append(zi)
                cols.append(zo)
                taps.append(tz)
    B = jnp.zeros((nz_in, cin, nz_out, cout), w_taps.dtype)
    B = B.at[np.asarray(rows), :, np.asarray(cols), :].set(
        w_taps[np.asarray(taps)])
    return B.reshape(nz_in * cin, nz_out * cout)


def _zconv_banded(taps, w, nz_in, nz_out, kz, sz, pz):
    """taps (T, V, nz_in*Cin), w (T*kz, Cin, Cout) -> (V, nz_out*Cout).

    T accumulating fused matmuls; no relayout anywhere."""
    T = taps.shape[0]
    cin, cout = w.shape[1], w.shape[2]
    dt = taps.dtype
    out = None
    for k in range(T):
        B = _banded_matrix(w[k * kz:(k + 1) * kz], nz_in, nz_out,
                           kz, sz, pz).astype(dt)
        acc = jnp.dot(taps[k], B, preferred_element_type=dt)
        out = acc if out is None else out + acc
    return out


def _zconv_conv(taps, w, nz_in, nz_out, kz, sz, pz):
    """taps (T, V, nz_in*Cin), w (T*kz, Cin, Cout) -> (V, nz_out*Cout).

    One lax.conv over the dense z axis with the T in-plane taps as input
    channel groups; minimal FLOPs, pays one (T,V,nz,Cin)->(V,nz,T*Cin)
    relayout each way."""
    T, V = taps.shape[0], taps.shape[1]
    cin, cout = w.shape[1], w.shape[2]
    g = taps.reshape(T, V, nz_in, cin)
    g = jnp.transpose(g, (1, 2, 0, 3)).reshape(V, nz_in, T * cin)
    kern = w.reshape(T, kz, cin, cout).transpose(1, 0, 2, 3).reshape(
        kz, T * cin, cout).astype(taps.dtype)
    out = jax.lax.conv_general_dilated(
        g, kern, window_strides=(sz,), padding=[(pz, pz)],
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        preferred_element_type=taps.dtype)
    assert out.shape[1] == nz_out, (out.shape, nz_out)
    return out.reshape(V, nz_out * cout)


_ZCONV = {'banded': _zconv_banded, 'conv': _zconv_conv}


def _mask_fused(x: jnp.ndarray, zmask: jnp.ndarray) -> jnp.ndarray:
    """Zero inactive cells of a fused (V, nz*C) tensor (zmask (V, nz))."""
    c = x.shape[-1] // zmask.shape[-1]
    return jnp.where(jnp.repeat(zmask, c, axis=-1), x, 0)


def _subm_separable(feats, cmap: ColumnMap, weights, nz):
    """3x3x3 subm conv with the 3 dx=0 taps as sorted-order SLICES and the
    6 dx=+-1 taps as direct row gathers.

    Sorted ids make the (0, +-1) neighbours slot +-1 (validity in the
    map), so the y-center column never gathers — 6 random gathers per
    conv instead of 8, each at an exact per-tap slot from the map (a
    two-pass y-aggregate would be cheaper still, but loses corner
    contributions whenever the face column between v and a diagonal
    neighbour is unoccupied — the same hazard ops/sparse_tiled.py
    documents for staged halo exchanges)."""
    dt = feats.dtype
    zrow = jnp.zeros((1, feats.shape[-1]), dt)
    g_dy0 = {
        -1: jnp.concatenate([zrow, feats[:-1]])
            * cmap.ydn_ok[:, None].astype(dt),
        0: feats,
        1: jnp.concatenate([feats[1:], zrow])
           * cmap.yup_ok[:, None].astype(dt),
    }

    def band(k):
        return _banded_matrix(weights[k * 3:(k + 1) * 3], nz, nz,
                              3, 1, 1).astype(dt)

    out = None
    for dy in (-1, 0, 1):
        acc = jnp.dot(g_dy0[dy], band(3 + (dy + 1)),
                      preferred_element_type=dt)
        out = acc if out is None else out + acc
    side = jnp.stack([cmap.nbr[k] for k in (0, 1, 2, 6, 7, 8)])
    side_found = jnp.stack([cmap.found[k] for k in (0, 1, 2, 6, 7, 8)])
    g6 = jnp.where(side_found[:, :, None], feats[side], 0)
    for i, k in enumerate((0, 1, 2, 6, 7, 8)):
        out = out + jnp.dot(g6[i], band(k), preferred_element_type=dt)
    return out


def subm_conv_columns(feats: jnp.ndarray, zmask: jnp.ndarray,
                      cmap: ColumnMap, weights: jnp.ndarray,
                      bias=None, formulation: str = 'sep',
                      mask_output: bool = True, plan: WindowPlan = None,
                      window: int = 512) -> jnp.ndarray:
    """Submanifold 3x3x3 conv over fused columns.

    feats (V, nz*Cin), weights (27, Cin, Cout) x-major taps (matching
    ops/sparse.py::_kernel_offsets) -> (V, nz*Cout), outputs only at
    active sites (SubMConv3d semantics).  Formulations: 'win' (dx=0 taps
    as sorted-order slices, dx=+-1 taps via block-contiguous window
    slices + one-hot MXU selection — needs `plan`/`window`; the fastest
    at flagship occupancy), 'sep' (dx=0 slices, 6 random gathers),
    'banded' (8-tap gather + fused matmuls), 'conv' (8-tap gather +
    lax.conv over z).

    ``mask_output=False`` skips the inactive-cell zeroing for callers
    whose masked BN immediately re-masks (saves one full tensor pass per
    conv); inactive-cell values are then conv sums of active neighbours
    (finite, ignored by masked statistics)."""
    assert weights.shape[0] == 27, 'column subm path is specialised to 3x3x3'
    nz = zmask.shape[-1]
    if formulation == 'win':
        assert plan is not None, "'win' needs a WindowPlan (build_window_plan)"
        out = _subm_windowed(feats, cmap, plan, weights, nz, window)
    elif formulation == 'sep':
        out = _subm_separable(feats, cmap, weights, nz)
    else:
        taps = _gather_taps(feats, cmap.nbr, cmap.found)
        out = _ZCONV[formulation](taps, weights, nz, nz, 3, 1, 1)
    if bias is not None:
        out = out + jnp.tile(bias, nz).astype(out.dtype)
    return _mask_fused(out, zmask) if mask_output else out


def gen_output_columns(cs: ColumnSet, zmask_touches: jnp.ndarray,
                       kernel2: Tuple[int, int], stride2: Tuple[int, int],
                       pad2: Tuple[int, int], out_grid: Tuple[int, int],
                       cap: int):
    """Active output columns of a strided conv (2-D analogue of
    ops/sparse.py::generate_output_sites).

    ``zmask_touches``: (V,) bool — whether the column holds any active z
    that maps onto a valid output z (so output columns exactly cover the
    reference per-SITE active-output rule, geometry.h:301).
    Returns (out_ids, out_coords, out_mask) with ids ascending."""
    cx, vx, _ = _candidate_outputs_1d(cs.col_coords[:, 0], kernel2[0],
                                      stride2[0], pad2[0], out_grid[0])
    cy, vy, _ = _candidate_outputs_1d(cs.col_coords[:, 1], kernel2[1],
                                      stride2[1], pad2[1], out_grid[1])
    ox = cx[:, :, None]
    oy = cy[:, None, :]
    val = (vx[:, :, None] & vy[:, None, :]
           & (cs.col_mask & zmask_touches)[:, None, None])
    cand = jnp.where(val, ox * out_grid[1] + oy, LARGE_ID).reshape(-1)
    ids_s = jax.lax.sort(cand)
    first = (jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
             & (ids_s < LARGE_ID))
    rank = jnp.cumsum(first) - 1
    keep = first & (rank < cap)
    out_ids = jax.ops.segment_min(jnp.where(keep, ids_s, LARGE_ID),
                                  jnp.clip(jnp.where(keep, rank, cap),
                                           0, cap - 1),
                                  num_segments=cap)
    out_mask = out_ids < LARGE_ID
    out_ids = jnp.where(out_mask, out_ids, LARGE_ID).astype(jnp.int32)
    out_coords = jnp.stack(
        [jnp.where(out_mask, out_ids // out_grid[1], 0),
         jnp.where(out_mask, out_ids % out_grid[1], 0)], -1).astype(jnp.int32)
    return out_ids, out_coords, out_mask


def _z_touches_valid(nz_in: int, nz_out: int, kz: int, sz: int,
                     pz: int) -> np.ndarray:
    """Static (nz_in,) bool: input z contributes to some valid output z."""
    touch = np.zeros((nz_in,), bool)
    for zo in range(nz_out):
        for tz in range(kz):
            zi = zo * sz - pz + tz
            if 0 <= zi < nz_in:
                touch[zi] = True
    return touch


def sparse_conv_columns(cs: ColumnSet, weights: jnp.ndarray,
                        kernel: Tuple[int, int, int],
                        stride: Tuple[int, int, int],
                        padding: Tuple[int, int, int],
                        shape: Tuple[int, int, int], cap: int,
                        bias=None,
                        formulation: str = 'banded',
                        mask_output: bool = True
                        ) -> Tuple[ColumnSet, Tuple[int, int, int]]:
    """Strided ("native") sparse conv: new active columns + dilated zmask.

    weights (prod(kernel), Cin, Cout), x-major taps.  Matches SparseConv3d
    active-site semantics exactly: output site active iff any input site
    touches it; values include every contributing tap."""
    nx, ny, nz = shape
    kz, sz, pz = kernel[2], stride[2], padding[2]
    if formulation in ('sep', 'win', 'winfuse'):
        formulation = 'banded'   # strided convs always tap-gather
    out_shape = tuple((shape[d] + 2 * padding[d] - kernel[d]) // stride[d] + 1
                      for d in range(3))
    nz_out = out_shape[2]

    ztv = jnp.asarray(_z_touches_valid(nz, nz_out, kz, sz, pz))
    touches = jnp.any(cs.zmask & ztv[None, :], axis=-1)
    out_ids, out_coords, out_mask = gen_output_columns(
        cs, touches, kernel[:2], stride[:2], padding[:2], out_shape[:2], cap)

    # per-(in-plane tap) contributing input column of every output column
    # — 3-wide windowed table gathers where the y taps are consecutive
    # (kernel[1] == 3), scalar lookups otherwise (see _slot_table)
    tbl = _slot_table(cs.col_ids, cs.col_mask, nx * ny, lead=1)
    poss, inbs = [], []
    for tx in range(kernel[0]):
        ix = out_coords[:, 0] * stride[0] - padding[0] + tx
        x_ok = (ix >= 0) & (ix < nx) & out_mask
        iy0 = out_coords[:, 1] * stride[1] - padding[1]
        if kernel[1] == 3:
            w = _window3(tbl, jnp.where(x_ok, ix * ny + iy0, -1))
            for ty in range(3):
                iy = iy0 + ty
                inbs.append(x_ok & (iy >= 0) & (iy < ny))
                poss.append(w[:, ty])
        else:
            for ty in range(kernel[1]):
                iy = iy0 + ty
                inb = x_ok & (iy >= 0) & (iy < ny)
                poss.append(tbl[1 + jnp.where(inb, ix * ny + iy, -1)])
                inbs.append(inb)
    pos = jnp.stack(poss)
    found = jnp.stack(inbs) & (pos >= 0)
    nbr = jnp.where(found, pos, 0).astype(jnp.int32)

    taps = _gather_taps(cs.feats, nbr, found)
    out = _ZCONV[formulation](taps, weights, nz, nz_out, kz, sz, pz)

    # dilated output zmask: OR of every contributing input cell
    zm_in = jnp.where(found[:, :, None], cs.zmask[nbr], False)
    zm_pad = jnp.pad(zm_in, ((0, 0), (0, 0), (pz, pz + kz)))
    zm_out = jnp.zeros((out_mask.shape[0], nz_out), bool)
    for tz in range(kz):
        sl = zm_pad[:, :, tz:tz + (nz_out - 1) * sz + 1:sz]
        zm_out = zm_out | jnp.any(sl, axis=0)
    zm_out = zm_out & out_mask[:, None]

    if bias is not None:
        out = out + jnp.tile(bias, nz_out).astype(out.dtype)
    if mask_output:
        out = _mask_fused(out, zm_out)
    return (ColumnSet(out, out_ids, out_coords, out_mask, zm_out),
            out_shape)


def columns_to_dense(cs: ColumnSet, shape: Tuple[int, int, int],
                     C: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter a ColumnSet to a dense grid: (nx, ny, nz, C) + (nx, ny, nz)
    occupancy.

    The dense-tail entry point (see models/lidar_encoder.py): late stages
    whose grids are small run every cell on the MXU instead of gathering —
    inactive cells hold exact zeros, so a dense conv reproduces subm-conv
    values at active sites and the masked BN that follows zeroes the rest
    (the tile-residency argument of ops/sparse_tiled.py, grid-sized)."""
    nx, ny, nz = shape
    flat_idx = jnp.where(cs.col_mask, cs.col_ids, nx * ny)
    dense = jnp.zeros((nx * ny + 1, cs.feats.shape[-1]), cs.feats.dtype)
    dense = dense.at[flat_idx].add(_mask_fused(cs.feats, cs.zmask))
    zm = jnp.zeros((nx * ny + 1, nz), jnp.int32).at[flat_idx].add(
        cs.zmask.astype(jnp.int32) * cs.col_mask[:, None].astype(jnp.int32))
    return (dense[:nx * ny].reshape(nx, ny, nz, C),
            (zm[:nx * ny] > 0).reshape(nx, ny, nz))


def to_dense_bev(cs: ColumnSet, grid: Tuple[int, int], nz: int,
                 C: int) -> jnp.ndarray:
    """Scatter columns to a dense (nx, ny, nz*C) grid with the reference
    channel order c*nz + z (SparseConvTensor.dense + the view at
    sparse_encoder.py:126-133)."""
    nx, ny = grid
    flat_idx = jnp.where(cs.col_mask, cs.col_ids, nx * ny)
    dense = jnp.zeros((nx * ny + 1, cs.feats.shape[-1]), cs.feats.dtype)
    dense = dense.at[flat_idx].add(
        jnp.where(cs.col_mask[:, None], cs.feats, 0))
    dense = dense[:nx * ny].reshape(nx, ny, nz, C)
    return jnp.swapaxes(dense, -1, -2).reshape(nx, ny, C * nz)
