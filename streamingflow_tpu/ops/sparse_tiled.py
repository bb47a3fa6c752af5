"""Dense-tiled execution backend for the sparse 3-D conv engine.

The gather-GEMM engine (ops/sparse.py) pays one row gather per
(site, kernel tap): 27 x V rows per submanifold conv, and TPU row
gathers/scatters cost ~17 ns apiece regardless of row width (measured,
docs/PERF.md) — at the flagship's 120 k active sites that is ~55 ms per
conv, which is why the spconv8x backbone benched at 0.12 forecasts/s.

This backend re-expresses the same math the TPU way: pay the per-site
cost ONCE per conv (one scatter in, one gather out) and let the MXU eat
the 27-tap neighbourhood as a dense convolution over *occupied tiles*:

  1. compact the active sites into occupied fixed-size tiles
     (default 8x8x8) of the voxel grid — one sort of V tile ids;
  2. scatter site features into a (T_cap, 8, 8, 8, C) dense tensor;
  3. build a 1-cell halo by exchanging face slabs with the 6 neighbour
     tiles (3 staged concats; the y/z stages read the already-extended
     tensor, so edge/corner contributions arrive transitively);
  4. run `lax.conv_general_dilated` over the haloed tiles (VALID) —
     an implicit GEMM batched over tiles that runs at MXU rates;
  5. gather the active rows back into the compact (V, C) slot array.

Padded tile cells hold zeros, so the dense conv computes exactly the
reference submanifold-conv sums (SubMConv3d, mmdet3d/ops/spconv
conv.py:255-426): contributions only from active sites, outputs read
back only at active sites.  The tile structure depends only on the
active-site geometry, so one TileMap serves every conv of a stage (the
same caching contract as spconv's indice pairs, ops.py:45-126).

Capacity: occupied tiles are capped statically (`cap_tiles`), mirroring
MAX_VOXELS/STAGE_CAPS; overflow drops the highest tile ids (see
docs/PARITY.md on static-cap semantics).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .voxelize import LARGE_ID, delinearize, linearize


class TileMap(NamedTuple):
    """Occupied-tile geometry of one active set (one point cloud).

    tile_ids:  (T_cap,) int32 linearised tile ids, ascending; LARGE_ID pad
    tile_mask: (T_cap,) bool
    nbr:       (26, T_cap) int32 tile slots of every (dx, dy, dz) != 0
               neighbour in {-1,0,1}^3, x-major order with the zero
               offset skipped (self-slot when absent).  All 26 are
               stored because halos must be assembled by DIRECT gathers:
               a staged/transitive face exchange silently drops a
               corner contribution whenever the intermediate face
               neighbour tile is unoccupied.
    nbr_found: (26, T_cap) bool
    site_flat: (V,) int32 flat cell index (tile_slot * cells + local) per
               site; invalid sites point at the trash cell T_cap * cells
    occupancy: (T_cap, tx, ty, tz) bool — active cells (for masked BN /
               debug); its trailing dims also carry the static tile shape

    All fields are arrays, so a TileMap can be built under `vmap` (one
    map per cloud) and reused by every conv of a stage."""
    tile_ids: jnp.ndarray
    tile_mask: jnp.ndarray
    nbr: jnp.ndarray
    nbr_found: jnp.ndarray
    site_flat: jnp.ndarray
    occupancy: jnp.ndarray

    @property
    def tile(self) -> Tuple[int, int, int]:
        return tuple(self.occupancy.shape[-3:])


def _tile_grid(shape: Tuple[int, int, int],
               tile: Tuple[int, int, int]) -> Tuple[int, int, int]:
    return tuple(-(-shape[d] // tile[d]) for d in range(3))


# every (dx, dy, dz) in {-1,0,1}^3 except the origin, x-major
_NBR_OFFSETS = tuple(
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0))
_NBR_INDEX = {off: i for i, off in enumerate(_NBR_OFFSETS)}


def build_tile_map(coords: jnp.ndarray, ids: jnp.ndarray, mask: jnp.ndarray,
                   shape: Tuple[int, int, int], cap_tiles: int,
                   tile: Tuple[int, int, int] = (8, 8, 8)) -> TileMap:
    """Compact the active sites of one cloud into occupied tiles.

    One V-row sort replaces the 27 binary searches the gather engine
    needs per active set."""
    grid = _tile_grid(shape, tile)
    cells = tile[0] * tile[1] * tile[2]
    V = ids.shape[0]

    tcoords = coords // jnp.asarray(tile, jnp.int32)
    tid = jnp.where(mask, linearize(tcoords, grid), LARGE_ID)

    order = jnp.arange(V, dtype=jnp.int32)
    tid_s, ord_s = jax.lax.sort_key_val(tid, order)
    first = (jnp.concatenate([jnp.ones((1,), bool), tid_s[1:] != tid_s[:-1]])
             & (tid_s < LARGE_ID))
    rank = jnp.cumsum(first) - 1                  # run index, every row
    row_ok = (tid_s < LARGE_ID) & (rank < cap_tiles)
    slot_of_first = jnp.where(first & row_ok, rank, cap_tiles)
    tile_ids = jax.ops.segment_min(
        jnp.where(slot_of_first < cap_tiles, tid_s, LARGE_ID),
        jnp.clip(slot_of_first, 0, cap_tiles - 1), num_segments=cap_tiles)
    tile_mask = tile_ids < LARGE_ID
    tile_ids = jnp.where(tile_mask, tile_ids, LARGE_ID).astype(jnp.int32)

    # per-site tile slot, via the sort payload
    slot_per_site = jnp.zeros((V,), jnp.int32).at[ord_s].set(
        jnp.where(row_ok, rank, cap_tiles).astype(jnp.int32))
    local = ((coords[:, 0] % tile[0]) * tile[1]
             + coords[:, 1] % tile[1]) * tile[2] + coords[:, 2] % tile[2]
    site_flat = jnp.where(mask & (slot_per_site < cap_tiles),
                          slot_per_site * cells + local, cap_tiles * cells)

    # all 26 neighbours (slot + found) — 26 tiny binary searches over tiles
    tcs = jnp.where(tile_mask[:, None],
                    delinearize(jnp.where(tile_mask, tile_ids, 0), grid), 0)
    nbrs, founds = [], []
    for off in _NBR_OFFSETS:
        nc = tcs + jnp.asarray(off, jnp.int32)
        inb = ((nc[:, 0] >= 0) & (nc[:, 0] < grid[0])
               & (nc[:, 1] >= 0) & (nc[:, 1] < grid[1])
               & (nc[:, 2] >= 0) & (nc[:, 2] < grid[2]) & tile_mask)
        nid = jnp.where(inb, linearize(nc, grid), LARGE_ID - 1)
        pos = jnp.clip(jnp.searchsorted(tile_ids, nid), 0, cap_tiles - 1)
        found = inb & (tile_ids[pos] == nid) & tile_mask[pos]
        nbrs.append(jnp.where(found, pos, jnp.arange(cap_tiles)))
        founds.append(found)

    occ = jnp.zeros((cap_tiles * cells + 1,), bool).at[site_flat].set(mask)
    occupancy = occ[:cap_tiles * cells].reshape((cap_tiles,) + tuple(tile))
    return TileMap(tile_ids, tile_mask, jnp.stack(nbrs), jnp.stack(founds),
                   site_flat.astype(jnp.int32), occupancy)


def dropped_sites(tmap: TileMap, mask: jnp.ndarray) -> jnp.ndarray:
    """Number of active sites that fell past the tile capacity (scalar).

    Zero on a correctly sized TILE_CAPS; use in capacity tests / debug
    runs (the engine itself drops overflow silently, like MAX_VOXELS)."""
    return jnp.sum(mask) - jnp.sum(tmap.occupancy)


def to_tiles(feats: jnp.ndarray, tmap: TileMap,
             mask: jnp.ndarray) -> jnp.ndarray:
    """(V, C) compact -> (T_cap, tx, ty, tz, C) dense tiles (one scatter)."""
    cells = tmap.tile[0] * tmap.tile[1] * tmap.tile[2]
    cap = tmap.tile_ids.shape[0]
    c = feats.shape[-1]
    flat = jnp.zeros((cap * cells + 1, c), feats.dtype).at[tmap.site_flat].set(
        jnp.where(mask[:, None], feats, 0))
    return flat[:cap * cells].reshape((cap,) + tuple(tmap.tile) + (c,))


def from_tiles(tiles: jnp.ndarray, tmap: TileMap,
               mask: jnp.ndarray) -> jnp.ndarray:
    """(T_cap, tx, ty, tz, C) dense tiles -> (V, C) compact (one gather)."""
    cells = tmap.tile[0] * tmap.tile[1] * tmap.tile[2]
    cap = tmap.tile_ids.shape[0]
    flat = tiles.reshape(cap * cells, -1)
    safe = jnp.clip(tmap.site_flat, 0, cap * cells - 1)
    return jnp.where(mask[:, None], flat[safe], 0)


def halo_exchange(tiles: jnp.ndarray, tmap: TileMap,
                  lo: Tuple[int, int, int] = (1, 1, 1),
                  hi: Tuple[int, int, int] = (1, 1, 1)) -> jnp.ndarray:
    """Add a halo of `lo`/`hi` cells per axis:
    (T, tx, ty, tz, C) -> (T, tx+lo+hi, ...).

    Every one of the up-to-26 boundary regions is gathered DIRECTLY
    from its neighbour tile's opposite slab (pre-sliced, so each gather
    moves only the cells it needs).  Direct assembly is required for
    correctness: a staged per-axis exchange forwards corner/edge data
    through face neighbours, which silently loses contributions whenever
    the intermediate face-neighbour tile is unoccupied — a common state
    of real sparse data.  Widths must not exceed the tile edge (one
    neighbour deep)."""
    for d in range(3):
        assert max(lo[d], hi[d]) <= tiles.shape[1 + d], \
            'halo wider than one neighbour tile'

    def piece(off):
        """Boundary region `off` (dx,dy,dz in {-1,0,1}), None if empty."""
        sl = [slice(None)]
        for d, o in enumerate(off):
            n = tiles.shape[1 + d]
            if o < 0:
                if lo[d] == 0:
                    return None
                sl.append(slice(n - lo[d], n))
            elif o > 0:
                if hi[d] == 0:
                    return None
                sl.append(slice(0, hi[d]))
            else:
                sl.append(slice(None))
        if off == (0, 0, 0):
            return tiles
        slab = tiles[tuple(sl)]
        k = _NBR_INDEX[off]
        found = tmap.nbr_found[k].reshape(
            (-1,) + (1,) * (tiles.ndim - 1)).astype(tiles.dtype)
        return slab[tmap.nbr[k]] * found

    xs = []
    for dx in (-1, 0, 1):
        ys = []
        for dy in (-1, 0, 1):
            zs = [p for dz in (-1, 0, 1)
                  if (p := piece((dx, dy, dz))) is not None]
            if zs:
                ys.append(jnp.concatenate(zs, axis=3)
                          if len(zs) > 1 else zs[0])
        if ys:
            xs.append(jnp.concatenate(ys, axis=2) if len(ys) > 1 else ys[0])
    return jnp.concatenate(xs, axis=1) if len(xs) > 1 else xs[0]


@jax.checkpoint
def _halo_conv(tiles, nbr, nbr_found, weights):
    """Halo + dense conv, rematerialised: the haloed tensor is ~2x the
    core and is cheap to rebuild, so don't keep it for the backward."""
    k, cin, cout = weights.shape
    tm = TileMap(None, None, nbr, nbr_found, None, None)
    haloed = halo_exchange(tiles, tm)
    w = weights.reshape(3, 3, 3, cin, cout).astype(tiles.dtype)
    return jax.lax.conv_general_dilated(
        haloed, w, window_strides=(1, 1, 1), padding='VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=tiles.dtype)


def subm_conv_tiles(tiles: jnp.ndarray, tmap: TileMap,
                    weights: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Dense-tile submanifold conv: tiles (T, tx, ty, tz, Cin) -> same
    spatial shape with Cout channels.  weights (27, Cin, Cout), x-major
    taps (matching ops/sparse.py::_kernel_offsets)."""
    assert weights.shape[0] == 27, 'tiled subm path is specialised to 3x3x3'
    out = _halo_conv(tiles, tmap.nbr, tmap.nbr_found, weights)
    if bias is not None:
        out = out + bias
    return out


def subm_conv3d_tiled(feats: jnp.ndarray, mask: jnp.ndarray, tmap: TileMap,
                      weights: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Compact-in, compact-out submanifold conv over the tile backend.

    Exact SubMConv3d semantics: padded cells are zero, outputs read back
    at active sites only."""
    tiles = to_tiles(feats, tmap, mask)
    out = subm_conv_tiles(tiles, tmap, weights, bias=None)
    res = from_tiles(out, tmap, mask)
    if bias is not None:
        res = jnp.where(mask[:, None], res + bias, 0)
    return res


def _strided_dim_params(k: int, s: int, p: int, tau: int):
    """Per-dim output range of a strided conv restricted to one tile.

    A tile covering inputs [tau*t, tau*t + tau - 1] must compute every
    output o that any of its inputs contributes to: o*s - p + tap == i.
    Returns (o_min_off, o_cnt, lo, hi): the tile computes outputs
    o = tau*t/s + o_min_off + j for j in [0, o_cnt), reading haloed
    inputs [tau*t - lo, tau*t + tau - 1 + hi].  Requires s | tau."""
    assert tau % s == 0, 'tile edge must be divisible by the stride'
    o_min_off = -((k - 1 - p) // s)
    o_cnt = (tau - 1 + p) // s - o_min_off + 1
    lo = p - s * o_min_off
    hi = max(0, (o_cnt - 1 + o_min_off) * s - p + k - 1 - (tau - 1))
    return o_min_off, o_cnt, lo, hi


def sparse_conv_tiles(tiles: jnp.ndarray, tmap: TileMap,
                      in_coords: jnp.ndarray, weights: jnp.ndarray,
                      kernel: Tuple[int, int, int],
                      stride: Tuple[int, int, int],
                      padding: Tuple[int, int, int],
                      out_coords: jnp.ndarray, out_mask: jnp.ndarray,
                      out_src: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Strided ("native") sparse conv over resident tiles -> compact rows.

    Every tile computes the full (overlapping) output range its inputs
    touch from a widened halo, so each output site's value is complete in
    the tile of ANY of its contributing inputs; `out_src` (one
    contributing input slot per output site, from
    sparse.generate_output_sites(..., return_src=True)) locates that
    tile.  Matches SparseConv3d active-site semantics exactly (spconv
    include/spconv/geometry.h:301).

    weights (prod(kernel), Cin, Cout); out gather is one row gather."""
    tile = tmap.tile
    cells = tile[0] * tile[1] * tile[2]
    cap = tmap.tile_ids.shape[0]
    prm = [_strided_dim_params(kernel[d], stride[d], padding[d], tile[d])
           for d in range(3)]
    haloed = halo_exchange(tiles, tmap,
                           lo=tuple(prm[d][2] for d in range(3)),
                           hi=tuple(prm[d][3] for d in range(3)))
    w = weights.reshape(tuple(kernel) + weights.shape[1:]).astype(tiles.dtype)
    conv = jax.lax.conv_general_dilated(
        haloed, w, window_strides=tuple(stride), padding='VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=tiles.dtype)
    o_cnt = tuple(prm[d][1] for d in range(3))
    assert conv.shape[1:4] == o_cnt, (conv.shape, o_cnt)

    # per output site: tile slot of its contributing input + local offset
    src = jnp.clip(out_src, 0, in_coords.shape[0] - 1)
    src_flat = tmap.site_flat[src]
    # a site whose tile overflowed TILE_CAPS points at the trash cell —
    # yield zeros for its outputs (cleanly dropped, like the gather
    # engine under STAGE_CAPS overflow) instead of a wrong-tile gather
    src_ok = src_flat < cap * cells
    ts = jnp.clip(src_flat, 0, cap * cells - 1) // cells
    flat = ts
    for d in range(3):
        tau_t = (in_coords[src, d] // tile[d]) * (tile[d] // stride[d])
        j = out_coords[:, d] - (tau_t + prm[d][0])
        flat = flat * o_cnt[d] + jnp.clip(j, 0, o_cnt[d] - 1)
    res = conv.reshape(-1, conv.shape[-1])[flat]
    if bias is not None:
        res = res + bias
    return jnp.where((out_mask & src_ok)[:, None], res, 0)
