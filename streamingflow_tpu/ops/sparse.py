"""Static-capacity sparse 3-D convolution engine for TPU.

TPU-native re-design of the reference's vendored spconv
(mmdet3d/ops/spconv: indice-pair building include/spconv/indice.cu.h,
gather-GEMM-scatter ops.py:128-153, SparseConvTensor structure.py:21-65).

TPUs want static shapes and batched GEMMs, so instead of hash-table indice
pairs we keep every sparse tensor as a *sorted, fixed-capacity* slot array:

  feats (V, C) / coords (V, 3) / ids (V,) ascending linearised ids / mask (V,)

Neighbour lookup is then a binary search (`searchsorted`) per kernel offset,
and each kernel offset contributes one dense (V, Cin) @ (Cin, Cout) GEMM that
runs on the MXU — gather, GEMM, accumulate, 27 times.  Downsampling
(SparseConv3d stride 2) generates candidate output sites analytically (at
most ceil(k/s) per dim per input), compacts them by sort + run-rank to a new
static capacity, then runs the same gather-GEMM against the input set.

The reference's active-site semantics are preserved exactly: SubMConv3d
outputs only at input sites; SparseConv3d outputs at every site whose
receptive field touches an input (include/spconv/geometry.h:301).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .voxelize import LARGE_ID, VoxelSet, delinearize, linearize


class SparseTensor(NamedTuple):
    feats: jnp.ndarray   # (V, C)
    coords: jnp.ndarray  # (V, 3) int32 (x, y, z)
    ids: jnp.ndarray     # (V,) int32, ascending; LARGE_ID for invalid
    mask: jnp.ndarray    # (V,) bool
    shape: Tuple[int, int, int]  # static spatial shape


def from_voxels(v: VoxelSet, shape: Tuple[int, int, int]) -> SparseTensor:
    return SparseTensor(v.feats, v.coords, v.ids, v.mask, shape)


def _kernel_offsets(kernel: Tuple[int, int, int]) -> np.ndarray:
    """All kernel tap offsets, x-major then y then z (static)."""
    kx, ky, kz = kernel
    return np.stack(np.meshgrid(np.arange(kx), np.arange(ky), np.arange(kz),
                                indexing='ij'), axis=-1).reshape(-1, 3)


def _lookup(st: SparseTensor, query_coords: jnp.ndarray,
            query_valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find slots of `query_coords` in `st` (binary search over sorted ids).

    Returns (index (Q,), found (Q,))."""
    nx, ny, nz = st.shape
    inb = ((query_coords[:, 0] >= 0) & (query_coords[:, 0] < nx)
           & (query_coords[:, 1] >= 0) & (query_coords[:, 1] < ny)
           & (query_coords[:, 2] >= 0) & (query_coords[:, 2] < nz))
    ok = query_valid & inb
    qid = jnp.where(ok, linearize(query_coords, st.shape), LARGE_ID - 1)
    idx = jnp.searchsorted(st.ids, qid)
    idx_c = jnp.clip(idx, 0, st.ids.shape[0] - 1)
    found = ok & (st.ids[idx_c] == qid) & st.mask[idx_c]
    return idx_c, found


class NeighborMap(NamedTuple):
    """Per-tap slot indices into a fixed active set.

    idx/found: (K, V).  Depends only on the active-site geometry, so one map
    serves every submanifold conv over the same active set — the TPU
    equivalent of spconv's cached indice pairs (ops.py:45-126, which builds
    the pair table once per (kernel, site-set) and reuses it)."""
    idx: jnp.ndarray
    found: jnp.ndarray


def build_neighbor_map(st: SparseTensor, kernel: int = 3) -> NeighborMap:
    """Binary-search the K=kernel^3 centred taps for every active site."""
    offsets = _kernel_offsets((kernel,) * 3) - kernel // 2
    idxs, founds = [], []
    for ki in range(offsets.shape[0]):
        off = jnp.asarray(offsets[ki], jnp.int32)
        idx, found = _lookup(st, st.coords + off, st.mask)
        idxs.append(idx)
        founds.append(found)
    return NeighborMap(jnp.stack(idxs), jnp.stack(founds))


def gather_gemm(feats: jnp.ndarray, nmap: NeighborMap, weights: jnp.ndarray,
                out_mask: jnp.ndarray, bias=None) -> jnp.ndarray:
    """One fused neighbourhood GEMM: gather (K, V, Cin) -> (V, K*Cin) and hit
    the MXU with a single (V, K*Cin) @ (K*Cin, Cout) contraction instead of
    K skinny GEMMs.  weights: (K, Cin, Cout)."""
    K, cin, cout = weights.shape
    g = feats[nmap.idx]                                  # (K, V, Cin)
    g = jnp.where(nmap.found[:, :, None], g, 0.0)
    g = jnp.moveaxis(g, 0, 1).reshape(g.shape[1], K * cin)
    acc = jnp.dot(g, weights.reshape(K * cin, cout),
                  preferred_element_type=feats.dtype)
    if bias is not None:
        acc = acc + bias
    return jnp.where(out_mask[:, None], acc, 0.0)


def subm_conv3d(st: SparseTensor, weights: jnp.ndarray, bias=None,
                nmap: Optional[NeighborMap] = None) -> SparseTensor:
    """Submanifold conv: output only at active sites.

    weights: (K, Cin, Cout) with K = prod(kernel); kernel inferred as cubic
    from K (27 -> 3x3x3).  Matches reference SubMConv3d (conv.py:255-426)
    with padding k//2 (site-centred taps).  Pass a precomputed ``nmap`` to
    amortise the neighbour search across convs sharing the active set.
    """
    K = weights.shape[0]
    k = int(round(K ** (1 / 3)))
    assert k ** 3 == K, 'subm kernel must be cubic'
    if nmap is None:
        nmap = build_neighbor_map(st, k)
    acc = gather_gemm(st.feats, nmap, weights, st.mask, bias)
    return st._replace(feats=acc)


def _candidate_outputs_1d(i, k: int, s: int, p: int, n_out: int):
    """Output positions per input position along one dim.

    o satisfies o*s - p + t == i for some tap t in [0, k); at most
    ceil(k/s) candidates. Returns (cands (..., m), valid (..., m),
    taps (..., m))."""
    m = -(-k // s)
    o0 = (i + p) // s          # largest candidate (tap t = i + p - o*s)
    cands, valids, taps = [], [], []
    for j in range(m):
        o = o0 - j
        t = i + p - o * s
        valids.append((t >= 0) & (t < k) & (o >= 0) & (o < n_out))
        cands.append(o)
        taps.append(t)
    return (jnp.stack(cands, -1), jnp.stack(valids, -1),
            jnp.stack(taps, -1))


def generate_output_sites(st: SparseTensor, kernel: Tuple[int, int, int],
                          stride: Tuple[int, int, int],
                          padding: Tuple[int, int, int],
                          out_shape: Tuple[int, int, int],
                          cap: int, return_nmap: bool = False,
                          return_src: bool = False):
    """Active output sites of a strided sparse conv, compacted to `cap` slots.

    Returns (ids (cap,), coords (cap, 3), mask (cap,)), ids ascending —
    plus, when ``return_nmap``, the (K, cap) NeighborMap of the conv as a
    byproduct: every sorted candidate row already knows its originating
    input slot, its tap, and (via the duplicate-run rank) its output slot,
    so one scatter replaces the K-searchsorted lookup loop the map would
    otherwise cost.  ``return_src`` instead returns just one contributing
    input slot per output site (the run head's payload) — enough for the
    tiled engine to locate the tile that computed each output site.
    Mirrors spconv's getIndicePairs output-site generation
    (include/spconv/geometry.h:301)."""
    K = kernel[0] * kernel[1] * kernel[2]
    cx, vx, tx = _candidate_outputs_1d(st.coords[:, 0], kernel[0], stride[0],
                                       padding[0], out_shape[0])
    cy, vy, ty = _candidate_outputs_1d(st.coords[:, 1], kernel[1], stride[1],
                                       padding[1], out_shape[1])
    cz, vz, tz = _candidate_outputs_1d(st.coords[:, 2], kernel[2], stride[2],
                                       padding[2], out_shape[2])
    # product of per-dim candidates
    ox = cx[:, :, None, None]
    oy = cy[:, None, :, None]
    oz = cz[:, None, None, :]
    val = (vx[:, :, None, None] & vy[:, None, :, None] & vz[:, None, None, :]
           & st.mask[:, None, None, None])
    o_coords = jnp.stack(jnp.broadcast_arrays(ox, oy, oz), axis=-1)
    flat_coords = o_coords.reshape(-1, 3)
    flat_val = val.reshape(-1)
    cand_ids = jnp.where(flat_val, linearize(flat_coords, out_shape), LARGE_ID)

    # payload: originating input slot + flat tap index (x-major, matching
    # _kernel_offsets), packed in an int32 (tap < 32)
    tap_flat = (tx[:, :, None, None] * (kernel[1] * kernel[2])
                + ty[:, None, :, None] * kernel[2]
                + tz[:, None, None, :])
    v_idx = jnp.arange(st.ids.shape[0], dtype=jnp.int32)[:, None, None, None]
    payload = jnp.broadcast_to(v_idx * 32 + tap_flat,
                               val.shape).reshape(-1).astype(jnp.int32)

    ids_s, pay_s = jax.lax.sort_key_val(cand_ids, payload)
    first = (jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
             & (ids_s < LARGE_ID))
    rank = jnp.cumsum(first) - 1      # every duplicate row shares its run's
    slot = jnp.where(first & (rank < cap), rank, cap)
    out_ids = jax.ops.segment_min(jnp.where(slot < cap, ids_s, LARGE_ID),
                                  jnp.clip(slot, 0, cap - 1),
                                  num_segments=cap)
    # pad empty slots with LARGE_ID (segment_min gives int-max already on
    # untouched segments)
    out_mask = out_ids < LARGE_ID
    out_coords = jnp.where(out_mask[:, None],
                           delinearize(jnp.where(out_mask, out_ids, 0),
                                       out_shape), 0)
    sites = (out_ids.astype(jnp.int32), out_coords.astype(jnp.int32),
             out_mask)
    if return_src:
        src = jnp.zeros((cap + 1,), jnp.int32).at[
            jnp.where(slot < cap, slot, cap)].set(pay_s >> 5)
        return sites, src[:cap]
    if not return_nmap:
        return sites

    # one (tap, out-slot) pair per candidate row — collision-free since the
    # input position is determined by (output, tap); rows past the cap or
    # invalid land in the trash slot K*cap
    row_ok = (ids_s < LARGE_ID) & (rank < cap)
    flatpos = jnp.where(row_ok, (pay_s & 31) * cap + rank, K * cap)
    idx_flat = jnp.zeros((K * cap + 1,), jnp.int32).at[flatpos].set(
        pay_s >> 5)
    found_flat = jnp.zeros((K * cap + 1,), bool).at[flatpos].set(row_ok)
    nmap = NeighborMap(idx_flat[:K * cap].reshape(K, cap),
                       found_flat[:K * cap].reshape(K, cap))
    return sites, nmap


def sparse_conv3d(st: SparseTensor, weights: jnp.ndarray,
                  kernel: Tuple[int, int, int], stride: Tuple[int, int, int],
                  padding: Tuple[int, int, int], cap: int,
                  bias=None) -> SparseTensor:
    """Strided ("native") sparse conv producing a new active set.

    weights: (prod(kernel), Cin, Cout)."""
    assert kernel[0] * kernel[1] * kernel[2] <= 32, \
        'tap index packs into 5 bits'
    out_shape = tuple(
        (st.shape[d] + 2 * padding[d] - kernel[d]) // stride[d] + 1
        for d in range(3))
    # the neighbour map falls out of the site-generation sort — no
    # per-tap searchsorted loop (each probe lowers to serial row gathers)
    (out_ids, out_coords, out_mask), nmap = generate_output_sites(
        st, kernel, stride, padding, out_shape, cap, return_nmap=True)
    acc = gather_gemm(st.feats, nmap, weights, out_mask, bias)
    return SparseTensor(acc, out_coords, out_ids, out_mask, out_shape)


def to_dense(st: SparseTensor) -> jnp.ndarray:
    """Scatter the sparse tensor to a dense (nx, ny, nz, C) grid.

    Reference: SparseConvTensor.dense() (structure.py:53-58)."""
    nx, ny, nz = st.shape
    n_bins = nx * ny * nz
    flat_idx = jnp.where(st.mask, linearize(st.coords, st.shape), n_bins)
    dense = jnp.zeros((n_bins + 1, st.feats.shape[-1]), st.feats.dtype)
    dense = dense.at[flat_idx].add(jnp.where(st.mask[:, None], st.feats, 0.0))
    return dense[:n_bins].reshape(nx, ny, nz, -1)
