"""LiDAR branch: voxelize + sparse "spconv8x" encoder -> dense BEV features.

TPU-native equivalent of the reference pipeline
streamingflow/models/streamingflow.py:170-233 (hard voxelize + mean reduce)
-> mmdet3d/models/backbones/sparse_encoder.py:11-133 (SparseEncoder,
block_type='basicblock', encoder_channels [[16,16,32],[32,32,64],
[64,64,128],[128,128]], strided SparseConv3d between stages, conv_out
(1,1,3)/(1,1,2) -> dense (200,200,2,128) -> 256-channel BEV map).

Sparse tensors ride the static-capacity slot representation of
ops/sparse.py; batch (B*T point clouds) is a vmapped leading axis; batch
norm runs over all active voxels of all clouds (masked), matching torch
BN1d over the concatenated voxel set (norm eps 1e-3, momentum 0.01,
sparse_encoder.py:39).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SparseEncoderConfig
from ..ops import pallas_winfuse as wf
from ..ops import sparse as S
from ..ops import sparse_columns as colops
from ..ops import sparse_tiled as tileops
from ..ops.voxelize import voxelize


class MaskedBatchNorm(nn.Module):
    """BatchNorm over sparse features with a validity mask.

    Two input layouts, dispatched on mask rank:
    * compact rows:   x (..., V, C),       mask (..., V)
    * fused columns:  x (..., V, nz*C),    mask (..., V, nz)  — the column
      engine's z-fused layout (ops/sparse_columns.py); statistics are
      per-channel over active cells, computed WITHOUT leaving the fused
      layout (the (nz*C,) -> (nz, C) reshape happens on a tiny vector).

    torch BN1d semantics either way: eps 1e-3, momentum 0.01 (running =
    0.99*old + 0.01*batch), biased batch var for normalisation, unbiased
    for the running update."""
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        fused = mask.ndim == x.ndim
        nz = mask.shape[-1] if fused else 1
        c = x.shape[-1] // nz
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))

        if fused:
            mrep = jnp.repeat(mask, c, axis=-1)
            if train:
                mf = mrep.astype(jnp.float32)
                xf = x.astype(jnp.float32)
                n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
                red = tuple(range(x.ndim - 1))
                mean = jnp.sum(xf * mf, axis=red).reshape(nz, c).sum(0) / n
                var = (jnp.sum(xf * xf * mf, axis=red).reshape(nz, c).sum(0)
                       / n - mean * mean)
                var = jnp.maximum(var, 0.0)
                if not self.is_initializing():
                    ra_mean.value = (self.momentum * ra_mean.value
                                     + (1 - self.momentum) * mean)
                    unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                    ra_var.value = (self.momentum * ra_var.value
                                    + (1 - self.momentum) * unbiased)
            else:
                mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            y = (x - jnp.tile(mean, nz).astype(x.dtype)
                 ) * jnp.tile(inv, nz).astype(x.dtype
                 ) + jnp.tile(bias, nz).astype(x.dtype)
            return jnp.where(mrep, y, 0.0)

        if train:
            # fp32 statistics via fused reductions (xf/mf are consumed only
            # by the sums, so XLA folds the casts into the reduce — no fp32
            # copy of x is materialised), exactly like the fused branch
            mf = mask[..., None].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            n = jnp.maximum(jnp.sum(mf), 1.0)
            red = tuple(range(x.ndim - 1))
            mean = jnp.sum(xf * mf, axis=red) / n
            var = jnp.maximum(
                jnp.sum(xf * xf * mf, axis=red) / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        # normalise in the INPUT dtype: `scale`/`bias` are fp32 params, and
        # an uncast multiply promotes the whole activation (and, in train,
        # its gradient) to fp32 — at the dense-tail (B*T, 400, 400, 11, 64)
        # shape that alone is 5 x 6.71G of HBM (the round-4 spconv8x train
        # OOM's largest line item)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
             + bias.astype(x.dtype))
        return jnp.where(mask[..., None], y, 0.0)


def _batched_nmap(coords, ids, mask, shape):
    """One 27-tap neighbour map per cloud, shared by every subm conv of the
    stage (spconv caches indice pairs the same way, ops.py:45-126)."""
    def one(c, i, m):
        st = S.SparseTensor(jnp.zeros((i.shape[0], 1)), c, i, m, shape)
        return S.build_neighbor_map(st, 3)
    return jax.vmap(one)(coords, ids, mask)


def _batched_tmap(coords, ids, mask, shape, cap_tiles, tile):
    """One occupied-tile map per cloud (tiled engine's stage cache)."""
    return jax.vmap(lambda c, i, m: tileops.build_tile_map(
        c, i, m, shape, cap_tiles, tile=tile))(coords, ids, mask)


class DenseGrid:
    """Sentinel geometry for the dense-tail stages (see _column_ladder):
    feats are a dense (B, nx, ny, nz, C) grid, mask its (B, nx, ny, nz)
    occupancy, and convs run on every cell (no gathers)."""


_DENSE = DenseGrid()


def _conv3d(x, w, kernel, stride, padding):
    """Dense NDHWC conv with the engines' x-major (prod(k), Cin, Cout)
    tap layout (ops/sparse.py::_kernel_offsets order: dx major, dz minor
    — exactly the HWDIO reshape)."""
    kprod = kernel[0] * kernel[1] * kernel[2]
    w3 = w.reshape(*kernel, w.shape[1], w.shape[2]).astype(x.dtype)
    assert w.shape[0] == kprod
    return jax.lax.conv_general_dilated(
        x, w3, stride, [(p, p) for p in padding],
        dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
        preferred_element_type=x.dtype)


def _batched_subm(feats, mask, geo, weights, formulation='banded',
                  window=512):
    """Submanifold conv batched over clouds; `geo` selects the engine.

    TileMap: `feats` is the dense tile tensor (B, T_cap, tx, ty, tz, C)
    — halo exchange + one dense conv on the MXU; padded cells pick up
    neighbourhood sums but the masked BN that always follows zeroes
    them, so tile residency across a whole stage is exact.
    ColumnMap: `feats` is the z-fused column tensor (B, V_col, nz*C) and
    `mask` the per-column z occupancy (B, V_col, nz) — one wide 9-tap
    gather + dense z-axis conv (ops/sparse_columns.py).
    DenseGrid: `feats` is a dense (B, nx, ny, nz, C) grid — one conv,
    every cell; masked BN restores subm semantics (inactive cells are
    zero going in, so active-site values match exactly).
    NeighborMap: compact (B, V, C) row-gather GEMM."""
    if isinstance(geo, DenseGrid):
        return _conv3d(feats, weights, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    if isinstance(geo, tileops.TileMap):
        return jax.vmap(lambda tl, g: tileops.subm_conv_tiles(tl, g, weights))(
            feats, geo)
    if isinstance(geo, wf.ColumnFuseGeo):
        # python loop, not vmap: the fused kernel rides a scalar-prefetch
        # Pallas grid (same constraint as the binning kernel); the per-cloud
        # programs are identical so XLA compiles the body once
        interp = not wf.winfuse_available()
        outs = [wf.subm_conv_winfuse(
            feats[i], mask[i],
            jax.tree.map(lambda a: a[i], geo.cmap),
            jax.tree.map(lambda a: a[i], geo.plan),
            weights, mask_output=False, window=window, interpret=interp)
            for i in range(feats.shape[0])]
        return jnp.stack(outs)
    if isinstance(geo, colops.ColumnWinGeo):
        return jax.vmap(lambda f, zm, cm, pl: colops.subm_conv_columns(
            f, zm, cm, weights, formulation='win', mask_output=False,
            plan=pl, window=window))(feats, mask, geo.cmap, geo.plan)
    if isinstance(geo, colops.ColumnMap):
        # mask_output=False: the MaskedBatchNorm that always follows
        # re-masks, so the conv-level zeroing pass is redundant
        return jax.vmap(lambda f, zm, cm: colops.subm_conv_columns(
            f, zm, cm, weights, formulation=formulation,
            mask_output=False))(feats, mask, geo)
    return jax.vmap(lambda f, m, nm: S.gather_gemm(f, nm, weights, m))(
        feats, mask, geo)


def _batched_sparse_conv(feats, coords, ids, mask, shape, weights, kernel,
                         stride, padding, cap):
    def one(f, c, i, m):
        st = S.SparseTensor(f, c, i, m, shape)
        out = S.sparse_conv3d(st, weights, kernel, stride, padding, cap)
        return out.feats, out.coords, out.ids, out.mask
    out = jax.vmap(one)(feats, coords, ids, mask)
    out_shape = tuple((shape[d] + 2 * padding[d] - kernel[d]) // stride[d] + 1
                      for d in range(3))
    return (*out, out_shape)


def _down_shape(shape, kernel, stride, padding):
    """Static output grid of a strided conv — computed at the ladder level
    because a remat boundary would arrayify a tuple returned by the block
    (jax.checkpoint canonicalises every output leaf to an array)."""
    return tuple((shape[d] + 2 * padding[d] - kernel[d]) // stride[d] + 1
                 for d in range(3))


def _cin_of(feats, mask):
    """Input channel count: fused column tensors carry nz*C in the last dim
    (mask rank tells them apart — see MaskedBatchNorm)."""
    nz = mask.shape[-1] if mask.ndim == feats.ndim else 1
    return feats.shape[-1] // nz


class SubMConvBNReLU(nn.Module):
    out_channels: int
    kernel: int = 3
    formulation: str = 'banded'
    window: int = 512

    @nn.compact
    def __call__(self, feats, mask, nmap, train: bool = False):
        k3 = self.kernel ** 3
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'),
            (k3, _cin_of(feats, mask), self.out_channels))
        h = _batched_subm(feats, mask, nmap, w, self.formulation,
                          self.window)
        h = MaskedBatchNorm()(h, mask, train=train)
        return nn.relu(h)


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (mmdet3d/ops/sparse_block.py:62)."""
    channels: int
    formulation: str = 'banded'
    window: int = 512

    @nn.compact
    def __call__(self, feats, mask, nmap, train: bool = False):
        identity = feats
        w1 = self.param('kernel1', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (27, _cin_of(feats, mask),
                                        self.channels))
        h = _batched_subm(feats, mask, nmap, w1, self.formulation,
                          self.window)
        h = MaskedBatchNorm(name='bn1')(h, mask, train=train)
        h = nn.relu(h)
        w2 = self.param('kernel2', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (27, self.channels, self.channels))
        h = _batched_subm(h, mask, nmap, w2, self.formulation, self.window)
        h = MaskedBatchNorm(name='bn2')(h, mask, train=train)
        return nn.relu(h + identity)


class SparseConvBNReLU(nn.Module):
    """Strided sparse conv + BN + ReLU producing a new active set.

    When `geo` (a batched TileMap) is given, `feats` is the stage's
    resident tile tensor and the conv runs densely on the tiles
    (ops/sparse_tiled.py::sparse_conv_tiles); the compact output rows
    come back through one gather.  Parameters are identical either way."""
    out_channels: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    cap: int

    @nn.compact
    def __call__(self, feats, coords, ids, mask, shape, train: bool = False,
                 geo=None):
        kprod = self.kernel[0] * self.kernel[1] * self.kernel[2]
        cin = feats.shape[-1]
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (kprod, cin, self.out_channels))
        if geo is not None:
            out_shape = tuple(
                (shape[d] + 2 * self.padding[d] - self.kernel[d])
                // self.stride[d] + 1 for d in range(3))

            def one(tl, g, c, i, m):
                st = S.SparseTensor(jnp.zeros((i.shape[0], 1)), c, i, m,
                                    shape)
                (oi, oc, om), src = S.generate_output_sites(
                    st, self.kernel, self.stride, self.padding, out_shape,
                    self.cap, return_src=True)
                of = tileops.sparse_conv_tiles(
                    tl, g, c, w, self.kernel, self.stride, self.padding,
                    oc, om, src)
                return of, oc, oi, om

            feats, coords, ids, mask = jax.vmap(one)(feats, geo, coords,
                                                     ids, mask)
            shape = out_shape
        else:
            feats, coords, ids, mask, shape = _batched_sparse_conv(
                feats, coords, ids, mask, shape, w, self.kernel, self.stride,
                self.padding, self.cap)
        feats = MaskedBatchNorm()(feats, mask, train=train)
        return nn.relu(feats), coords, ids, mask, shape


class DenseConvBNReLU(nn.Module):
    """Strided sparse conv + BN + ReLU over a dense grid (the dense tail).

    Same parameter tree as SparseConvBNReLU / ColumnSparseConvBNReLU
    ('kernel' (prod(k), Cin, Cout) + MaskedBatchNorm_0), so checkpoints
    are engine-portable.  Output occupancy is the exact SparseConv3d
    active-site rule (any active input in the window — geometry.h:301),
    computed as a windowed max over the input mask."""
    out_channels: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x, mask, shape, train: bool = False):
        kprod = self.kernel[0] * self.kernel[1] * self.kernel[2]
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (kprod, x.shape[-1],
                                        self.out_channels))
        h = _conv3d(x, w, self.kernel, self.stride, self.padding)
        omask = jax.lax.reduce_window(
            mask.astype(jnp.float32), 0.0, jax.lax.max,
            (1, *self.kernel), (1, *self.stride),
            [(0, 0)] + [(p, p) for p in self.padding]) > 0
        h = MaskedBatchNorm()(h, omask, train=train)
        out_shape = tuple(
            (shape[d] + 2 * self.padding[d] - self.kernel[d])
            // self.stride[d] + 1 for d in range(3))
        return nn.relu(h), omask, out_shape


class ColumnSparseConvBNReLU(nn.Module):
    """Strided sparse conv + BN + ReLU over z-fused columns.

    Same parameter tree as SparseConvBNReLU ('kernel' (prod(k), Cin, Cout)
    + MaskedBatchNorm_0), so checkpoints are engine-portable.  Emits the
    new batched ColumnSet (new active columns, dilated zmask)."""
    out_channels: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    cap: int
    formulation: str = 'banded'

    @nn.compact
    def __call__(self, cs, shape, train: bool = False):
        kprod = self.kernel[0] * self.kernel[1] * self.kernel[2]
        nz = cs.zmask.shape[-1]
        cin = cs.feats.shape[-1] // nz
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_in', 'uniform'), (kprod, cin, self.out_channels))
        cap = min(self.cap, ((shape[0] + 2 * self.padding[0] - self.kernel[0])
                             // self.stride[0] + 1)
                  * ((shape[1] + 2 * self.padding[1] - self.kernel[1])
                     // self.stride[1] + 1))

        def one(f, ci, cc, cm, zm):
            c = colops.ColumnSet(f, ci, cc, cm, zm)
            out_cs, _ = colops.sparse_conv_columns(
                c, w, self.kernel, self.stride, self.padding, shape, cap,
                formulation=self.formulation, mask_output=False)
            return out_cs

        out = jax.vmap(one)(cs.feats, cs.col_ids, cs.col_coords,
                            cs.col_mask, cs.zmask)
        out_shape = tuple(
            (shape[d] + 2 * self.padding[d] - self.kernel[d])
            // self.stride[d] + 1 for d in range(3))
        feats = MaskedBatchNorm()(out.feats, out.zmask, train=train)
        return out._replace(feats=nn.relu(feats)), out_shape


class LidarBEVEncoder(nn.Module):
    """points (B, T, P, 5) -> BEV features (B, T, X, Y, 2*output_channels)."""
    cfg: SparseEncoderConfig

    @nn.compact
    def __call__(self, points, train: bool = False):
        cfg = self.cfg
        B, T, P, C = points.shape
        flat_pts = points.reshape(B * T, P, C)
        # padded points are all-zero rows (reference pads with zeros,
        # NuscenesData.py:869-873, which its CUDA voxelizer also bins)
        pt_mask = jnp.any(flat_pts[..., :3] != 0, axis=-1)

        # mixed precision: points stay fp32 for exact voxel binning, the
        # ladder runs in COMPUTE_DTYPE (bf16 under the bench/train bf16
        # mode; fp32 params can still promote intermediates, so the output
        # is also cast — the downstream temporal/ODE stack must see
        # COMPUTE_DTYPE regardless)
        out_dtype = (jnp.dtype(cfg.COMPUTE_DTYPE)
                     if cfg.COMPUTE_DTYPE != 'auto' else flat_pts.dtype)
        vox = jax.vmap(functools.partial(
            voxelize, point_cloud_range=cfg.POINT_CLOUD_RANGE,
            voxel_size=cfg.VOXEL_SIZE, max_points=cfg.MAX_NUM_POINTS,
            max_voxels=cfg.MAX_VOXELS, out_dtype=out_dtype))(flat_pts, pt_mask)
        feats, coords, mask = vox.feats, vox.coords, vox.mask
        shape = tuple(cfg.SPARSE_SHAPE)
        # Re-linearise ids into the SPARSE_SHAPE id space (the reference's
        # sparse_shape pads z by +1 over the voxel grid, sparse_encoder
        # convention); lexicographic order — and thus sortedness — is
        # preserved.
        from ..ops.voxelize import LARGE_ID, linearize
        ids = jnp.where(mask, linearize(coords, shape), LARGE_ID)

        if cfg.ENGINE == 'column':
            return self._column_ladder(feats, ids, mask, shape, B, T,
                                       out_dtype, train)

        # conv_input (sparse_encoder.py:74-82): the stage geometry cache
        # (27-tap neighbour map, or occupied-tile map for the tiled
        # engine) is built once per stage and reused by every subm conv
        # on that active set.  Under the tiled engine, features stay
        # RESIDENT in the dense tile tensor across the whole stage —
        # one scatter in, one gather out per stage; BN runs masked on
        # the tiles (same stats: padded cells are zero and excluded).
        tiled = cfg.ENGINE == 'tiled'

        tile = tuple(cfg.TILE_SHAPE)

        def make_geo(coords, ids, mask, shape, stage):
            if tiled:
                n_tiles = 1
                for d in range(3):
                    n_tiles *= -(-shape[d] // tile[d])
                cap = min(cfg.TILE_CAPS[stage], n_tiles)
                return _batched_tmap(coords, ids, mask, shape, cap, tile)
            return _batched_nmap(coords, ids, mask, shape)

        def enter_stage(feats, mask, geo):
            if tiled:
                return (jax.vmap(tileops.to_tiles)(feats, geo, mask),
                        geo.occupancy)
            return feats, mask

        geo = make_geo(coords, ids, mask, shape, 0)
        sfeats, smask = enter_stage(feats, mask, geo)
        sfeats = SubMConvBNReLU(cfg.BASE_CHANNELS, name='conv_input')(
            sfeats, smask, geo, train=train)

        # downsamples consume the resident tiles directly (geo!=None) and
        # emit compact rows, so tiled stages flow tile->tile with no
        # compact round-trip anywhere inside the ladder
        stage_paddings = [(1, 1, 1), (1, 1, 1), (1, 1, 0)]
        for i, blocks in enumerate(cfg.ENCODER_CHANNELS):
            for j, ch in enumerate(blocks):
                last = j == len(blocks) - 1
                if last and i != len(cfg.ENCODER_CHANNELS) - 1:
                    feats, coords, ids, mask, shape = SparseConvBNReLU(
                        ch, (3, 3, 3), (2, 2, 2), stage_paddings[i],
                        cap=cfg.STAGE_CAPS[i + 1],
                        name=f'down{i + 1}')(sfeats, coords, ids, mask,
                                             shape, train=train,
                                             geo=geo if tiled else None)
                    geo = make_geo(coords, ids, mask, shape, i + 1)
                    sfeats, smask = enter_stage(feats, mask, geo)
                else:
                    sfeats = SparseBasicBlock(
                        ch, name=f'stage{i + 1}_block{j}')(
                        sfeats, smask, geo, train=train)

        # conv_out: kernel (1,1,3) stride (1,1,2) pad 0 (sparse_encoder.py:88-97)
        feats, coords, ids, mask, shape = SparseConvBNReLU(
            cfg.OUTPUT_CHANNELS, (1, 1, 3), (1, 1, 2), (0, 0, 0),
            cap=cfg.STAGE_CAPS[-1], name='conv_out')(
            sfeats, coords, ids, mask, shape, train=train,
            geo=geo if tiled else None)

        # densify: (nx, ny, nz, C) -> (nx, ny, nz*C) with channel = c*nz + z
        # (reference reshape semantics, sparse_encoder.py:126-133)
        def densify(f, c, i, m):
            st = S.SparseTensor(f, c, i, m, shape)
            return S.to_dense(st)

        dense = jax.vmap(densify)(feats, coords, ids, mask)
        nx, ny, nz = shape
        dense = jnp.swapaxes(dense, -1, -2).reshape(B, T, nx, ny, -1)
        return dense.astype(out_dtype)

    def _column_ladder(self, feats, ids, mask, shape, B, T, out_dtype,
                       train: bool = False):
        """The column-engine ladder: (x, y)-sparse columns, dense z,
        z-fused (V_col, nz*C) features throughout (ops/sparse_columns.py).

        Same parameter tree / module names as the site-engines, so
        converted reference checkpoints are engine-portable."""
        cfg = self.cfg
        form = cfg.Z_FORMULATION
        win = cfg.WINFUSE_WINDOW if form == 'winfuse' else cfg.WINDOW_WIDTH

        # Per-block remat (REMAT_LADDER): the model-wide remat treats the
        # whole ladder as ONE checkpoint block, so its backward holds every
        # stage's tap stacks + dense-tail activations across all B*T clouds
        # at once — 84.3G vs 15.75G HBM at flagship scale (docs/PERF.md
        # round 5).  Checkpointing each conv/block individually bounds the
        # live set to one block's internals; tap stacks are recomputed from
        # the (cheap, int32) column maps.  static_argnums: index 0 is the
        # module itself; `train`/`shape`/sentinel-geo are hashable statics.
        if cfg.REMAT_LADDER:
            _Subm = nn.remat(SubMConvBNReLU, static_argnums=(4,))
            _Block = nn.remat(SparseBasicBlock, static_argnums=(4,))
            _BlockD = nn.remat(SparseBasicBlock, static_argnums=(3, 4))
            _DownC = nn.remat(ColumnSparseConvBNReLU, static_argnums=(2, 3))
            _DownD = nn.remat(DenseConvBNReLU, static_argnums=(3, 4))
        else:
            _Subm, _Block, _BlockD = (SubMConvBNReLU, SparseBasicBlock,
                                      SparseBasicBlock)
            _DownC, _DownD = ColumnSparseConvBNReLU, DenseConvBNReLU
        # perf-bisect knob: run only the first K pieces of the ladder
        # (0=entry, 1=conv_input+stage1, 2..4=through down_k+stage_{k+1},
        # 9=everything).  Debug/profiling only (tools/profile_column.py).
        import os as _os
        trunc = int(_os.environ.get('SF_COLUMN_TRUNC', '9'))

        def bmap(cs, grid):
            cmap = jax.vmap(lambda f, ci, cc, cm, zm: colops.build_column_map(
                colops.ColumnSet(f, ci, cc, cm, zm), grid))(*cs)
            if form == 'win':
                plan = jax.vmap(lambda cm, msk: colops.build_window_plan(
                    cm, msk, block=cfg.WINDOW_BLOCK, window=cfg.WINDOW_WIDTH,
                    resid_blocks=cfg.WINDOW_RESID_BLOCKS))(cmap, cs.col_mask)
                return colops.ColumnWinGeo(cmap, plan)
            if form == 'winfuse':
                plan = jax.vmap(lambda cm, msk: wf.build_fused_plan(
                    cm, msk, block=cfg.WINDOW_BLOCK,
                    window=cfg.WINFUSE_WINDOW,
                    resid_blocks=cfg.WINDOW_RESID_BLOCKS))(cmap, cs.col_mask)
                return wf.ColumnFuseGeo(cmap, plan)
            return cmap

        def early_out(cs, shape):
            # profiling stub: reduce instead of densifying (a dense scatter
            # at the stage-1 1600^2 grid would be GBs); shape-compatible
            # only in rank, which is all the profiler needs
            s = jnp.sum(cs.feats.astype(jnp.float32), axis=(-2, -1))
            return s.reshape(B, T, 1, 1, 1).astype(out_dtype)

        # dense tail: stages >= DENSE_TAIL_FROM_STAGE leave the column
        # representation and run every grid cell on the MXU (the gather
        # cost class disappears; the post-8x grids are small enough that
        # computing empty cells is cheaper than addressing active ones —
        # measured A/B in docs/PERF.md).  0 disables.
        dense_from = cfg.DENSE_TAIL_FROM_STAGE
        x = dmask = None         # dense-tail state once entered

        cap0 = min(cfg.COLUMN_CAPS[0], shape[0] * shape[1])
        cs = jax.vmap(lambda f, i, m: colops.from_sites(
            f, i, m, shape, cap0))(feats, ids, mask)
        # cap observability (VERDICT r3 item 6): active sites lost to the
        # entry column capacity, and per-stage cap saturation below.  Sown
        # into the 'diagnostics' collection — a no-op unless the caller
        # requests it (train step / eval_forward surface it to logs).
        self.sow('diagnostics', 'lidar_dropped_sites_entry',
                 (jnp.sum(mask) - jnp.sum(cs.zmask)).astype(jnp.int32))
        self.sow('diagnostics', 'lidar_columns_stage1',
                 jnp.max(jnp.sum(cs.col_mask, axis=-1)).astype(jnp.int32))
        if trunc < 1:
            return early_out(cs, shape)
        geo = bmap(cs, shape[:2])
        h = _Subm(cfg.BASE_CHANNELS, formulation=form,
                  window=win,
                  name='conv_input')(cs.feats, cs.zmask, geo, train)
        cs = cs._replace(feats=h)

        def enter_dense(cs, shape, c):
            xx, mm = jax.vmap(lambda f, ci, cc, cm, zm: colops.columns_to_dense(
                colops.ColumnSet(f, ci, cc, cm, zm), shape, c))(*cs)
            return xx, mm

        def early_out_dense(x):
            s = jnp.sum(x.astype(jnp.float32))
            return (s * jnp.ones((B, T, 1, 1, 1), jnp.float32)
                    ).astype(out_dtype)

        stage_paddings = [(1, 1, 1), (1, 1, 1), (1, 1, 0)]
        prev_ch = cfg.BASE_CHANNELS
        for i, blocks in enumerate(cfg.ENCODER_CHANNELS):
            if dense_from and i + 1 >= dense_from and x is None:
                x, dmask = enter_dense(cs, shape, prev_ch)
            for j, ch in enumerate(blocks):
                last = j == len(blocks) - 1
                if last and i != len(cfg.ENCODER_CHANNELS) - 1:
                    if trunc < i + 2:
                        return (early_out(cs, shape) if x is None
                                else early_out_dense(x))
                    if x is not None:
                        x, dmask, _ = _DownD(
                            ch, (3, 3, 3), (2, 2, 2), stage_paddings[i],
                            name=f'down{i + 1}')(x, dmask, shape, train)
                        shape = _down_shape(shape, (3, 3, 3), (2, 2, 2),
                                            stage_paddings[i])
                    else:
                        cs, _ = _DownC(
                            ch, (3, 3, 3), (2, 2, 2), stage_paddings[i],
                            cap=cfg.COLUMN_CAPS[i + 1], formulation=form,
                            name=f'down{i + 1}')(cs, shape, train)
                        shape = _down_shape(shape, (3, 3, 3), (2, 2, 2),
                                            stage_paddings[i])
                        # at-cap = the strided site generation truncated its
                        # unique-output list: data was dropped this step
                        per_cloud = jnp.sum(cs.col_mask, axis=-1)
                        self.sow('diagnostics', f'lidar_columns_stage{i + 2}',
                                 jnp.max(per_cloud).astype(jnp.int32))
                        self.sow('diagnostics',
                                 f'lidar_column_cap_hit_stage{i + 2}',
                                 jnp.any(per_cloud
                                         == cs.col_mask.shape[-1]
                                         ).astype(jnp.int32))
                        geo = bmap(cs, shape[:2])
                else:
                    if x is not None:
                        h = _BlockD(
                            ch, name=f'stage{i + 1}_block{j}')(
                            x, dmask, _DENSE, train)
                        x = h
                    else:
                        h = _Block(
                            ch, formulation=form, window=win,
                            name=f'stage{i + 1}_block{j}')(
                            cs.feats, cs.zmask, geo, train)
                        cs = cs._replace(feats=h)
                prev_ch = ch

        if trunc < 5:
            return early_out(cs, shape) if x is None else early_out_dense(x)
        if dense_from and x is None:      # dense_from == 5: conv_out only
            x, dmask = enter_dense(cs, shape, prev_ch)
        if x is not None:
            x, dmask, _ = _DownD(
                cfg.OUTPUT_CHANNELS, (1, 1, 3), (1, 1, 2), (0, 0, 0),
                name='conv_out')(x, dmask, shape, train)
            shape = _down_shape(shape, (1, 1, 3), (1, 1, 2), (0, 0, 0))
            nx, ny, nz = shape
            dense = jnp.swapaxes(x, -1, -2).reshape(B, T, nx, ny, -1)
            return dense.astype(out_dtype)

        cs, _ = _DownC(
            cfg.OUTPUT_CHANNELS, (1, 1, 3), (1, 1, 2), (0, 0, 0),
            cap=cfg.COLUMN_CAPS[-1], formulation=form,
            name='conv_out')(cs, shape, train)
        shape = _down_shape(shape, (1, 1, 3), (1, 1, 2), (0, 0, 0))

        nx, ny, nz = shape
        dense = jax.vmap(lambda f, ci, cc, cm, zm: colops.to_dense_bev(
            colops.ColumnSet(f, ci, cc, cm, zm), (nx, ny), nz,
            cfg.OUTPUT_CHANNELS))(*cs)
        return dense.reshape(B, T, nx, ny, -1).astype(out_dtype)
