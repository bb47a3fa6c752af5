"""Voxelizer + sparse conv engine tests: parity against naive dense numpy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingflow_tpu.ops import sparse as S
from streamingflow_tpu.ops.voxelize import voxelize

RANGE = [0.0, 0.0, 0.0, 4.0, 4.0, 2.0]
VSIZE = [0.5, 0.5, 0.5]
SHAPE = (8, 8, 4)


def rand_cloud(n=200, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = rng.uniform(-0.5, 4.5, n)
    pts[:, 1] = rng.uniform(-0.5, 4.5, n)
    pts[:, 2] = rng.uniform(-0.5, 2.5, n)
    pts[:, 3:] = rng.rand(n, 2)
    return pts


class TestVoxelize:
    def test_matches_naive_mean(self):
        pts = rand_cloud()
        mask = np.ones(len(pts), bool)
        v = voxelize(jnp.asarray(pts), jnp.asarray(mask), RANGE, VSIZE,
                     max_points=10, max_voxels=128)
        # naive: group by voxel, mean of first 10 points
        groups = {}
        for p in pts:
            c = tuple(np.floor((p[:3] - np.array(RANGE[:3])) /
                               np.array(VSIZE)).astype(int))
            if all(0 <= c[d] < SHAPE[d] for d in range(3)):
                groups.setdefault(c, []).append(p)
        assert int(v.mask.sum()) == len(groups)
        coords = np.asarray(v.coords)[np.asarray(v.mask)]
        feats = np.asarray(v.feats)[np.asarray(v.mask)]
        for c, f in zip(coords, feats):
            ref = np.mean(groups[tuple(c)][:10], axis=0)
            np.testing.assert_allclose(f, ref, rtol=1e-5, atol=1e-5)

    def test_point_mask_respected(self):
        pts = rand_cloud()
        mask = np.zeros(len(pts), bool)
        mask[:5] = True
        v = voxelize(jnp.asarray(pts), jnp.asarray(mask), RANGE, VSIZE,
                     max_points=10, max_voxels=128)
        assert int(v.mask.sum()) <= 5

    def test_ids_sorted(self):
        pts = rand_cloud(seed=3)
        v = voxelize(jnp.asarray(pts), jnp.asarray(np.ones(len(pts), bool)),
                     RANGE, VSIZE, max_points=10, max_voxels=128)
        ids = np.asarray(v.ids)
        assert (np.diff(ids.astype(np.int64)) >= 0).all()

    def test_out_dtype_bf16_with_fp32_points(self):
        """Mixed-precision contract: fp32 points (exact binning) in, bf16
        features out, with the mean still accumulated in fp32."""
        pts = rand_cloud(seed=7)
        mask = jnp.asarray(np.ones(len(pts), bool))
        ref = voxelize(jnp.asarray(pts), mask, RANGE, VSIZE,
                       max_points=10, max_voxels=128)
        v16 = voxelize(jnp.asarray(pts), mask, RANGE, VSIZE,
                       max_points=10, max_voxels=128,
                       out_dtype=jnp.bfloat16)
        assert v16.feats.dtype == jnp.bfloat16
        # identical binning (coords/ids/mask computed from fp32 points)
        np.testing.assert_array_equal(np.asarray(v16.ids), np.asarray(ref.ids))
        # features match the fp32-computed mean to bf16 resolution
        np.testing.assert_allclose(
            np.asarray(v16.feats, np.float32), np.asarray(ref.feats),
            rtol=8e-3, atol=8e-3)

    def test_out_dtype_default_follows_points(self):
        pts = rand_cloud(seed=9)
        mask = jnp.asarray(np.ones(len(pts), bool))
        v = voxelize(jnp.asarray(pts), mask, RANGE, VSIZE,
                     max_points=10, max_voxels=128)
        assert v.feats.dtype == jnp.float32


def sparse_from_dense(dense_mask, feats_fn, shape, cap=256):
    """Build a SparseTensor from a dense boolean occupancy + feature fn."""
    coords = np.argwhere(dense_mask)
    V = len(coords)
    feats = np.stack([feats_fn(c) for c in coords]).astype(np.float32)
    ids = ((coords[:, 0] * shape[1] + coords[:, 1]) * shape[2] + coords[:, 2])
    order = np.argsort(ids)
    coords, feats, ids = coords[order], feats[order], ids[order]
    pad = cap - V
    from streamingflow_tpu.ops.voxelize import LARGE_ID
    return S.SparseTensor(
        feats=jnp.asarray(np.pad(feats, ((0, pad), (0, 0)))),
        coords=jnp.asarray(np.pad(coords, ((0, pad), (0, 0))).astype(np.int32)),
        ids=jnp.asarray(np.pad(ids, (0, pad),
                               constant_values=LARGE_ID).astype(np.int32)),
        mask=jnp.asarray(np.arange(cap) < V), shape=shape)


def dense_conv3d_numpy(dense, weights, kernel, stride, padding,
                       active_in=None):
    """Naive dense 3-D conv; weights (K, Cin, Cout), tap order x-major."""
    nx, ny, nz, ci = dense.shape
    kx, ky, kz = kernel
    sx, sy, sz = stride
    px, py, pz = padding
    ox = (nx + 2 * px - kx) // sx + 1
    oy = (ny + 2 * py - ky) // sy + 1
    oz = (nz + 2 * pz - kz) // sz + 1
    out = np.zeros((ox, oy, oz, weights.shape[-1]), np.float32)
    padded = np.pad(dense, ((px, px), (py, py), (pz, pz), (0, 0)))
    for X in range(ox):
        for Y in range(oy):
            for Z in range(oz):
                acc = np.zeros(weights.shape[-1], np.float32)
                ki = 0
                for dx in range(kx):
                    for dy in range(ky):
                        for dz in range(kz):
                            v = padded[X * sx + dx, Y * sy + dy, Z * sz + dz]
                            acc += v @ weights[ki]
                            ki += 1
                out[X, Y, Z] = acc
    return out


class TestSubmConv:
    def test_matches_dense_on_active_sites(self):
        rng = np.random.RandomState(0)
        shape = (6, 6, 4)
        occ = rng.rand(*shape) > 0.7
        st = sparse_from_dense(occ, lambda c: rng.randn(3), shape, cap=64)
        w = rng.randn(27, 3, 5).astype(np.float32)

        out = S.subm_conv3d(st, jnp.asarray(w))
        dense = np.zeros(shape + (3,), np.float32)
        cs = np.asarray(st.coords)[np.asarray(st.mask)]
        fs = np.asarray(st.feats)[np.asarray(st.mask)]
        for c, f in zip(cs, fs):
            dense[tuple(c)] = f
        ref = dense_conv3d_numpy(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        for c, f in zip(cs, np.asarray(out.feats)[np.asarray(out.mask)]):
            np.testing.assert_allclose(f, ref[tuple(c)], rtol=2e-2, atol=6e-2)


class TestSparseConv:
    @pytest.mark.parametrize('kernel,stride,padding', [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (1, 1, 0)),
        ((1, 1, 3), (1, 1, 2), (0, 0, 0)),
    ])
    def test_matches_dense(self, kernel, stride, padding):
        rng = np.random.RandomState(1)
        shape = (6, 6, 5)
        occ = rng.rand(*shape) > 0.6
        st = sparse_from_dense(occ, lambda c: rng.randn(3), shape, cap=256)
        kprod = kernel[0] * kernel[1] * kernel[2]
        w = rng.randn(kprod, 3, 4).astype(np.float32)

        out = S.sparse_conv3d(st, jnp.asarray(w), kernel, stride, padding,
                              cap=256)
        dense = np.zeros(shape + (3,), np.float32)
        cs = np.asarray(st.coords)[np.asarray(st.mask)]
        fs = np.asarray(st.feats)[np.asarray(st.mask)]
        for c, f in zip(cs, fs):
            dense[tuple(c)] = f
        ref = dense_conv3d_numpy(dense, w, kernel, stride, padding)

        out_mask = np.asarray(out.mask)
        out_coords = np.asarray(out.coords)[out_mask]
        out_feats = np.asarray(out.feats)[out_mask]
        for c, f in zip(out_coords, out_feats):
            np.testing.assert_allclose(f, ref[tuple(c)], rtol=2e-2, atol=6e-2)

    def test_output_sites_cover_all_contributions(self):
        """Every dense output position with nonzero receptive-field input
        must appear in the sparse active set (spconv semantics)."""
        rng = np.random.RandomState(2)
        shape = (6, 6, 5)
        occ = rng.rand(*shape) > 0.8
        st = sparse_from_dense(occ, lambda c: np.ones(2), shape, cap=256)
        w = np.ones((27, 2, 1), np.float32)
        out = S.sparse_conv3d(st, jnp.asarray(w), (3, 3, 3), (2, 2, 2),
                              (1, 1, 1), cap=256)
        dense = np.zeros(shape + (2,), np.float32)
        for c in np.asarray(st.coords)[np.asarray(st.mask)]:
            dense[tuple(c)] = 1.0
        ref = dense_conv3d_numpy(dense, w, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        nonzero = set(map(tuple, np.argwhere(ref[..., 0] != 0)))
        active = set(map(tuple, np.asarray(out.coords)[np.asarray(out.mask)]))
        assert nonzero <= active


class TestDense:
    def test_to_dense_roundtrip(self):
        rng = np.random.RandomState(3)
        shape = (4, 4, 3)
        occ = rng.rand(*shape) > 0.5
        st = sparse_from_dense(occ, lambda c: rng.randn(2), shape, cap=64)
        d = np.asarray(S.to_dense(st))
        for c, f in zip(np.asarray(st.coords)[np.asarray(st.mask)],
                        np.asarray(st.feats)[np.asarray(st.mask)]):
            np.testing.assert_allclose(d[tuple(c)], f, atol=1e-6)
        assert d[~occ].sum() == 0
