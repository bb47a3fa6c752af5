"""Native C++ point-cloud engine vs numpy references and the XLA voxelizer.

The native library is the rebuild of the reference's CPU voxel extensions
(mmdet3d/ops/voxel/src/voxelization_cpu.cpp, scatter_points_cpu.cpp) and the
multisweep transform loops (utils/data_classes.py:454-600)."""
import numpy as np
import pytest

from streamingflow_tpu import native

RNG = np.random.default_rng(0)


def _random_pose():
    a, b, c = RNG.uniform(-np.pi, np.pi, 3)

    def rz(t):
        return np.array([[np.cos(t), -np.sin(t), 0],
                         [np.sin(t), np.cos(t), 0], [0, 0, 1.0]])

    m = np.eye(4)
    m[:3, :3] = rz(a) @ rz(b).T @ rz(c)
    m[:3, 3] = RNG.normal(size=3)
    return m


def test_native_builds():
    assert native.available(), 'g++ is in the image; the engine must build'


def test_transform_points_matches_numpy():
    pts = RNG.normal(size=(1000, 5)).astype(np.float32)
    tm = _random_pose()
    expected = pts.copy()
    xyz1 = np.concatenate([expected[:, :3], np.ones((1000, 1), np.float32)], 1)
    expected[:, :3] = (xyz1 @ tm.T)[:, :3]
    got = native.transform_points(pts.copy(), tm)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_sweep_transform_filters_stamps_and_transforms():
    pts = RNG.normal(size=(500, 4)).astype(np.float32) * 3.0
    tm = _random_pose()
    out = native.sweep_transform(pts, tm, min_dist=1.0, time_lag=0.35,
                                 out_channels=5, time_col=4)
    keep = np.linalg.norm(pts[:, :2], axis=1) >= 1.0
    assert out.shape == (keep.sum(), 5)
    kept = pts[keep]
    xyz1 = np.concatenate([kept[:, :3], np.ones((len(kept), 1), np.float32)], 1)
    np.testing.assert_allclose(out[:, :3], (xyz1 @ tm.T)[:, :3].astype(
        np.float32), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, 3], kept[:, 3])       # intensity kept
    assert np.all(out[:, 4] == np.float32(0.35))            # time stamped


def test_sweep_transform_native_matches_fallback(monkeypatch):
    pts = RNG.normal(size=(300, 4)).astype(np.float32) * 2.0
    tm = _random_pose()
    got = native.sweep_transform(pts, tm, 1.0, 0.2, out_channels=5,
                                 time_col=4)
    monkeypatch.setattr(native, '_LIB', None)
    monkeypatch.setattr(native, '_TRIED', True)
    ref = native.sweep_transform(pts, tm, 1.0, 0.2, out_channels=5,
                                 time_col=4)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('max_points,max_voxels', [(5, 64), (2, 8)])
def test_hard_voxelize_first_come(max_points, max_voxels):
    pts = RNG.uniform(-4, 4, size=(400, 4)).astype(np.float32)
    rng6 = [-4, -4, -4, 4, 4, 4]
    vsz = [1.0, 1.0, 1.0]
    vox, coords, counts = native.hard_voxelize(pts, rng6, vsz, max_points,
                                               max_voxels)
    assert len(vox) <= max_voxels
    assert (counts <= max_points).all()
    # first-come: voxel 0 is the first point's voxel, holding that point first
    first_coord = np.floor((pts[0, :3] + 4.0) / 1.0).astype(np.int32)
    np.testing.assert_array_equal(coords[0], first_coord)
    np.testing.assert_allclose(vox[0, 0], pts[0])
    # per-voxel points actually fall in the voxel
    for v in range(len(vox)):
        for k in range(counts[v]):
            c = np.floor((vox[v, k, :3] + 4.0)).astype(np.int32)
            np.testing.assert_array_equal(c, coords[v])


def test_hard_voxelize_native_matches_fallback(monkeypatch):
    pts = RNG.uniform(-4, 4, size=(300, 4)).astype(np.float32)
    rng6 = [-4, -4, -4, 4, 4, 4]
    args = (rng6, [0.5, 0.5, 0.5], 3, 128)
    vox, coords, counts = native.hard_voxelize(pts, *args)
    monkeypatch.setattr(native, '_LIB', None)
    monkeypatch.setattr(native, '_TRIED', True)
    vox2, coords2, counts2 = native.hard_voxelize(pts, *args)
    np.testing.assert_array_equal(coords, coords2)
    np.testing.assert_array_equal(counts, counts2)
    np.testing.assert_allclose(vox, vox2)


def test_dynamic_scatter_mean_and_max():
    pts = np.array([[0.5, 0.5, 0.5, 1.0],
                    [0.6, 0.4, 0.5, 3.0],
                    [2.5, 0.5, 0.5, 7.0]], np.float32)
    rng6 = [0, 0, 0, 4, 4, 4]
    red, coords, counts = native.dynamic_scatter(pts, rng6, [1, 1, 1], 'mean')
    assert len(red) == 2
    np.testing.assert_array_equal(counts, [2, 1])
    np.testing.assert_allclose(red[0, 3], 2.0)
    np.testing.assert_allclose(red[1, 3], 7.0)
    red_m, _, _ = native.dynamic_scatter(pts, rng6, [1, 1, 1], 'max')
    np.testing.assert_allclose(red_m[0, 3], 3.0)


def test_group_pad():
    pts = RNG.normal(size=(50, 5)).astype(np.float32)
    grp = (np.arange(50) % 3).astype(np.int32)
    dst, lens = native.group_pad(pts, grp, n_groups=3, cap=10)
    assert dst.shape == (3, 10, 5)
    np.testing.assert_array_equal(lens, [10, 10, 10])  # capped at 10
    np.testing.assert_allclose(dst[1, 0], pts[1])
    # zero padding beyond cap is zeros (dropped points)
    dst2, lens2 = native.group_pad(pts[:9], grp[:9], n_groups=3, cap=10)
    np.testing.assert_array_equal(lens2, [3, 3, 3])
    assert (dst2[:, 3:] == 0).all()


def test_voxelize_agrees_with_xla_voxelizer():
    """The native first-come hard voxelizer and the XLA sort-based one must
    agree on (voxel set, per-voxel mean) when no caps bind."""
    import jax.numpy as jnp

    from streamingflow_tpu.ops.voxelize import voxelize

    pts = RNG.uniform(-3.9, 3.9, size=(200, 5)).astype(np.float32)
    rng6 = [-4, -4, -4, 4, 4, 4]
    vsz = [1.0, 1.0, 1.0]
    red, coords, counts = native.dynamic_scatter(pts, rng6, vsz, 'mean')

    vs = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), rng6, vsz,
                  max_points=256, max_voxels=512)
    n_valid = int(vs.mask.sum())
    assert n_valid == len(red)
    # XLA voxels are sorted by linearised id; sort the native ones to match
    lin = (coords[:, 0] * 8 + coords[:, 1]) * 8 + coords[:, 2]
    order = np.argsort(lin, kind='stable')
    np.testing.assert_array_equal(np.asarray(vs.coords)[:n_valid],
                                  coords[order])
    np.testing.assert_allclose(np.asarray(vs.feats)[:n_valid], red[order],
                               rtol=1e-5, atol=1e-5)


def test_tile_sort_points_groups_by_tile():
    from streamingflow_tpu.ops.pallas_bin import BINS_PER_TILE
    rng6 = [-4, -4, -4, 4, 4, 4]
    vsz = [0.5, 0.5, 8.0]
    nx = ny = 16
    pts = RNG.uniform(-5, 5, size=(300, 5)).astype(np.float32)  # some OOR
    out = native.tile_sort_points(pts.copy(), 300, rng6, vsz, BINS_PER_TILE)
    # same multiset of rows
    np.testing.assert_allclose(
        np.sort(out.view('f4').reshape(-1, 5), axis=0),
        np.sort(pts, axis=0))
    cx = np.floor((out[:, 0] + 4) / 0.5).astype(np.int64)
    cy = np.floor((out[:, 1] + 4) / 0.5).astype(np.int64)
    ok = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
          & (out[:, 2] >= -4) & (out[:, 2] < 4))
    n_tiles = (nx * ny + 1 + BINS_PER_TILE - 1) // BINS_PER_TILE
    tile = np.where(ok, (cx * ny + cy) // BINS_PER_TILE, n_tiles - 1)
    assert (np.diff(tile) >= 0).all(), 'tiles must be nondecreasing'


def test_tile_sort_native_matches_fallback(monkeypatch):
    from streamingflow_tpu.ops.pallas_bin import BINS_PER_TILE
    rng6 = [-4, -4, -4, 4, 4, 4]
    vsz = [0.125, 0.125, 8.0]
    pts = RNG.uniform(-5, 5, size=(200, 5)).astype(np.float32)
    a = native.tile_sort_points(pts.copy(), 200, rng6, vsz, 32)
    monkeypatch.setattr(native, '_LIB', None)
    monkeypatch.setattr(native, '_TRIED', True)
    b = native.tile_sort_points(pts.copy(), 200, rng6, vsz, 32)
    # same per-tile membership (within-tile order may differ)
    nx = ny = 64
    def tiles(arr):
        cx = np.floor((arr[:, 0] + 4) / 0.125).astype(np.int64)
        cy = np.floor((arr[:, 1] + 4) / 0.125).astype(np.int64)
        ok = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
              & (arr[:, 2] >= -4) & (arr[:, 2] < 4))
        nt = (nx * ny + 1 + 31) // 32
        return np.where(ok, (cx * ny + cy) // 32, nt - 1)
    np.testing.assert_array_equal(tiles(a), tiles(b))
    for t in np.unique(tiles(a)):
        np.testing.assert_allclose(
            np.sort(a[tiles(a) == t], axis=0), np.sort(b[tiles(b) == t], axis=0))
