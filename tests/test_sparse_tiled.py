"""Tiled sparse-conv backend vs the gather-GEMM engine (exact parity).

The tiled backend (ops/sparse_tiled.py) must reproduce the gather
engine's submanifold-conv semantics bit-for-bit up to summation order:
same active sites, contributions only from active sites."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streamingflow_tpu.ops import sparse as S
from streamingflow_tpu.ops import sparse_tiled as ST
from streamingflow_tpu.ops.voxelize import LARGE_ID


def _make_set(rng, shape, V, cap, cluster=False):
    n_bins = shape[0] * shape[1] * shape[2]
    if cluster:
        # sites packed around tile boundaries to stress the halo paths
        base = rng.integers(0, shape[0] // 8, V) * 8
        cx = np.clip(base + rng.integers(-2, 3, V), 0, shape[0] - 1)
        cy = np.clip(rng.integers(0, shape[1] // 8, V) * 8
                     + rng.integers(-2, 3, V), 0, shape[1] - 1)
        cz = rng.integers(0, shape[2], V)
        ids = (cx * shape[1] + cy) * shape[2] + cz
        ids = np.unique(ids).astype(np.int32)
    else:
        ids = np.unique(rng.choice(n_bins, size=V, replace=False)
                        ).astype(np.int32)
    v = len(ids)
    pad = cap - v
    cz = ids % shape[2]
    cy = (ids // shape[2]) % shape[1]
    cx = ids // (shape[2] * shape[1])
    coords = np.concatenate([np.stack([cx, cy, cz], -1),
                             np.zeros((pad, 3), np.int32)]).astype(np.int32)
    idp = np.concatenate([ids, np.full(pad, LARGE_ID, np.int32)])
    mask = np.concatenate([np.ones(v, bool), np.zeros(pad, bool)])
    feats = rng.normal(size=(cap, 8)).astype(np.float32)
    feats[~mask] = 0
    return S.SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                          jnp.asarray(idp), jnp.asarray(mask), shape)


@pytest.mark.parametrize('cluster', [False, True])
@pytest.mark.parametrize('tile', [(8, 8, 8), (8, 8, 4), (4, 4, 4)])
def test_subm_conv_matches_gather_engine(cluster, tile):
    rng = np.random.default_rng(7)
    shape = (32, 24, 16)
    st = _make_set(rng, shape, 500, 768, cluster=cluster)
    w = jnp.asarray(rng.normal(size=(27, 8, 12)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    ref = S.subm_conv3d(st, w, bias=b).feats
    tmap = ST.build_tile_map(st.coords, st.ids, st.mask, shape,
                             cap_tiles=1024, tile=tile)
    got = ST.subm_conv3d_tiled(st.feats, st.mask, tmap, w, bias=b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_subm_conv_tiled_under_jit_and_odd_grid():
    """Grid dims not divisible by the tile (z=41-like) and jit."""
    rng = np.random.default_rng(3)
    shape = (24, 24, 11)
    st = _make_set(rng, shape, 300, 512)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32)) * 0.3

    ref = S.subm_conv3d(st, w).feats

    @jax.jit
    def run():
        tmap = ST.build_tile_map(st.coords, st.ids, st.mask, shape,
                                 cap_tiles=128, tile=(8, 8, 8))
        return ST.subm_conv3d_tiled(st.feats, st.mask, tmap, w)

    np.testing.assert_allclose(np.asarray(run()), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_corner_neighbour_without_intermediate_tiles():
    """Two diagonal sites in corner-adjacent tiles, with every face
    neighbour tile unoccupied: the halo must carry the corner
    contribution directly (a staged/transitive face exchange loses it)."""
    shape = (16, 16, 16)
    coords = np.array([[7, 7, 7],     # tile (0,0,0), hi corner
                       [8, 8, 8]],    # tile (1,1,1), lo corner
                      np.int32)
    ids = (coords[:, 0] * 16 + coords[:, 1]) * 16 + coords[:, 2]
    cap = 8
    pad = cap - 2
    st = S.SparseTensor(
        jnp.asarray(np.concatenate([np.eye(2, 4, dtype=np.float32),
                                    np.zeros((pad, 4), np.float32)])),
        jnp.asarray(np.concatenate([coords, np.zeros((pad, 3), np.int32)])),
        jnp.asarray(np.concatenate([ids.astype(np.int32),
                                    np.full(pad, LARGE_ID, np.int32)])),
        jnp.asarray(np.concatenate([np.ones(2, bool), np.zeros(pad, bool)])),
        shape)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))
    ref = S.subm_conv3d(st, w).feats
    # the corner tap must contribute: outputs differ from the self-tap-only
    w_np = np.asarray(w)
    self_only_0 = np.asarray(st.feats)[0] @ w_np[13]
    assert np.abs(np.asarray(ref)[0] - self_only_0).max() > 1e-3
    tmap = ST.build_tile_map(st.coords, st.ids, st.mask, shape,
                             cap_tiles=8, tile=(8, 8, 8))
    got = ST.subm_conv3d_tiled(st.feats, st.mask, tmap, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tile_map_roundtrip_and_occupancy():
    rng = np.random.default_rng(11)
    shape = (16, 16, 8)
    st = _make_set(rng, shape, 120, 256)
    tmap = ST.build_tile_map(st.coords, st.ids, st.mask, shape,
                             cap_tiles=64, tile=(8, 8, 8))
    tiles = ST.to_tiles(st.feats, tmap, st.mask)
    back = ST.from_tiles(tiles, tmap, st.mask)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(st.feats))
    assert int(tmap.occupancy.sum()) == int(st.mask.sum())
    # tile ids ascending among valid
    ti = np.asarray(tmap.tile_ids)
    tm = np.asarray(tmap.tile_mask)
    assert (np.diff(ti[tm]) > 0).all()


def test_tile_cap_overflow_drops_highest_tiles():
    """Static-cap semantics: with too few tile slots, sites of the
    highest tile ids are dropped (zeros), lower tiles stay exact."""
    rng = np.random.default_rng(5)
    shape = (32, 8, 8)
    st = _make_set(rng, shape, 100, 128)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32)) * 0.3
    full = ST.build_tile_map(st.coords, st.ids, st.mask, shape, cap_tiles=32)
    n_tiles = int(full.tile_mask.sum())
    assert n_tiles > 2
    small = ST.build_tile_map(st.coords, st.ids, st.mask, shape,
                              cap_tiles=n_tiles - 1)
    kept_tile_ids = np.asarray(small.tile_ids)[np.asarray(small.tile_mask)]
    dropped_tile_id = np.asarray(full.tile_ids)[n_tiles - 1]
    assert dropped_tile_id not in kept_tile_ids
    assert int(ST.dropped_sites(full, st.mask)) == 0
    assert int(ST.dropped_sites(small, st.mask)) > 0
    got = ST.subm_conv3d_tiled(st.feats, st.mask, small, w)
    # sites belonging to a kept tile whose whole 1-neighbourhood is kept
    # must be exact; sites in the dropped tile read back zero
    tcoords = np.asarray(st.coords) // 8
    grid = ST._tile_grid(shape, (8, 8, 8))
    tid = (tcoords[:, 0] * grid[1] + tcoords[:, 1]) * grid[2] + tcoords[:, 2]
    in_dropped = (tid == dropped_tile_id) & np.asarray(st.mask)
    assert np.abs(np.asarray(got)[in_dropped]).max() == 0


@pytest.mark.parametrize('kernel,stride,padding', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # down1/down2
    ((3, 3, 3), (2, 2, 2), (1, 1, 0)),   # down3 (z pad 0)
    ((1, 1, 3), (1, 1, 2), (0, 0, 0)),   # conv_out
])
@pytest.mark.parametrize('tile', [(8, 8, 8), (8, 8, 4)])
def test_strided_conv_matches_gather_engine(kernel, stride, padding, tile):
    """sparse_conv_tiles == sparse_conv3d: same active sites by
    construction (shared site generation); values must agree even for
    output sites whose owning tile has no active input (contributors
    all in a neighbouring tile)."""
    rng = np.random.default_rng(13)
    shape = (32, 24, 16)
    st = _make_set(rng, shape, 600, 1024, cluster=True)
    kprod = kernel[0] * kernel[1] * kernel[2]
    w = jnp.asarray(rng.normal(size=(kprod, 8, 12)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    cap = 1024

    ref = S.sparse_conv3d(st, w, kernel, stride, padding, cap, bias=b)

    out_shape = tuple((shape[d] + 2 * padding[d] - kernel[d]) // stride[d] + 1
                      for d in range(3))
    (oi, oc, om), src = S.generate_output_sites(
        st, kernel, stride, padding, out_shape, cap, return_src=True)
    tmap = ST.build_tile_map(st.coords, st.ids, st.mask, shape,
                             cap_tiles=512, tile=tile)
    tiles = ST.to_tiles(st.feats, tmap, st.mask)
    got = ST.sparse_conv_tiles(tiles, tmap, st.coords, w, kernel, stride,
                               padding, oc, om, src, bias=b)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.feats),
                               rtol=2e-5, atol=2e-5)


def test_lidar_encoder_engines_agree():
    """Full spconv8x encoder: tiled and column engines == gather engine
    (same params, train and eval paths), including the stage-resident BN
    statistics."""
    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    cfg = tiny_config()
    cfg.MODEL.MODALITY.USE_LIDAR = True
    batch = make_batch(cfg, batch_size=1, n_points=512)
    pts = jnp.asarray(batch['points'])[:, :2]  # (B, T=2, P, 5)

    outs, stats = {}, {}
    for engine in ('gather', 'tiled', 'column'):
        cfg.MODEL.SPARSE_ENCODER.ENGINE = engine
        enc = LidarBEVEncoder(cfg.MODEL.SPARSE_ENCODER)
        v = enc.init({'params': jax.random.PRNGKey(0)}, pts)
        outs[engine] = enc.apply(v, pts)
        _, stats[engine] = enc.apply(v, pts, train=True,
                                     mutable=['batch_stats'])
    # JAX's default matmul/conv precision is bf16-like even on CPU
    # (eps ~8e-3), and the engines sum the 27 taps in different orders;
    # through 13 convs + BNs a few cancellation-prone elements reach
    # ~2e-3 absolute.  A real site-mapping bug corrupts whole C-channel
    # rows at O(0.1-1), so bound the max tightly enough to exclude that
    # and require the bulk to be numerically identical.
    for engine in ('tiled', 'column'):
        d = np.abs(np.asarray(outs[engine]) - np.asarray(outs['gather']))
        assert d.max() < 5e-3, (engine, d.max())
        assert (d > 1e-3).mean() < 1e-3, (engine, (d > 1e-3).mean())
        s_t = jax.tree.leaves(stats[engine])
        s_g = jax.tree.leaves(stats['gather'])
        for a, b in zip(s_t, s_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(os.environ.get('SF_FAST_TESTS') == '1',
                    reason='slow tier (~5 min compile); run without '
                           'SF_FAST_TESTS for the full suite')
def test_engine_gradients_agree():
    """Training correctness: param gradients through the tiled encoder
    match the gather engine (scatter/gather/concat transposes compose
    to the same chain rule)."""
    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    cfg = tiny_config()
    cfg.MODEL.MODALITY.USE_LIDAR = True
    batch = make_batch(cfg, batch_size=1, n_points=256)
    pts = jnp.asarray(batch['points'])[:, :1]

    grads = {}
    for engine in ('gather', 'tiled', 'column'):
        cfg.MODEL.SPARSE_ENCODER.ENGINE = engine
        enc = LidarBEVEncoder(cfg.MODEL.SPARSE_ENCODER)
        v = enc.init({'params': jax.random.PRNGKey(0)}, pts)

        def loss(p):
            out, _ = enc.apply({'params': p, 'batch_stats': v['batch_stats']},
                               pts, train=True, mutable=['batch_stats'])
            return jnp.sum(out * out)

        grads[engine] = jax.jit(jax.grad(loss))(v['params'])
    for engine in ('tiled', 'column'):
        leaves_t = jax.tree.leaves(grads[engine])
        leaves_g = jax.tree.leaves(grads['gather'])
        for a, b in zip(leaves_t, leaves_g):
            d = float(jnp.abs(a - b).max())
            n = float(jnp.abs(b).max()) + 1e-6
            assert d <= 2e-3 * n + 2e-4, (engine, d, n)


def test_batched_vmap_matches_per_cloud():
    rng = np.random.default_rng(9)
    shape = (16, 16, 8)
    sts = [_make_set(rng, shape, 100, 256) for _ in range(3)]
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32)) * 0.3

    def one(feats, coords, ids, mask):
        tmap = ST.build_tile_map(coords, ids, mask, shape, cap_tiles=64)
        return ST.subm_conv3d_tiled(feats, mask, tmap, w)

    batched = jax.vmap(one)(
        jnp.stack([s.feats for s in sts]),
        jnp.stack([s.coords for s in sts]),
        jnp.stack([s.ids for s in sts]),
        jnp.stack([s.mask for s in sts]))
    for i, s in enumerate(sts):
        np.testing.assert_allclose(
            np.asarray(batched[i]),
            np.asarray(one(s.feats, s.coords, s.ids, s.mask)),
            rtol=1e-6, atol=1e-6)
