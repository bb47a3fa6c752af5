"""Column-sparse backend vs the gather-GEMM engine (exact parity).

The column engine (ops/sparse_columns.py) must reproduce the gather
engine's semantics up to summation order: same active sites,
contributions only from active sites, identical strided active-set
generation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streamingflow_tpu.ops import sparse as S
from streamingflow_tpu.ops import sparse_columns as SC
from streamingflow_tpu.ops.voxelize import LARGE_ID


def _make_set(rng, shape, V, cap, column_heavy=False):
    n_bins = shape[0] * shape[1] * shape[2]
    if column_heavy:
        # many z per column (realistic LiDAR-ish vertical structure)
        ncols = max(V // 4, 1)
        cx = rng.integers(0, shape[0], ncols)
        cy = rng.integers(0, shape[1], ncols)
        reps = rng.integers(1, min(8, shape[2]) + 1, ncols)
        xs, ys, zs = [], [], []
        for i in range(ncols):
            z = rng.choice(shape[2], size=reps[i], replace=False)
            xs += [cx[i]] * reps[i]
            ys += [cy[i]] * reps[i]
            zs += list(z)
        ids = ((np.asarray(xs) * shape[1] + np.asarray(ys)) * shape[2]
               + np.asarray(zs))
        ids = np.unique(ids).astype(np.int32)[:V]
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


def _to_columns(st, cap_cols):
    return SC.from_sites(st.feats, st.ids, st.mask, st.shape, cap_cols)


@pytest.mark.parametrize('column_heavy', [False, True])
@pytest.mark.parametrize('formulation', ['sep', 'banded', 'conv'])
def test_subm_conv_matches_gather_engine(column_heavy, formulation):
    rng = np.random.default_rng(7)
    shape = (16, 12, 9)
    st = _make_set(rng, shape, 300, 512, column_heavy=column_heavy)
    w = jnp.asarray(rng.normal(size=(27, 8, 12)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    ref = S.subm_conv3d(st, w, bias=b).feats

    cs = _to_columns(st, cap_cols=256)
    cmap = SC.build_column_map(cs, shape[:2])
    out = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w, bias=b,
                               formulation=formulation)
    got = SC.to_sites(cs._replace(feats=out), st.ids, st.mask,
                      shape[2], 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('column_heavy', [False, True])
@pytest.mark.parametrize('block,window,resid', [
    (16, 64, 4),    # wide window: no overflow, residual path idle
    (16, 8, 64),    # tight window: heavy overflow, residual path exact
])
def test_subm_win_matches_gather_engine(column_heavy, block, window, resid):
    """'win' formulation (block-contiguous window slices + one-hot MXU
    selection + whole-block residual) == gather engine, both when the
    windows cover everything and when overflow forces the residual."""
    rng = np.random.default_rng(11)
    shape = (16, 12, 9)
    st = _make_set(rng, shape, 300, 512, column_heavy=column_heavy)
    w = jnp.asarray(rng.normal(size=(27, 8, 12)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    ref = S.subm_conv3d(st, w, bias=b).feats

    cs = _to_columns(st, cap_cols=256)
    cmap = SC.build_column_map(cs, shape[:2])
    plan = SC.build_window_plan(cmap, cs.col_mask, block=block,
                                window=window, resid_blocks=resid)
    assert int(plan.n_dropped) == 0
    out = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w, bias=b,
                               formulation='win', plan=plan, window=window)
    got = SC.to_sites(cs._replace(feats=out), st.ids, st.mask, shape[2], 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_win_overflow_beyond_residual_cap_drops_and_counts():
    """When more blocks overflow than WINDOW_RESID_BLOCKS can absorb, the
    surplus side-tap contributions drop and are counted (static-cap
    semantics) — never silently wrong values elsewhere."""
    rng = np.random.default_rng(3)
    shape = (16, 12, 9)
    st = _make_set(rng, shape, 300, 512)
    w = jnp.asarray(rng.normal(size=(27, 8, 12)).astype(np.float32)) * 0.3
    cs = _to_columns(st, cap_cols=256)
    cmap = SC.build_column_map(cs, shape[:2])
    # window=4 with resid_blocks=1: most blocks overflow, only one is saved
    plan = SC.build_window_plan(cmap, cs.col_mask, block=16, window=4,
                                resid_blocks=1)
    assert int(plan.n_dropped) > 0
    out = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w,
                               formulation='win', plan=plan, window=4)
    full = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w,
                                formulation='sep')
    # the saved residual block and the dy=0 taps are exact; dropped taps
    # only ever REMOVE side contributions (no corruption): verify the
    # self+slice part by zeroing side weights
    w_self = jnp.asarray(np.concatenate([
        np.zeros((9, 8, 12), np.float32),
        np.asarray(w)[9:18],
        np.zeros((9, 8, 12), np.float32)]))
    base = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w_self,
                                formulation='sep')
    # every row of `out` lies "between" base (all sides dropped) and full
    # in the sense of being base + a subset of side contributions; check
    # at least that out == full wherever no tap of the row overflowed
    nb = plan.starts.shape[1]
    blk_resid = np.zeros((nb * 16,), bool)
    rr = np.asarray(plan.rrows)[np.asarray(plan.rmask)]
    blk_resid[rr] = True
    found6 = np.asarray(jnp.stack(
        [cmap.found[k] for k in (0, 1, 2, 6, 7, 8)]))
    rel = np.asarray(plan.rel)[:, :256]
    tap_ok = ~found6 | (rel >= 0) | blk_resid[None, :256]
    exact_rows = tap_ok.all(0)
    assert exact_rows.any()
    np.testing.assert_allclose(np.asarray(out)[exact_rows],
                               np.asarray(full)[exact_rows],
                               rtol=2e-5, atol=2e-5)
    assert np.asarray(base).shape == np.asarray(out).shape


def test_sep_corner_without_face_column():
    """Diagonal neighbour columns with the face column between them
    unoccupied: the separable formulation must still carry the corner
    taps (a two-pass y-aggregate would silently drop them)."""
    shape = (8, 8, 4)
    # sites at (3,3,z) and (4,4,z) — columns are corner-adjacent, and the
    # face columns (3,4)/(4,3) are empty
    ids = np.array([(3 * 8 + 3) * 4 + 1, (4 * 8 + 4) * 4 + 1], np.int32)
    cap = 8
    pad = cap - 2
    feats = np.zeros((cap, 4), np.float32)
    feats[0, 0] = 1.0
    feats[1, 1] = 1.0
    idp = np.concatenate([ids, np.full(pad, LARGE_ID, np.int32)])
    mask = np.concatenate([np.ones(2, bool), np.zeros(pad, bool)])
    cz = idp % 4
    cy = (idp // 4) % 8
    cx = idp // 32
    coords = np.stack([cx, cy, cz], -1)
    coords[~mask] = 0
    st = S.SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(idp), jnp.asarray(mask), shape)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))
    ref = S.subm_conv3d(st, w).feats
    # corner tap must matter: sites differ from the self-tap-only result
    self_only = np.asarray(st.feats)[0] @ np.asarray(w)[13]
    assert np.abs(np.asarray(ref)[0] - self_only).max() > 1e-3

    cs = _to_columns(st, cap_cols=8)
    cmap = SC.build_column_map(cs, shape[:2])
    got = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w,
                               formulation='sep')
    got_rows = SC.to_sites(cs._replace(feats=got), st.ids, st.mask, 4, 4)
    np.testing.assert_allclose(np.asarray(got_rows), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_column_roundtrip_and_zmask():
    rng = np.random.default_rng(11)
    shape = (12, 12, 7)
    st = _make_set(rng, shape, 150, 256, column_heavy=True)
    cs = _to_columns(st, cap_cols=128)
    back = SC.to_sites(cs, st.ids, st.mask, shape[2], 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(st.feats))
    assert int(cs.zmask.sum()) == int(st.mask.sum())
    assert int(SC.dropped_sites(cs, st.mask)) == 0
    ci = np.asarray(cs.col_ids)
    cm = np.asarray(cs.col_mask)
    assert (np.diff(ci[cm]) > 0).all()


def test_column_cap_overflow_drops_highest():
    rng = np.random.default_rng(5)
    shape = (16, 8, 4)
    st = _make_set(rng, shape, 100, 128)
    full = _to_columns(st, cap_cols=128)
    n_cols = int(full.col_mask.sum())
    assert n_cols > 2
    small = _to_columns(st, cap_cols=n_cols - 1)
    kept = np.asarray(small.col_ids)[np.asarray(small.col_mask)]
    dropped = np.asarray(full.col_ids)[n_cols - 1]
    assert dropped not in kept
    assert int(SC.dropped_sites(small, st.mask)) > 0


@pytest.mark.parametrize('kernel,stride,padding', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # down1/down2
    ((3, 3, 3), (2, 2, 2), (1, 1, 0)),   # down3 (z pad 0)
    ((1, 1, 3), (1, 1, 2), (0, 0, 0)),   # conv_out
])
@pytest.mark.parametrize('formulation', ['banded', 'conv'])
def test_strided_conv_matches_gather_engine(kernel, stride, padding,
                                            formulation):
    """Same active output SITES (ids + zmask) and same values as
    sparse_conv3d, including output columns whose only contributors live
    in neighbouring input columns."""
    rng = np.random.default_rng(13)
    shape = (16, 12, 9)
    st = _make_set(rng, shape, 350, 512, column_heavy=True)
    kprod = kernel[0] * kernel[1] * kernel[2]
    w = jnp.asarray(rng.normal(size=(kprod, 8, 12)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    ref = S.sparse_conv3d(st, w, kernel, stride, padding, cap=512, bias=b)

    cs = _to_columns(st, cap_cols=256)
    out_cs, out_shape = SC.sparse_conv_columns(
        cs, w, kernel, stride, padding, shape, cap=256, bias=b,
        formulation=formulation)
    assert out_shape == ref.shape

    # active-site sets agree exactly
    ref_ids = np.asarray(ref.ids)[np.asarray(ref.mask)]
    got_cols = np.asarray(out_cs.col_ids)
    got_zm = np.asarray(out_cs.zmask)
    got_ids = []
    for ci, zrow, ok in zip(got_cols, got_zm, np.asarray(out_cs.col_mask)):
        if ok:
            for z in np.nonzero(zrow)[0]:
                got_ids.append(ci * out_shape[2] + z)
    np.testing.assert_array_equal(np.sort(got_ids), np.sort(ref_ids))

    got = SC.to_sites(out_cs, ref.ids, ref.mask, out_shape[2], 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.feats),
                               rtol=2e-5, atol=2e-5)


def test_formulations_agree_under_jit():
    rng = np.random.default_rng(3)
    shape = (12, 12, 11)   # odd z (41-like)
    st = _make_set(rng, shape, 200, 256, column_heavy=True)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32)) * 0.3
    cs = _to_columns(st, cap_cols=128)
    cmap = SC.build_column_map(cs, shape[:2])

    @jax.jit
    def run(f):
        a = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w,
                                 formulation='banded')
        b = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w,
                                 formulation='conv')
        return a, b

    a, b = run(cs.feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_batched_vmap_matches_per_cloud():
    rng = np.random.default_rng(9)
    shape = (12, 12, 5)
    sts = [_make_set(rng, shape, 80, 128) for _ in range(3)]
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32)) * 0.3

    def one(feats, ids, mask):
        cs = SC.from_sites(feats, ids, mask, shape, 64)
        cmap = SC.build_column_map(cs, shape[:2])
        return SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w)

    batched = jax.vmap(one)(
        jnp.stack([s.feats for s in sts]),
        jnp.stack([s.ids for s in sts]),
        jnp.stack([s.mask for s in sts]))
    for i, s in enumerate(sts):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(one(s.feats, s.ids, s.mask)),
            rtol=1e-6, atol=1e-6)


def test_win_formulation_ladder_matches_sep():
    """Z_FORMULATION='win' must reproduce the 'sep' ladder with the SAME
    parameter tree (the formulation is an execution detail, not a model
    change — checkpoint/engine portability)."""
    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    cfg = tiny_config()
    cfg.MODEL.MODALITY.USE_LIDAR = True
    se = cfg.MODEL.SPARSE_ENCODER
    se.ENGINE = 'column'
    se.DENSE_TAIL_FROM_STAGE = 0
    # CPU-sized geometry (flagship caps make the one-hot select einsum
    # minutes-slow on the test CPU); windows sized to exercise BOTH the
    # windowed path and the whole-block residual fallback
    se.COLUMN_CAPS = [512, 512, 512, 512]
    se.WINDOW_BLOCK = 32
    se.WINDOW_WIDTH = 48
    se.WINDOW_RESID_BLOCKS = 8
    batch = make_batch(cfg, batch_size=1, n_points=512)
    pts = jnp.asarray(batch['points'])[:, :1]

    cfg.MODEL.SPARSE_ENCODER.Z_FORMULATION = 'sep'
    v = LidarBEVEncoder(cfg.MODEL.SPARSE_ENCODER).init(
        {'params': jax.random.PRNGKey(0)}, pts)
    ref = LidarBEVEncoder(cfg.MODEL.SPARSE_ENCODER).apply(v, pts)

    cfg.MODEL.SPARSE_ENCODER.Z_FORMULATION = 'win'
    got = LidarBEVEncoder(cfg.MODEL.SPARSE_ENCODER).apply(v, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dense_tail_matches_pure_column_ladder():
    """DENSE_TAIL_FROM_STAGE k: the dense-grid tail (conv3d over every
    cell + masked BN) must reproduce the pure column ladder bit-for-bit
    up to conv summation order, WITH THE SAME PARAMETER TREE (init under
    one setting, apply under all — checkpoint/engine portability)."""
    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    cfg = tiny_config()
    cfg.MODEL.MODALITY.USE_LIDAR = True
    cfg.MODEL.SPARSE_ENCODER.ENGINE = 'column'
    batch = make_batch(cfg, batch_size=1, n_points=512)
    pts = jnp.asarray(batch['points'])[:, :1]

    cfg.MODEL.SPARSE_ENCODER.DENSE_TAIL_FROM_STAGE = 0
    v = LidarBEVEncoder(cfg.MODEL.SPARSE_ENCODER).init(
        {'params': jax.random.PRNGKey(0)}, pts)

    outs, stats = {}, {}
    for k in (0, 2, 3, 4, 5):
        cfg.MODEL.SPARSE_ENCODER.DENSE_TAIL_FROM_STAGE = k
        enc = LidarBEVEncoder(cfg.MODEL.SPARSE_ENCODER)
        outs[k] = enc.apply(v, pts)                       # same v: tree match
        _, stats[k] = enc.apply(v, pts, train=True, mutable=['batch_stats'])
    for k in (2, 3, 4, 5):
        d = np.abs(np.asarray(outs[k]) - np.asarray(outs[0]))
        assert d.max() < 5e-3, (k, d.max())
        assert (d > 1e-3).mean() < 1e-3, (k, (d > 1e-3).mean())
        for a, b in zip(jax.tree.leaves(stats[k]), jax.tree.leaves(stats[0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
