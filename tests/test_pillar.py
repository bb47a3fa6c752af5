"""Dense pillar LiDAR backbone tests (models/pillar_encoder.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.models.pillar_encoder import (PillarBEVEncoder,
                                                     pillarize)

PC_RANGE = [-4.0, -4.0, -2.0, 4.0, 4.0, 2.0]
VOX = [0.5, 0.5, 4.0]


def test_pillarize_matches_naive():
    rng = np.random.RandomState(0)
    P = 256
    pts = rng.uniform(-5, 5, size=(P, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 3, size=P)
    mask = rng.rand(P) > 0.1

    out = np.asarray(pillarize(jnp.asarray(pts), jnp.asarray(mask),
                               PC_RANGE, VOX, n_z_bins=4))
    nx = ny = 16
    assert out.shape == (nx, ny, 1 + 5 + 1 + 4)

    # naive per-pillar check on a few pillars
    cx = np.floor((pts[:, 0] - PC_RANGE[0]) / VOX[0]).astype(int)
    cy = np.floor((pts[:, 1] - PC_RANGE[1]) / VOX[1]).astype(int)
    inb = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
           & (pts[:, 2] >= PC_RANGE[2]) & (pts[:, 2] < PC_RANGE[5]) & mask)
    for px, py in [(3, 4), (8, 8), (15, 0)]:
        sel = inb & (cx == px) & (cy == py)
        n = sel.sum()
        if n == 0:
            np.testing.assert_allclose(out[px, py], 0.0)
            continue
        np.testing.assert_allclose(out[px, py, 0], np.log1p(n), rtol=1e-5)
        np.testing.assert_allclose(out[px, py, 1:6], pts[sel].mean(0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out[px, py, 6], pts[sel, 2].max(),
                                   rtol=1e-4, atol=1e-5)


def test_pillarize_batch_matches_per_cloud():
    """pillarize_batch (one launch, per-cloud bin offsets) must equal the
    stacked per-cloud pillarize exactly — both layouts of the contract, and
    both presorted states (VERDICT r4 item 6).  The per-cloud bin offsets
    are tile-granular; a wrong offset shifts a whole cloud's pillars."""
    from streamingflow_tpu.models.pillar_encoder import pillarize_batch
    rng = np.random.RandomState(1)
    B, P = 3, 512
    pts = rng.uniform(-5, 5, size=(B, P, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-3, 3, size=(B, P))
    mask = rng.rand(B, P) > 0.15
    # cloud 2: empty — offsets must keep it from leaking into cloud 1
    mask[2] = False

    got = np.asarray(pillarize_batch(jnp.asarray(pts), jnp.asarray(mask),
                                     PC_RANGE, VOX, n_z_bins=4))
    want = np.stack([
        np.asarray(pillarize(jnp.asarray(pts[i]), jnp.asarray(mask[i]),
                             PC_RANGE, VOX, n_z_bins=4, layout='cf'))
        for i in range(B)])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pillarize_empty_cloud_is_zero():
    pts = jnp.zeros((64, 5))
    out = np.asarray(pillarize(pts, jnp.zeros(64, bool), PC_RANGE, VOX))
    assert (out == 0).all()


def test_encoder_shapes_and_grad():
    from streamingflow_tpu.data import tiny_config
    cfg = tiny_config().MODEL.SPARSE_ENCODER
    rng = np.random.RandomState(1)
    B, T, P = 1, 2, 512
    pts = rng.uniform(-6, 6, size=(B, T, P, 5)).astype(np.float32)
    enc = PillarBEVEncoder(cfg)
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    out = enc.apply(v, jnp.asarray(pts))
    nx = int(round((cfg.POINT_CLOUD_RANGE[3] - cfg.POINT_CLOUD_RANGE[0])
                   / cfg.VOXEL_SIZE[0]))
    assert out.shape == (B, T, nx // 8, nx // 8, 2 * cfg.OUTPUT_CHANNELS)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return enc.apply({'params': params,
                          'batch_stats': v['batch_stats']},
                         jnp.asarray(pts)).sum()
    g = jax.grad(loss)(v['params'])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_full_model_with_pillar_backbone():
    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.models import StreamingFlow
    from streamingflow_tpu.training.trainer import batch_to_model_args
    cfg = tiny_config()
    cfg.MODEL.MODALITY.USE_LIDAR = True
    cfg.MODEL.LIDAR.BACKBONE = 'pillar8x'
    # BEV grid must match the pillar output resolution (sparse shape / 8)
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(cfg, 1, n_points=512).items()}
    args = batch_to_model_args(batch, cfg)
    model = StreamingFlow(cfg)
    key = jax.random.PRNGKey(0)
    v = model.init({'params': key, 'dropout': key, 'sample': key}, **args)
    out = model.apply(v, **args, rngs={'sample': key})
    assert out['segmentation'].shape[0] == 1
    assert np.isfinite(np.asarray(out['segmentation'])).all()


def test_pillarize_cf_layout_matches_bev():
    # channel-first layout ('cf', the binning kernel's native output — used
    # by the encoder to skip the lane-wasting (., F) relayout) must be the
    # exact transpose of the default BEV layout
    rng = np.random.RandomState(1)
    P = 512
    pts = rng.uniform(-5, 5, size=(P, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 3, size=P)
    mask = rng.rand(P) > 0.1
    a = pillarize(jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOX,
                  n_z_bins=4)
    b = pillarize(jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOX,
                  n_z_bins=4, layout='cf')
    assert b.shape == (a.shape[2], a.shape[0], a.shape[1])
    np.testing.assert_array_equal(np.asarray(a),
                                  np.asarray(jnp.transpose(b, (1, 2, 0))))


def test_conv_backends_equivalent():
    """The taps lowering of the ladder convs (PILLAR_CONV_BACKEND='taps')
    must equal XLA's native conv on identical params — stride 1 and 2 —
    and produce the same param tree (Conv_0 paths)."""
    from streamingflow_tpu.models import pillar_encoder as PE

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 16, 16, 6).astype(np.float32))
    old = PE.PILLAR_CONV_BACKEND
    outs, trees = {}, {}
    try:
        for backend in ('xla', 'taps'):
            PE.PILLAR_CONV_BACKEND = backend
            for stride in (1, 2):
                m = PE.ConvBNReLU(8, stride=stride)
                v = m.init({'params': jax.random.PRNGKey(0)}, x)
                outs[backend, stride] = np.asarray(m.apply(v, x))
                trees[backend, stride] = jax.tree_util.tree_structure(v)
    finally:
        PE.PILLAR_CONV_BACKEND = old
    for stride in (1, 2):
        assert trees['xla', stride] == trees['taps', stride]
        np.testing.assert_allclose(outs['taps', stride], outs['xla', stride],
                                   rtol=1e-5, atol=1e-5)
