"""Tests for utils/tools.py, layers/srvp_vgg.py, training/logging.py."""
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_gen_dx_bx():
    from streamingflow_tpu.utils.tools import gen_dx_bx
    dx, bx, nx = gen_dx_bx([-50, 50, 0.5], [-50, 50, 0.5], [-10, 10, 20])
    np.testing.assert_allclose(dx, [0.5, 0.5, 20])
    np.testing.assert_allclose(bx, [-49.75, -49.75, 0.0])
    np.testing.assert_array_equal(nx, [200, 200, 1])


def test_cumsum_trick_matches_segment_sums():
    from streamingflow_tpu.utils.tools import cumsum_trick
    rng = np.random.RandomState(0)
    ranks = np.sort(rng.randint(0, 6, size=32)).astype(np.int32)
    x = rng.randn(32, 3).astype(np.float32)
    sums, kept = cumsum_trick(jnp.asarray(x), jnp.asarray(ranks))
    sums, kept = np.asarray(sums), np.asarray(kept)
    for r in np.unique(ranks):
        sel = ranks == r
        end = np.where(sel)[0][-1]
        assert kept[end]
        np.testing.assert_allclose(sums[end], x[sel].sum(0), rtol=1e-5,
                                   atol=1e-5)


def test_kalman_filter_tracks_line():
    from streamingflow_tpu.utils.tools import KalmanFilter
    kf = KalmanFilter(dt=0.5)
    obs = np.stack([np.arange(10) * 1.0, np.zeros(10)], axis=-1)
    states = kf.track(obs)
    assert states.shape == (10, 4)
    # converges toward the true position
    assert abs(states[-1, 0] - 9.0) < 0.5


def test_vgg64_roundtrip_shapes():
    from streamingflow_tpu.layers.srvp_vgg import VGG64Decoder, VGG64Encoder
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    enc = VGG64Encoder(nh=16, nf=8)
    v = enc.init(jax.random.PRNGKey(0), x, return_skip=True)
    z, skips = enc.apply(v, x, return_skip=True)
    assert z.shape == (2, 1, 1, 16)
    assert [s.shape[1] for s in skips] == [8, 16, 32, 64]

    dec = VGG64Decoder(nc=3, nf=8, skip=True)
    vd = dec.init(jax.random.PRNGKey(1), z, skip=skips)
    y = dec.apply(vd, z, skip=skips)
    assert y.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_metrics_logger_and_profiler(tmp_path):
    from streamingflow_tpu.training.logging import (MetricsLogger,
                                                    SimpleProfiler)
    log = MetricsLogger(str(tmp_path))
    log.scalar('loss', 1.5, 1)
    log.scalars({'a': 1.0, 'b': jnp.asarray(2.0)}, 2, prefix='s/')
    log.video('vid', np.zeros((2, 8, 8, 3), np.uint8), 1)
    log.flush()
    log.close()
    assert os.listdir(str(tmp_path))

    prof = SimpleProfiler()
    with prof.span('work'):
        pass
    assert 'work' in prof.summary()


def test_psum_metric_states_on_mesh():
    """Metric state arrays sum across the 8-device CPU mesh like the
    reference's dist_reduce_fx='sum' (metrics.py:32-35)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from streamingflow_tpu.parallel import make_mesh
    from streamingflow_tpu.parallel.collect import psum_metric_states

    mesh = make_mesh()
    n = len(mesh.devices)
    per_dev = jnp.asarray(np.arange(n * 4, dtype=np.float32).reshape(n, 4))
    out = psum_metric_states({'tp': per_dev}, mesh)
    expect = np.arange(n * 4, dtype=np.float32).reshape(n, 4).sum(0)
    np.testing.assert_allclose(np.asarray(out['tp'])[0], expect)


def test_combine_metrics_host_side():
    import numpy as np

    from streamingflow_tpu.parallel.collect import combine_metrics
    from streamingflow_tpu.training.metrics import IntersectionOverUnion

    a, b = IntersectionOverUnion(2), IntersectionOverUnion(2)
    a.update(np.array([1, 0]), np.array([1, 1]))
    b.update(np.array([1, 1]), np.array([1, 0]))
    ref = IntersectionOverUnion(2)
    ref.update(np.array([1, 0, 1, 1]), np.array([1, 1, 1, 0]))
    merged = combine_metrics([a, b])
    np.testing.assert_allclose(merged.compute(), ref.compute())
