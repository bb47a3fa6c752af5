"""Pallas one-hot-matmul binning kernel vs XLA segment-sum.

The kernel (ops/pallas_bin.py) replaces scatter-add for point binning —
the TPU re-design of the reference CUDA scatter ops (bev_pool_cuda.cu,
voxelization_cuda.cu).  On the CPU test mesh it runs in interpreter mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingflow_tpu.ops.pallas_bin import BINS_PER_TILE, bin_sum

RNG = np.random.default_rng(0)


def _ref(data, ids, n_bins):
    return jax.ops.segment_sum(jnp.asarray(data),
                               jnp.clip(jnp.asarray(ids), 0, n_bins - 1),
                               num_segments=n_bins)


@pytest.mark.parametrize('n_bins', [100, BINS_PER_TILE, 3 * BINS_PER_TILE + 7])
def test_interpret_matches_segment_sum(n_bins):
    p, c = 2000, 7
    ids = RNG.integers(0, n_bins, p).astype(np.int32)
    data = RNG.normal(size=(p, c)).astype(np.float32)
    got = bin_sum(jnp.asarray(data), jnp.asarray(ids), n_bins,
                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(data, ids,
                                                                n_bins)),
                               rtol=1e-5, atol=1e-4)


def test_empty_and_single_bin_tiles():
    """Tiles with zero points must emit zero rows."""
    n_bins = 2 * BINS_PER_TILE
    ids = np.full(64, 5, np.int32)          # everything in one bin
    data = np.ones((64, 3), np.float32)
    got = np.asarray(bin_sum(jnp.asarray(data), jnp.asarray(ids), n_bins,
                             interpret=True))
    assert got[5].tolist() == [64.0, 64.0, 64.0]
    assert np.abs(np.delete(got, 5, axis=0)).sum() == 0.0


def test_out_of_range_ids_clip():
    n_bins = 128
    ids = np.array([-5, 0, 127, 500], np.int32)
    data = np.ones((4, 2), np.float32)
    got = np.asarray(bin_sum(jnp.asarray(data), jnp.asarray(ids), n_bins,
                             interpret=True))
    assert got[0, 0] == 2.0      # -5 clips to 0, plus the genuine 0
    assert got[127, 0] == 2.0    # 500 clips to 127


def test_finalize_epilogue_and_dtype():
    def fin(acc):                 # (C, bins) -> (C+1, bins)
        return jnp.concatenate([acc * 2.0, acc[:1] + 1.0], axis=0)

    p, c, n_bins = 500, 4, 1000
    ids = RNG.integers(0, n_bins, p).astype(np.int32)
    data = RNG.normal(size=(p, c)).astype(np.float32)
    got = bin_sum(jnp.asarray(data), jnp.asarray(ids), n_bins,
                  finalize=fin, out_dtype=jnp.bfloat16, interpret=True)
    assert got.shape == (n_bins, c + 1)
    assert got.dtype == jnp.bfloat16
    ref = np.asarray(_ref(data, ids, n_bins))
    np.testing.assert_allclose(np.asarray(got[:, :c]).astype(np.float32),
                               ref * 2.0, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got[:, c]).astype(np.float32),
                               ref[:, 0] + 1.0, rtol=2e-2, atol=2e-2)


def test_fallback_path_matches():
    """The XLA fallback (CPU default) equals the interpreted kernel."""
    p, c, n_bins = 800, 5, 4096
    ids = RNG.integers(0, n_bins, p).astype(np.int32)
    data = RNG.normal(size=(p, c)).astype(np.float32)
    fb = bin_sum(jnp.asarray(data), jnp.asarray(ids), n_bins)  # CPU fallback
    ip = bin_sum(jnp.asarray(data), jnp.asarray(ids), n_bins, interpret=True)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(ip), rtol=1e-5,
                               atol=1e-4)


def test_pillarize_uses_bin_sum_consistently():
    """pillarize output equals a hand-computed reference on tiny input."""
    from streamingflow_tpu.models.pillar_encoder import pillarize

    pts = np.array([[0.5, 0.5, 0.1, 7.0, 0.0],
                    [0.4, 0.6, 0.3, 9.0, 0.0],
                    [2.5, 2.5, 1.0, 1.0, 0.0]], np.float32)
    out = np.asarray(pillarize(jnp.asarray(pts), jnp.ones(3, bool),
                               [0, 0, -4, 4, 4, 4], [1.0, 1.0, 8.0],
                               n_z_bins=4))
    assert out.shape == (4, 4, 1 + 5 + 1 + 4)
    cell = out[0, 0]
    np.testing.assert_allclose(cell[0], np.log1p(2.0), rtol=1e-5)
    np.testing.assert_allclose(cell[1:6],
                               pts[:2, :5].mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cell[6], np.std(pts[:2, 2]), rtol=1e-4)
    assert out[2, 2, 0] > 0          # third point's pillar occupied
    assert np.abs(out[1, 1]).sum() == 0.0


def test_presorted_matches_sorted_path():
    """Tile-grouped input + presorted=True equals the sorting path."""
    from streamingflow_tpu import native

    n_bins = 3 * BINS_PER_TILE
    p, c = 1500, 6
    ids = RNG.integers(0, n_bins, p).astype(np.int32)
    data = RNG.normal(size=(p, c)).astype(np.float32)
    # group rows by tile on the host (order within tile arbitrary)
    order = np.argsort(ids // BINS_PER_TILE, kind='stable')
    got = bin_sum(jnp.asarray(data[order]), jnp.asarray(ids[order]), n_bins,
                  presorted=True, interpret=True)
    ref = bin_sum(jnp.asarray(data), jnp.asarray(ids), n_bins, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-4)
