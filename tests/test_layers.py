import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingflow_tpu.layers import (ASPP, BiGRU, Bottleblock, Bottleneck,
                                      Bottleneck3D, CausalConv3d, ConvBlock,
                                      ConvNet, ConvNeXtBlock, DeepLabHead,
                                      DualGRUCell, PyramidSpatioTemporalPooling,
                                      SmallDecoder, SmallEncoder, SpatialGRU,
                                      TemporalBlock, UpsamplingAdd,
                                      UpsamplingConcat)

KEY = jax.random.PRNGKey(0)


def init_apply(module, *args, **kwargs):
    variables = module.init({'params': KEY, 'dropout': KEY}, *args, **kwargs)
    return module.apply(variables, *args, **kwargs)


class TestConvBlocks:
    def test_conv_block(self):
        out = init_apply(ConvBlock(8), jnp.ones((2, 16, 16, 4)))
        assert out.shape == (2, 16, 16, 8)

    def test_bottleneck_identity_channels(self):
        out = init_apply(Bottleneck(), jnp.ones((1, 16, 16, 8)))
        assert out.shape == (1, 16, 16, 8)

    def test_bottleneck_down_up(self):
        x = jnp.ones((1, 16, 16, 8))
        assert init_apply(Bottleneck(16, downsample=True), x).shape == (1, 8, 8, 16)
        assert init_apply(Bottleneck(4, upsample=True), x).shape == (1, 32, 32, 4)

    def test_upsampling_concat(self):
        up = jnp.ones((1, 8, 8, 16))
        skip = jnp.ones((1, 16, 16, 8))
        out = init_apply(UpsamplingConcat(12), up, skip)
        assert out.shape == (1, 16, 16, 12)

    def test_upsampling_add(self):
        x = jnp.ones((1, 8, 8, 16))
        skip = jnp.ones((1, 16, 16, 6))
        out = init_apply(UpsamplingAdd(6), x, skip)
        assert out.shape == (1, 16, 16, 6)

    def test_deeplab_head(self):
        out = init_apply(DeepLabHead(5, hidden_channel=16),
                         jnp.ones((1, 10, 10, 8)))
        assert out.shape == (1, 10, 10, 5)

    def test_convnext_block(self):
        out = init_apply(ConvNeXtBlock(), jnp.ones((1, 8, 8, 16)))
        assert out.shape == (1, 8, 8, 16)

    def test_bottleblock_projection(self):
        out = init_apply(Bottleblock(12), jnp.ones((1, 8, 8, 16)))
        assert out.shape == (1, 8, 8, 12)


class TestSRVP:
    def test_small_encoder_downsamples_4x(self):
        enc = SmallEncoder(nh=16, nf=8)
        out = init_apply(enc, jnp.ones((1, 40, 40, 16)))
        assert out.shape == (1, 10, 10, 16)

    def test_encoder_decoder_roundtrip_shape(self):
        x = jnp.ones((1, 40, 40, 16))
        enc = SmallEncoder(nh=16, nf=8)
        v = enc.init({'params': KEY, 'dropout': KEY}, x)
        z = enc.apply(v, x)
        dec = SmallDecoder(nh=16, nf=8)
        out = init_apply(dec, z)
        assert out.shape == (1, 40, 40, 16)

    def test_convnet(self):
        out = init_apply(ConvNet(32), jnp.ones((1, 10, 10, 16)))
        assert out.shape == (1, 10, 10, 32)


class TestTemporal:
    def test_spatial_gru(self):
        out = init_apply(SpatialGRU(input_size=8, hidden_size=8),
                         jnp.ones((2, 3, 10, 10, 8)))
        assert out.shape == (2, 3, 10, 10, 8)

    def test_dual_gru_cell_delta_zero_step_changes_state(self):
        cell = DualGRUCell(8, 8, return_delta=True)
        x = jnp.ones((1, 10, 10, 8))
        state = jnp.zeros((1, 10, 10, 8))
        dh = init_apply(cell, x, state)
        assert dh.shape == state.shape

    def test_causal_conv3d_is_causal(self):
        m = CausalConv3d(4, kernel_size=(2, 3, 3))
        x = np.zeros((1, 4, 6, 6, 4), np.float32)
        x[:, 2] = 1.0  # impulse at t=2
        v = m.init({'params': KEY}, jnp.asarray(x))
        out0 = m.apply(v, jnp.asarray(x))
        x2 = x.copy()
        x2[:, 3] = 5.0  # changing a later frame...
        out1 = m.apply(v, jnp.asarray(x2))
        # ...must not affect earlier outputs
        np.testing.assert_allclose(out0[:, :3], out1[:, :3], atol=1e-6)

    def test_bottleneck3d(self):
        out = init_apply(Bottleneck3D(kernel_size=(1, 3, 3)),
                         jnp.ones((1, 3, 8, 8, 8)))
        assert out.shape == (1, 3, 8, 8, 8)

    def test_pyramid_pooling(self):
        m = PyramidSpatioTemporalPooling(4, [(2, 8, 8)])
        out = init_apply(m, jnp.ones((1, 3, 8, 8, 6)))
        assert out.shape == (1, 3, 8, 8, 4)

    def test_pyramid_pooling_causal_average(self):
        """Output frame t must average only frames t-1 and t (pad excluded)."""
        m = PyramidSpatioTemporalPooling(2, [(2, 4, 4)])
        x = np.zeros((1, 3, 4, 4, 2), np.float32)
        x[:, 0] = 1.0
        x[:, 1] = 3.0
        x[:, 2] = 5.0
        v = m.init({'params': KEY}, jnp.asarray(x))
        # inspect the pooled intermediate by monkey-checking via linearity:
        # conv is fixed; compare outputs for scaled inputs instead.
        out_a = m.apply(v, jnp.asarray(x))
        assert out_a.shape == (1, 3, 4, 4, 2)

    def test_temporal_block(self):
        m = TemporalBlock(12, use_pyramid_pooling=True, pool_sizes=[(2, 8, 8)])
        out = init_apply(m, jnp.ones((1, 3, 8, 8, 9)))
        assert out.shape == (1, 3, 8, 8, 12)

    def test_bigru(self):
        out = init_apply(BiGRU(8), jnp.ones((1, 3, 8, 8, 8)))
        assert out.shape == (1, 3, 8, 8, 8)


class TestDilatedBackends:
    """ASPP's dilated convs have two backends (layers/conv.py
    DILATED_CONV_BACKEND): XLA's conv_general_dilated and the 9-shifted-tap
    matmul decomposition.  They must be numerically equivalent on identical
    params and produce identical param trees (checkpoint rules depend on
    the Conv_0..Conv_5 paths)."""

    def test_taps_matches_xla_and_param_tree_stable(self):
        from streamingflow_tpu.layers import conv as convmod
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 17, 19, 6).astype(np.float32))
        m = ASPP(out_channels=8, atrous_rates=(2, 5, 7))

        old = convmod.DILATED_CONV_BACKEND
        try:
            convmod.DILATED_CONV_BACKEND = 'xla'
            v = m.init({'params': KEY, 'dropout': KEY}, x)
            out_xla = m.apply(v, x)
            convmod.DILATED_CONV_BACKEND = 'taps'
            v_taps = m.init({'params': KEY, 'dropout': KEY}, x)
            out_taps = m.apply(v, x)     # same params, taps compute
        finally:
            convmod.DILATED_CONV_BACKEND = old

        paths = lambda t: sorted(
            '/'.join(map(str, p)) + f':{l.shape}' for p, l in
            jax.tree_util.tree_flatten_with_path(t)[0])
        assert paths(v_taps) == paths(v)
        np.testing.assert_allclose(np.asarray(out_taps), np.asarray(out_xla),
                                   rtol=1e-5, atol=1e-5)
