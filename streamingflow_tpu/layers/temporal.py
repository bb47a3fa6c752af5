"""Temporal (3-D conv and convolutional GRU) building blocks.

Reference: streamingflow/layers/temporal.py.  Layouts: 2-D maps are
(B, H, W, C); spatio-temporal tensors are (B, T, H, W, C) (the reference uses
(B, C, T, H, W)).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Bottleblock, ConvNeXtBlock, resize_bilinear


def _conv2d(features, k=3, bias=True):
    return nn.Conv(features, (k, k), padding=[(k // 2, k // 2)] * 2,
                   use_bias=bias)


def _conv_nhwc(x, kernel):
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class GRUGates(nn.Module):
    """One conv-GRU cell update: gates + proposal, all 3x3 convs.

    Shared pattern of SpatialGRU.gru_cell (reference layers/temporal.py:44-57)
    and the gru_cell_1/2 of the dual cells.  MXU shaping: the update and
    reset convs are one fused kernel (``gates_kernel``, out = update‖reset —
    identical math, half the conv launches, 128-lane output); recurrent
    callers whose input sequence is known upfront (SpatialGRU, BiGRU) call
    :meth:`precompute_x` once, batched over time, and pass the result as
    ``x_pre`` so each sequential step only convolves the state half
    (conv([x,s]) = conv_x(x) + conv_h(s) by linearity over the channel
    split — exact up to fp reassociation)."""
    hidden_size: int
    in_size: int
    gru_bias_init: float = 0.0

    def setup(self):
        h, cx = self.hidden_size, self.in_size
        init = nn.initializers.lecun_normal()
        self.gates_kernel = self.param('gates_kernel', init,
                                       (3, 3, cx + h, 2 * h))
        self.gates_bias = self.param('gates_bias', nn.initializers.zeros,
                                     (2 * h,))
        self.proposal_kernel = self.param('proposal_kernel', init,
                                          (3, 3, cx + h, h))
        self.proposal_bias = self.param('proposal_bias',
                                        nn.initializers.zeros, (h,))

    def precompute_x(self, x):
        """Input-half gate/proposal contributions, batchable over time.

        x: (N, H, W, in_size) -> (gates_x (N, H, W, 2*hidden),
        proposal_x (N, H, W, hidden)); biases are added in __call__."""
        cx = self.in_size
        return (_conv_nhwc(x, self.gates_kernel[:, :, :cx]),
                _conv_nhwc(x, self.proposal_kernel[:, :, :cx]))

    def __call__(self, x, state, x_pre=None):
        h, cx = self.hidden_size, self.in_size
        if x_pre is None:
            xs = jnp.concatenate([x, state], axis=-1)
            ur = _conv_nhwc(xs, self.gates_kernel)
        else:
            ur = _conv_nhwc(state, self.gates_kernel[:, :, cx:]) + x_pre[0]
        ur = ur + self.gates_bias + self.gru_bias_init
        update = nn.sigmoid(ur[..., :h])
        reset = nn.sigmoid(ur[..., h:])
        gated = (1.0 - reset) * state
        if x_pre is None:
            ps = jnp.concatenate([x, gated], axis=-1)
            proposal = _conv_nhwc(ps, self.proposal_kernel)
        else:
            proposal = (_conv_nhwc(gated, self.proposal_kernel[:, :, cx:])
                        + x_pre[1])
        proposal = proposal + self.proposal_bias
        return (1.0 - update) * state + update * proposal


class SpatialGRU(nn.Module):
    """Conv GRU over a (B, T, H, W, C) sequence with a 1x1 output decoder.

    Reference: layers/temporal.py:11-57."""
    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x, state=None):
        b, t, h, w, cx = x.shape
        cell = GRUGates(self.hidden_size, in_size=cx)
        decoder = nn.Conv(self.input_size, (1, 1), use_bias=False)
        rnn_state = (jnp.zeros((b, h, w, self.hidden_size), x.dtype)
                     if state is None else state)
        # input-half transforms batched over all t outside the recurrence;
        # the sequential loop only convolves the state half
        ur_x, p_x = cell.precompute_x(x.reshape(b * t, h, w, cx))
        ur_x = ur_x.reshape(b, t, h, w, -1)
        p_x = p_x.reshape(b, t, h, w, -1)
        states = []
        for i in range(t):
            rnn_state = cell(None, rnn_state, x_pre=(ur_x[:, i], p_x[:, i]))
            states.append(rnn_state)
        stacked = jnp.stack(states, axis=1).reshape(b * t, h, w, -1)
        return decoder(stacked).reshape(b, t, h, w, -1)


class DualGRUCell(nn.Module):
    """Dual GRU with trusting-gate mixing; the GRU-ODE jump update.

    x: (B, H, W, C_in); state: (B, H, W, C_hidden) (the n_present axis of the
    reference collapses to 1 on the ODE path).  When ``return_delta`` the
    output is (mixed - state), i.e. the continuous DualGRUODECell (reference
    layers/temporal_ode_bayes.py:64-131); otherwise the discrete DualGRUCell
    (reference :211-275)."""
    input_size: int
    hidden_size: int
    return_delta: bool = False

    @nn.compact
    def __call__(self, x, state, train: bool = False):
        cell1 = GRUGates(self.hidden_size, in_size=x.shape[-1],
                         name='gru_cell_1')
        cell2 = GRUGates(self.hidden_size, in_size=self.hidden_size,
                         name='gru_cell_2')
        conv_decoder_2 = _conv2d(self.hidden_size)

        # reference: h = state[:, 0]; rnn_state1 = rnn_state2 = state[:, -1]
        # with n_present == 1 all three equal `state`.
        rnn_state1 = cell1(x, state)
        h = cell2(state, state)
        rnn_state2 = conv_decoder_2(h)

        mix = jnp.concatenate([rnn_state1, rnn_state2], axis=-1)
        gate = Bottleblock(self.hidden_size, name='trusting_gate_block')(
            mix, train=train)
        gate = nn.Conv(2, (1, 1), use_bias=False, name='trusting_gate_conv')(gate)
        gate = nn.softmax(gate, axis=-1)
        mixed = rnn_state2 * gate[..., 0:1] + rnn_state1 * gate[..., 1:2]
        if self.return_delta:
            return mixed - state
        return mixed


class BiGRU(nn.Module):
    """Bidirectional conv GRU + residual fusion. Reference: layers/temporal.py:162-219."""
    in_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, h, w, c = x.shape
        cell1 = GRUGates(self.in_channels, in_size=c, name='cell_fwd')
        cell2 = GRUGates(self.in_channels, in_size=c, name='cell_bwd')
        dec1 = Bottleblock(self.in_channels, name='dec_fwd')
        dec2 = Bottleblock(self.in_channels, name='dec_bwd')

        flat_in = x.reshape(b * s, h, w, c)
        ur1, p1 = cell1.precompute_x(flat_in)
        ur2, p2 = cell2.precompute_x(flat_in)
        ur1, p1 = (v.reshape(b, s, h, w, -1) for v in (ur1, p1))
        ur2, p2 = (v.reshape(b, s, h, w, -1) for v in (ur2, p2))
        state1, state2 = x[:, 0], x[:, -1]
        outs1, outs2 = [], []
        for t in range(s):
            state1 = cell1(None, state1, x_pre=(ur1[:, t], p1[:, t]))
            r = s - t - 1
            state2 = cell2(None, state2, x_pre=(ur2[:, r], p2[:, r]))
            outs1.append(state1)
            outs2.append(state2)
        # per-step decoders batched over time after the recurrence
        st1 = jnp.stack(outs1, 1).reshape(b * s, h, w, -1)
        st2 = jnp.stack(outs2[::-1], 1).reshape(b * s, h, w, -1)
        states = jnp.concatenate([dec1(st1, train=train),
                                  dec2(st2, train=train)], axis=-1)
        flat = states.reshape(b * s, h, w, -1)
        flat = Bottleblock(self.in_channels)(flat, train=train)
        flat = ConvNeXtBlock()(flat, train=train)
        flat = ConvNeXtBlock()(flat, train=train)
        return flat.reshape(b, s, h, w, -1)


class CausalConv3d(nn.Module):
    """3-D conv with left-only temporal padding, BN, ReLU.

    Reference: layers/temporal.py:252-273. Input (B, T, H, W, C)."""
    out_channels: int
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kt, kh, kw = self.kernel_size
        dt, dh, dw = self.dilation
        pad_t = (kt - 1) * dt
        pad_h = ((kh - 1) * dh) // 2
        pad_w = ((kw - 1) * dw) // 2
        x = nn.Conv(self.out_channels, self.kernel_size,
                    kernel_dilation=self.dilation,
                    padding=[(pad_t, 0), (pad_h, pad_h), (pad_w, pad_w)],
                    use_bias=False)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)
        return nn.relu(x)


class Conv1x1x1NormActivated(nn.Module):
    """1x1x1 conv + BN + ReLU. Reference: layers/temporal.py:315-325."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)
        return nn.relu(x)


class Bottleneck3D(nn.Module):
    """3-D bottleneck with causal conv. Reference: layers/temporal.py:328-372."""
    out_channels: Optional[int] = None
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        bottleneck = in_channels // 2
        h = Conv1x1x1NormActivated(bottleneck)(x, train=train)
        h = CausalConv3d(bottleneck, self.kernel_size, self.dilation)(
            h, train=train)
        h = Conv1x1x1NormActivated(out_channels)(h, train=train)
        if out_channels != in_channels:
            x = nn.Conv(out_channels, (1, 1, 1), use_bias=False)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)
        return h + x


def _avg_pool3d_no_pad_count(x: jnp.ndarray, pool_size, stride, time_pad: int
                             ) -> jnp.ndarray:
    """AvgPool3d(count_include_pad=False) over (B, T, H, W, C) with temporal
    padding `time_pad` on both sides and no spatial padding."""
    kt, kh, kw = pool_size
    st, sh, sw = stride
    b, t, h, w, c = x.shape
    if (kt == 2 and st == 1 and time_pad == 1 and (sh, sw) == (kh, kw)
            and h % kh == 0 and w % kw == 0):
        # The spatial window tiles the plane exactly: a reshape block-mean
        # plus a 2-tap temporal average.  XLA lowers the equivalent giant
        # reduce_window at >10 ms on TPU for the (2, 200, 200) flagship
        # window; this form is sub-ms.  Edge frames average only the real
        # neighbour (count_include_pad=False semantics).
        blocks = x.reshape(b, t, h // kh, kh, w // kw, kw, c).mean(
            axis=(3, 5))
        mid = (blocks[:, 1:] + blocks[:, :-1]) * 0.5
        return jnp.concatenate([blocks[:, :1], mid, blocks[:, -1:]], axis=1)
    window = (1, kt, kh, kw, 1)
    strides = (1, st, sh, sw, 1)
    padding = ((0, 0), (time_pad, time_pad), (0, 0), (0, 0), (0, 0))
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, padding)
    ones = jnp.ones(x.shape[:4] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides,
                                   padding)
    return sums / counts


class PyramidSpatioTemporalPooling(nn.Module):
    """Spatio-temporal pyramid pooling. Reference: layers/temporal.py:375-423."""
    reduction_channels: int
    pool_sizes: Sequence[Tuple[int, int, int]]

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, _ = x.shape
        out = []
        for pool_size in self.pool_sizes:
            assert pool_size[0] == 2, 'time kernel must be 2'
            stride = (1, pool_size[1], pool_size[2])
            pooled = _avg_pool3d_no_pad_count(x, pool_size, stride,
                                              time_pad=pool_size[0] - 1)
            pooled = pooled[:, :-1]  # drop right-padded frame
            pooled = Conv1x1x1NormActivated(self.reduction_channels)(
                pooled, train=train)
            c = pooled.shape[-1]
            flat = pooled.reshape(b * t, *pooled.shape[2:4], c)
            flat = resize_bilinear(flat, (h, w))
            out.append(flat.reshape(b, t, h, w, c))
        return jnp.concatenate(out, axis=-1)


class TemporalBlock(nn.Module):
    """Multi-path causal 3-D conv block with optional pyramid pooling.

    Reference: layers/temporal.py:426-490."""
    out_channels: Optional[int] = None
    use_pyramid_pooling: bool = False
    pool_sizes: Optional[Sequence[Tuple[int, int, int]]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        half = in_channels // 2

        paths = []
        for kernel in [(2, 3, 3), (1, 3, 3)]:
            h = Conv1x1x1NormActivated(half)(x, train=train)
            h = CausalConv3d(half, kernel)(h, train=train)
            paths.append(h)
        paths.append(Conv1x1x1NormActivated(half)(x, train=train))
        residual = jnp.concatenate(paths, axis=-1)

        if self.use_pyramid_pooling:
            assert self.pool_sizes is not None
            pool = PyramidSpatioTemporalPooling(in_channels // 3,
                                                self.pool_sizes)(x, train=train)
            residual = jnp.concatenate([residual, pool], axis=-1)

        residual = Conv1x1x1NormActivated(out_channels)(residual, train=train)
        if out_channels != in_channels:
            x = nn.Conv(out_channels, (1, 1, 1), use_bias=False)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)
        return x + residual
