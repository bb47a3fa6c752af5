"""Numeric equivalence of torch->flax weight conversion rules.

Each test builds a torch layer, converts its weights with
utils/torch_convert.py, and checks the flax counterpart produces the same
output on the same input — the mechanism behind checkpoint parity
(SURVEY.md §7.5)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

import streamingflow_tpu.utils.torch_convert as TC  # noqa: E402

RNG = np.random.RandomState(0)


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def test_conv2d_equivalence():
    x = RNG.randn(2, 5, 7, 3).astype(np.float32)        # NHWC
    conv_t = torch.nn.Conv2d(3, 4, 3, padding=1)
    with torch.no_grad():
        ref = conv_t(_t(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    mod = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = {'params': {
        'kernel': TC.convert_conv(conv_t.weight.detach().numpy()),
        'bias': conv_t.bias.detach().numpy()}}
    out = np.asarray(mod.apply(jax.tree.map(jnp.asarray, v), jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv3d_equivalence():
    x = RNG.randn(1, 4, 5, 6, 2).astype(np.float32)     # NDHWC
    conv_t = torch.nn.Conv3d(2, 3, 3, padding=1)
    with torch.no_grad():
        ref = conv_t(_t(x.transpose(0, 4, 1, 2, 3))).numpy()
        ref = ref.transpose(0, 2, 3, 4, 1)
    mod = nn.Conv(3, (3, 3, 3), padding=[(1, 1)] * 3)
    v = {'params': {
        'kernel': jnp.asarray(TC.convert_conv(conv_t.weight.detach().numpy())),
        'bias': jnp.asarray(conv_t.bias.detach().numpy())}}
    out = np.asarray(mod.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_equivalence():
    # torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1)
    # == flax ConvTranspose(strides=2, padding=[(1, 2)]) with flipped taps
    x = RNG.randn(1, 6, 6, 3).astype(np.float32)
    conv_t = torch.nn.ConvTranspose2d(3, 4, 3, stride=2, padding=1,
                                      output_padding=1)
    with torch.no_grad():
        ref = conv_t(_t(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    mod = nn.ConvTranspose(4, (3, 3), strides=(2, 2),
                           padding=[(1, 2)] * 2)
    v = {'params': {
        'kernel': jnp.asarray(
            TC.convert_conv_transpose(conv_t.weight.detach().numpy())),
        'bias': jnp.asarray(conv_t.bias.detach().numpy())}}
    out = np.asarray(mod.apply(v, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_linear_equivalence():
    x = RNG.randn(4, 5).astype(np.float32)
    lin = torch.nn.Linear(5, 3)
    with torch.no_grad():
        ref = lin(_t(x)).numpy()
    mod = nn.Dense(3)
    v = {'params': {
        'kernel': jnp.asarray(TC.convert_linear(lin.weight.detach().numpy())),
        'bias': jnp.asarray(lin.bias.detach().numpy())}}
    out = np.asarray(mod.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_batchnorm_equivalence():
    x = RNG.randn(3, 4, 4, 5).astype(np.float32)
    bn = torch.nn.BatchNorm2d(5, eps=1e-5)
    bn.running_mean = torch.from_numpy(RNG.randn(5).astype(np.float32))
    bn.running_var = torch.from_numpy(
        np.abs(RNG.randn(5)).astype(np.float32) + 0.5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(RNG.randn(5).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(RNG.randn(5).astype(np.float32)))
    bn.eval()
    with torch.no_grad():
        ref = bn(_t(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    mod = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    v = {'params': {'scale': jnp.asarray(bn.weight.detach().numpy()),
                    'bias': jnp.asarray(bn.bias.detach().numpy())},
         'batch_stats': {'mean': jnp.asarray(bn.running_mean.numpy()),
                         'var': jnp.asarray(bn.running_var.numpy())}}
    out = np.asarray(mod.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_grucell_equivalence():
    I, H, B = 6, 4, 3
    x = RNG.randn(B, I).astype(np.float32)
    h = RNG.randn(B, H).astype(np.float32)
    cell_t = torch.nn.GRUCell(I, H)
    with torch.no_grad():
        ref = cell_t(_t(x), _t(h)).numpy()

    sd = {f'gru.{k}': v.detach().numpy() for k, v in
          cell_t.state_dict().items()}
    wi = TC.split_gru_matrix(sd['gru.weight_ih'])
    wh = TC.split_gru_matrix(sd['gru.weight_hh'])
    bi = TC.split_gru_bias(sd['gru.bias_ih'])
    bh = TC.split_gru_bias(sd['gru.bias_hh'])

    cell_j = nn.GRUCell(features=H)
    params = {
        'ir': {'kernel': wi['r'], 'bias': bi['r']},
        'iz': {'kernel': wi['z'], 'bias': bi['z']},
        'in': {'kernel': wi['n'], 'bias': bi['n']},
        'hr': {'kernel': wh['r']},
        'hz': {'kernel': wh['z']},
        'hn': {'kernel': wh['n'], 'bias': bh['n']},
    }
    init = cell_j.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(x))
    flat_init = TC.flatten_tree(jax.tree.map(np.asarray, init))
    flat_new = TC.flatten_tree({'params': params})
    # same tree structure as flax's own init
    assert set(flat_new) <= set(flat_init), (
        set(flat_init) ^ set(flat_new))
    # torch bias_hh r/z gates have no flax slot (flax folds them): emulate by
    # adding them to the input-side bias (valid since gates sum the two).
    flat_new['params/ir/bias'] = flat_new['params/ir/bias'] + bh['r']
    flat_new['params/iz/bias'] = flat_new['params/iz/bias'] + bh['z']
    merged = {**flat_init, **flat_new}
    new_h, _ = cell_j.apply(jax.tree.map(jnp.asarray,
                                         TC.unflatten_tree(merged)),
                            jnp.asarray(h), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(new_h), ref, rtol=1e-4, atol=1e-5)


def test_apply_mapping_end_to_end():
    """Rule-driven conversion of a small conv+bn tree with report."""
    conv_t = torch.nn.Conv2d(3, 4, 3, padding=1)
    bn_t = torch.nn.BatchNorm2d(4)
    sd = {f'block.conv.{k}': v.detach().numpy()
          for k, v in conv_t.state_dict().items()}
    sd.update({f'block.bn.{k}': v.detach().numpy()
               for k, v in bn_t.state_dict().items()})

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, name='conv')(x)
            x = nn.BatchNorm(use_running_average=not train, name='bn')(x)
            return x

    x = RNG.randn(2, 5, 5, 3).astype(np.float32)
    mod = Block()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    rules = [
        (r'params/conv/kernel', r'block.conv.weight', 'conv'),
        (r'params/conv/bias', r'block.conv.bias', 'raw'),
        (r'params/bn/(scale|bias)', r'block.bn', 'bn'),
        (r'batch_stats/bn/(mean|var)', r'block.bn', 'bn'),
    ]
    new_vars, report = TC.convert_variables(
        jax.tree.map(np.asarray, variables), sd, rules)
    assert not report['missing'], report['missing']
    leftovers = [k for k in report['unused_torch']
                 if 'num_batches_tracked' not in k]
    assert not leftovers, leftovers

    conv_t.eval(); bn_t.eval()
    with torch.no_grad():
        ref = bn_t(conv_t(_t(x.transpose(0, 3, 1, 2)))).numpy()
        ref = ref.transpose(0, 2, 3, 1)
    out = np.asarray(mod.apply(jax.tree.map(jnp.asarray, new_vars),
                               jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
