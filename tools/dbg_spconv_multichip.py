"""Standalone repro of tests/test_multichip.py::test_spconv_tiled_grads_...
with diagnostics — prints the relative grad-norm gap and the worst leaves.
Run: python tools/dbg_spconv_multichip.py
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from test_multichip import (_flagship_cfg, _make_grad_fn,  # noqa: E402
                            _tree_copy, make_batch, TR)


def main():
    cfg = _flagship_cfg(micro=True)
    cfg.MODEL.LIDAR.BACKBONE = 'spconv8x'
    rng = jax.random.PRNGKey(0)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=8, n_points=128).items()}
    state = TR.create_train_state(cfg, rng, batch)
    grad_fn = _make_grad_fn(cfg)
    step_rng = jax.random.PRNGKey(1)

    dev0 = jax.devices()[0]
    print('running 1-device grads...', flush=True)
    g1 = grad_fn(jax.device_put(_tree_copy(state), dev0),
                 {k: jax.device_put(v, dev0) for k, v in batch.items()},
                 step_rng)
    jax.block_until_ready(g1)
    print('running 8-device grads...', flush=True)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ('data',))
    g8 = grad_fn(
        jax.device_put(_tree_copy(state), NamedSharding(mesh, P())),
        {k: jax.device_put(v, NamedSharding(mesh, P('data')))
         for k, v in batch.items()}, step_rng)
    jax.block_until_ready(g8)

    tot_d = tot_n = 0.0
    rows = []
    for (kp, a), b in zip(jax.tree_util.tree_leaves_with_path(g8),
                          jax.tree.leaves(g1)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = float(np.sum((a - b) ** 2))
        n = float(np.sum(b ** 2))
        tot_d += d
        tot_n += n
        rows.append((d / max(n, 1e-30), d, n, jax.tree_util.keystr(kp)))
    rows.sort(reverse=True)
    print(f'global rel gap: {tot_d ** 0.5 / tot_n ** 0.5:.3e} '
          f'(d={tot_d:.3e}, n={tot_n:.3e})')
    print('worst leaves (rel^2, d, n):')
    for r in rows[:12]:
        print(f'  {r[0]:9.3e} {r[1]:9.3e} {r[2]:9.3e}  {r[3]}')


if __name__ == '__main__':
    main()
