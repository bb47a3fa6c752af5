"""Sub-stage profile of the future-prediction block (GRU-ODE + refinement).

Times, at flagship shapes and bf16 (matching bench.py): the SRVP encoder,
the GRU-ODE event tape, the SpatialGRU refinement stack, ConvNeXt block and
DeepLabHead, plus the composed FuturePredictionODE, to locate where the
~39 ms 'gru-ode future prediction' stage (tools/profile_stages.py) goes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from streamingflow_tpu.layers.conv import ConvNeXtBlock, DeepLabHead
from streamingflow_tpu.layers.ode import GRUODEBayes
from streamingflow_tpu.layers.srvp import SmallEncoder
from streamingflow_tpu.layers.temporal import SpatialGRU
from streamingflow_tpu.models.future_prediction import FuturePredictionODE

B, H, W, C = 1, 200, 200, 64
E_CAM, E_LID, E_TGT = 3, 5, 7
REPS = 10


def main():
    key = jax.random.PRNGKey(0)
    zero = jnp.zeros((), jnp.float32)
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms', flush=True)

    def bf16(tree):
        return jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, 'dtype') and v.dtype == jnp.float32 else v, tree)

    def timed(name, module, *args, rngs=('sample',)):
        rd = {r: key for r in rngs}
        variables = bf16(jax.jit(module.init)({'params': key, **rd}, *args))
        fn = jax.jit(lambda *a: module.apply(variables, *a, rngs=rd))
        chain = jax.jit(lambda s, *a: s * 0.0 + jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        comp = time.perf_counter() - t0
        float(chain(zero, *args))
        t0 = time.perf_counter()
        s = zero
        for _ in range(REPS):
            s = chain(s, *args)
        float(s)
        run = (time.perf_counter() - t0 - rtt) / REPS
        print(f'{name:34s} compile {comp:6.1f}s  run {run*1e3:8.2f} ms',
              flush=True)

    dt = jnp.bfloat16
    cam_t = jnp.tile(jnp.linspace(-1.0, 0.0, E_CAM), (B, 1))
    lid_t = jnp.tile(jnp.linspace(-0.8, 0.0, E_LID), (B, 1))
    tgt_t = jnp.tile(jnp.concatenate(
        [jnp.linspace(-1.0, 0.0, 3), jnp.arange(1, 5) * 0.5]), (B, 1))
    obs_t = jnp.sort(jnp.concatenate([cam_t, lid_t], axis=1), axis=1)
    obs = jnp.ones((B, E_CAM + E_LID, H, W, C), dt)
    cam_s = jnp.ones((B, E_CAM, H, W, C), dt)
    lid_s = jnp.ones((B, E_LID, H, W, C), dt)
    present = jnp.ones((B, 1, H, W, C), dt)
    seq7 = jnp.ones((B, E_TGT, H, W, C), dt)
    flat7 = jnp.ones((B * E_TGT, H, W, C), dt)

    timed('srvp encode (9 frames 200->50)',
          SmallEncoder(C, 64), jnp.ones((B * 9, H, W, C), dt))
    timed('gru-ode tape (8 obs + 7 tgt)',
          GRUODEBayes(input_size=C, hidden_size=C, delta_t=0.05,
                      variable_step=True, impute=True),
          obs_t, obs, present, tgt_t)
    timed('spatial-gru (7 frames 200^2)', SpatialGRU(C, C), seq7)
    timed('convnext block (7x200^2)', ConvNeXtBlock(), flat7)
    timed('deeplab head (7x200^2)', DeepLabHead(C, hidden_channel=128), flat7)
    timed('FULL FuturePredictionODE',
          FuturePredictionODE(in_channels=C, latent_dim=C, variable_step=True,
                              impute=True),
          present, cam_s, cam_t, lid_s, lid_t, tgt_t)


if __name__ == '__main__':
    main()
