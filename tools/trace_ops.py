"""Trace the column spconv8x encoder and print the top ops by self time.

Captures a jax.profiler trace of a few steps and summarises it with the
xprof op-profile converter — exact on-device attribution instead of
stage-bisect guesswork.

    python tools/trace_ops.py [engine[,formulation]]
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    variant = (sys.argv[1] if len(sys.argv) > 1 else 'column,sep').split(',')
    from streamingflow_tpu.config import Config
    from streamingflow_tpu.data.synthetic import _lidar_like_clouds
    from streamingflow_tpu.models.lidar_encoder import LidarBEVEncoder

    cfg = Config().MODEL.SPARSE_ENCODER
    cfg.ENGINE = variant[0]
    if len(variant) > 1:
        cfg.Z_FORMULATION = variant[1]
    cfg.COMPUTE_DTYPE = 'bfloat16'
    pts = jnp.asarray(np.asarray(_lidar_like_clouds(
        np.random.RandomState(0), (1, 5), 80000, cfg.POINT_CLOUD_RANGE),
        np.float32))
    enc = LidarBEVEncoder(cfg)
    v = jax.jit(enc.init)({'params': jax.random.PRNGKey(0)}, pts)
    v = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                     if x.dtype == jnp.float32 else x, v)
    fwd = jax.jit(lambda p: jnp.sum(enc.apply(v, p).astype(jnp.float32)))
    print('compiling...', flush=True)
    float(fwd(pts))

    tdir = '/tmp/sf_trace'
    os.system(f'rm -rf {tdir}')
    with jax.profiler.trace(tdir):
        for _ in range(3):
            s = fwd(pts)
        float(s)

    xplanes = glob.glob(f'{tdir}/**/*.xplane.pb', recursive=True)
    print('xplane:', xplanes, flush=True)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xplanes, 'framework_op_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    # framework_op_stats comes back as gviz JSON-ish; fall back to dumping
    out = '/tmp/sf_trace_opstats.json'
    with open(out, 'w') as f:
        f.write(data if isinstance(data, str) else str(data))
    print(f'wrote {out} ({len(data)} bytes)')


if __name__ == '__main__':
    main()
