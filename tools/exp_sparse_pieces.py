"""Chained-readback microbench of the sparse-engine pieces (flagship stage-1
shapes): generate_output_sites, the 27-tap strided lookup loop, gather_gemm,
and build_neighbor_map.  tools/profile_lidar.py used block_until_ready,
which does not sync on axon — its numbers are dispatch artifacts.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.config import Config
from streamingflow_tpu.ops import sparse as S
from streamingflow_tpu.ops.voxelize import LARGE_ID, linearize

REPS = 5


def main():
    cfg = Config().MODEL.SPARSE_ENCODER
    rng = np.random.default_rng(0)
    V_in, V_out = 120000, 60000
    shape = (1408, 1408, 40)
    out_shape = tuple((shape[d] + 2 * 1 - 3) // 2 + 1 for d in range(3))

    # synthetic active set: unique sorted ids over the grid
    n_bins = shape[0] * shape[1] * shape[2]
    ids = np.sort(rng.choice(n_bins // 64, size=V_in, replace=False) * 64
                  + rng.integers(0, 64, V_in)).astype(np.int32)
    ids = np.unique(ids)
    V = len(ids)
    pad = V_in - V
    idp = np.concatenate([ids, np.full(pad, LARGE_ID, np.int32)])
    cz = ids % shape[2]
    cy = (ids // shape[2]) % shape[1]
    cx = ids // (shape[2] * shape[1])
    coords = np.stack([cx, cy, cz], -1).astype(np.int32)
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    mask = np.concatenate([np.ones(V, bool), np.zeros(pad, bool)])
    feats = rng.normal(size=(V_in, 16)).astype(np.float32)

    st = S.SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(idp), jnp.asarray(mask), shape)
    w = jnp.asarray(rng.normal(size=(27, 16, 16)).astype(np.float32)) * 0.1
    wd = jnp.asarray(rng.normal(size=(27, 16, 32)).astype(np.float32)) * 0.1

    zero = jnp.zeros((), jnp.float32)
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'rtt {rtt*1e3:.1f} ms  V={V}', flush=True)

    def timed(name, fn):
        jfn = jax.jit(fn)
        chain = jax.jit(lambda s: s * 0.0 + jax.tree.reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), jfn(), 0.0))
        jax.block_until_ready(jfn())
        float(chain(zero))
        t0 = time.perf_counter()
        s = zero
        for _ in range(REPS):
            s = chain(s)
        float(s)
        run = (time.perf_counter() - t0 - rtt) / REPS
        print(f'{name:40s} {run*1e3:9.2f} ms', flush=True)

    timed('generate_output_sites (V=120k s2)',
          lambda: S.generate_output_sites(st, (3, 3, 3), (2, 2, 2),
                                          (1, 1, 1), out_shape, V_out))

    sites = jax.jit(lambda: S.generate_output_sites(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape, V_out))()
    out_ids, out_coords, out_mask = sites

    def tap_loop():
        offsets = S._kernel_offsets((3, 3, 3))
        stride_a = jnp.asarray((2, 2, 2), jnp.int32)
        pad_a = jnp.asarray((1, 1, 1), jnp.int32)
        idxs, founds = [], []
        for ki in range(27):
            tap = jnp.asarray(offsets[ki], jnp.int32)
            in_coords = out_coords * stride_a - pad_a + tap
            idx, found = S._lookup(st, in_coords, out_mask)
            idxs.append(idx)
            founds.append(found)
        return jnp.stack(idxs), jnp.stack(founds)

    timed('27-tap strided searchsorted loop', tap_loop)
    nmap_d = S.NeighborMap(*jax.jit(tap_loop)())

    timed('gather_gemm 16->32 (V_out=60k)',
          lambda: S.gather_gemm(st.feats, nmap_d, wd, out_mask))

    timed('build_neighbor_map subm (V=120k)',
          lambda: tuple(S.build_neighbor_map(st, 3)))
    nmap_s = jax.jit(lambda: tuple(S.build_neighbor_map(st, 3)))()
    nmap_s = S.NeighborMap(*nmap_s)

    timed('gather_gemm subm 16->16 (V=120k)',
          lambda: S.gather_gemm(st.feats, nmap_s, w, st.mask))

    timed('sites+nmap fused (scatter-join)',
          lambda: (S.generate_output_sites(st, (3, 3, 3), (2, 2, 2),
                                           (1, 1, 1), out_shape, V_out,
                                           return_nmap=True)[0]
                   + tuple(S.generate_output_sites(
                       st, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape,
                       V_out, return_nmap=True)[1])))

    # equivalence: fused nmap == searchsorted nmap
    _, nmap_f = jax.jit(lambda: S.generate_output_sites(
        st, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape, V_out,
        return_nmap=True))()
    f_d = np.asarray(nmap_d.found)
    f_f = np.asarray(nmap_f.found)
    i_d = np.where(f_d, np.asarray(nmap_d.idx), -1)
    i_f = np.where(f_f, np.asarray(nmap_f.idx), -1)
    print('nmap found equal:', bool((f_d == f_f).all()),
          ' idx equal:', bool((i_d == i_f).all()), flush=True)

    timed('full sparse_conv3d 16->32',
          lambda: S.sparse_conv3d(st, wd, (3, 3, 3), (2, 2, 2),
                                  (1, 1, 1), V_out).feats)


if __name__ == '__main__':
    main()
