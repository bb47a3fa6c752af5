"""TPU kernel smoke gate: compile AND run every Pallas kernel on the device.

    python tools/tpu_smoke.py        # exits non-zero on any failure

The interpret-mode test tier (tests/test_winfuse.py etc.) checks numerics
but NOT Mosaic lowering — a kernel can pass every interpret test and still
fail kernel verification on hardware (round 4 shipped exactly that:
'tpu.matmul' op Expected matmul acc to be 32-bit).  This gate runs the
three kernels — pallas_bin, pallas_patch_pool (fwd+bwd), pallas_winfuse
(fwd+bwd) — at micro shapes that keep compiles fast while preserving the
VMEM-critical dimensions (winfuse runs the stage-1 AND stage-2 banded-matrix
shapes, whose ~9 MB bmats set the scoped-VMEM high-water mark).

RULE (docs/PERF.md methodology): no commit touching ops/pallas_* without a
passing run of this gate on the attached device.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f'PASS {name}  ({time.perf_counter() - t0:.1f}s)')
    except Exception:
        print(f'FAIL {name}')
        traceback.print_exc()
        FAILED.append(name)


def smoke_bin_sum():
    from streamingflow_tpu.ops.pallas_bin import bin_sum
    rng = np.random.RandomState(0)
    P, C, n_bins = 4096, 16, 1024
    data = jnp.asarray(rng.randn(P, C).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, n_bins, P).astype(np.int32))
    got = np.asarray(bin_sum(data, ids, n_bins=n_bins))
    want = np.asarray(jax.ops.segment_sum(data, ids, num_segments=n_bins))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def smoke_patch_pool():
    from streamingflow_tpu.ops.pallas_patch_pool import patch_pool_frames
    rng = np.random.RandomState(1)
    nx = ny = 64
    x = jnp.asarray(rng.randn(1, 2, 4, 4, 8, 64).astype(np.float32))
    # coords clustered per group so the patch budget holds
    base = rng.randint(4, 40, (1, 2, 4, 1, 1, 2))
    jit_ = rng.randint(0, 8, (1, 2, 4, 4, 8, 2))
    coords = jnp.asarray((base + jit_).astype(np.int32))
    kept = jnp.ones((1, 2, 4, 4, 8), bool)

    out, drops = patch_pool_frames(x, coords, kept, nx, ny)
    assert float(drops[0]) == 0.0
    flat_c = np.asarray(coords).reshape(-1, 2)
    flat_x = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32)
                        ).reshape(-1, 64)
    want = np.zeros((nx, ny, 64), np.float32)
    np.add.at(want, (flat_c[:, 0], flat_c[:, 1]), flat_x)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=1e-2,
                               atol=1e-2)
    # backward: custom VJP must compile+run on device
    g = jax.grad(lambda v: jnp.sum(
        patch_pool_frames(v, coords, kept, nx, ny)[0]))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def _winfuse_stage(nz, c, n_cols, cap, grid):
    from streamingflow_tpu.ops import pallas_winfuse as WF
    from streamingflow_tpu.ops import sparse_columns as SC
    from tools.exp_column_pieces import synth_columns
    rng = np.random.default_rng(2)
    cs = synth_columns(rng, n_cols, cap, grid, nz, c, 0.2)
    w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.1, jnp.bfloat16)
    cmap = SC.build_column_map(cs, grid)
    plan = WF.build_fused_plan(cmap, cs.col_mask)
    out = WF.subm_conv_winfuse(cs.feats, cs.zmask, cmap, plan, w,
                               mask_output=False)
    ref = SC.subm_conv_columns(cs.feats, cs.zmask, cmap, w,
                               formulation='sep', mask_output=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.08, atol=0.08)  # bf16 taps; engine-agreement pins exactness
    # backward (routes through the XLA 'sep' VJP — run it anyway so the
    # whole train path compiles)
    g = jax.grad(lambda f: jnp.sum(WF.subm_conv_winfuse(
        f.astype(jnp.bfloat16), cs.zmask, cmap, plan, w,
        mask_output=False).astype(jnp.float32)))(
            cs.feats.astype(jnp.float32))
    assert bool(jnp.all(jnp.isfinite(g)))


def main():
    dev = jax.devices()[0]
    print(f'device: {dev}')
    if dev.platform != 'tpu':
        print('NOT a TPU — this gate must run on the attached device',
              file=sys.stderr)
        return 2
    check('bin_sum', smoke_bin_sum)
    check('patch_pool fwd+bwd', smoke_patch_pool)
    # stage-1 and stage-2 banded shapes: the two largest bmats (~9 MB) —
    # the scoped-VMEM high-water marks of the winfuse kernel
    check('winfuse s1 (nz=41,c=16) fwd+bwd',
          lambda: _winfuse_stage(41, 16, 6000, 8192, (1600, 1600)))
    check('winfuse s2 (nz=21,c=32) fwd+bwd',
          lambda: _winfuse_stage(21, 32, 6000, 8192, (800, 800)))
    if FAILED:
        print(f'\nFAILED: {FAILED}', file=sys.stderr)
        return 1
    print('\nall kernels pass on', dev)
    return 0


if __name__ == '__main__':
    sys.exit(main())
