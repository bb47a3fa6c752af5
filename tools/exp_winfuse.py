"""Fused window kernel (winfuse) vs the XLA formulations, flagship shapes.

    python tools/exp_winfuse.py [stage indices, e.g. 12]

Measures per-stage: build_fused_plan, subm conv under 'winfuse' vs 'sep',
and the winfuse residual pressure (overflow blocks).  Chained-readback
timing (docs/PERF.md methodology).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.ops import pallas_winfuse as WF
from streamingflow_tpu.ops import sparse_columns as SC
from tools.exp_column_pieces import STAGES, chain_time, synth_columns


def main():
    print(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    pick = sys.argv[1] if len(sys.argv) > 1 else '1234'
    window = int(os.environ.get('SF_WINFUSE_WINDOW', '384'))
    block = int(os.environ.get('SF_WINFUSE_BLOCK', '256'))

    for i, (grid, nz, c, n, cap) in enumerate(STAGES):
        if str(i + 1) not in pick:
            continue
        fill = {41: 0.04, 21: 0.1, 11: 0.2, 5: 0.45}[nz]
        cs = synth_columns(rng, n, cap, grid, nz, c, fill)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.1, jnp.bfloat16)
        cmap = SC.build_column_map(cs, grid)

        chain_time(lambda *m: WF.build_fused_plan(
            SC.ColumnMap(*m[:4]), m[4], block=block, window=window).rel,
            tuple(cmap) + (cs.col_mask,),
            label=f's{i+1} build_fused_plan')
        plan = WF.build_fused_plan(cmap, cs.col_mask, block=block,
                                   window=window)
        n_resid = int(jnp.sum(plan.rmask)) // block
        print(f's{i+1} overflow blocks -> residual: {n_resid}  '
              f'dropped: {int(plan.n_dropped)}')

        chain_time(lambda f, zm: WF.subm_conv_winfuse(
            f, zm, cmap, plan, w, mask_output=False, window=window),
            (cs.feats, cs.zmask), label=f's{i+1} subm winfuse')
        chain_time(lambda f, zm: SC.subm_conv_columns(
            f, zm, cmap, w, formulation='sep', mask_output=False),
            (cs.feats, cs.zmask), label=f's{i+1} subm sep')


if __name__ == '__main__':
    main()
