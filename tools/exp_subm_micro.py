"""Decompose the column-engine subm conv at stage-2 flagship shape:
gather-only vs dots-only vs gather+dots vs full (incl. mask epilogue).

    python tools/exp_subm_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.ops import sparse_columns as SC
from exp_column_pieces import STAGES, chain_time, synth_columns


def main():
    print(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    stage = int(os.environ.get('STAGE', '2')) - 1
    grid, nz, c, n, cap = STAGES[stage]
    fill = {41: 0.04, 21: 0.1, 11: 0.2, 5: 0.45}[nz]
    cs = synth_columns(rng, n, cap, grid, nz, c, fill)
    w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.1, jnp.bfloat16)
    cmap = SC.build_column_map(cs, grid)
    B_all = [SC._banded_matrix(w[k * 3:(k + 1) * 3], nz, nz, 3, 1, 1
                               ).astype(jnp.bfloat16) for k in range(9)]
    B_stack = jnp.stack(B_all)

    chain_time(lambda f, nb, fo: SC._gather_taps(f, nb, fo),
               (cs.feats, cmap.nbr, cmap.found), label='gather taps only')

    def dots_only(taps):
        out = None
        for k in range(9):
            acc = jnp.dot(taps[k], B_stack[k],
                          preferred_element_type=taps.dtype)
            out = acc if out is None else out + acc
        return out
    taps = SC._gather_taps(cs.feats, cmap.nbr, cmap.found)
    chain_time(dots_only, (taps,), label='9 banded dots only (prebuilt B)')

    def dots_prebuilt(f, nb, fo):
        t = SC._gather_taps(f, nb, fo)
        return dots_only(t)
    chain_time(dots_prebuilt, (cs.feats, cmap.nbr, cmap.found),
               label='gather + dots (prebuilt B)')

    def one_big_dot(f, nb, fo):
        t = SC._gather_taps(f, nb, fo)          # (9, V, F)
        tt = jnp.swapaxes(t, 0, 1).reshape(t.shape[1], -1)   # (V, 9F)
        return jnp.dot(tt, B_stack.reshape(-1, B_stack.shape[-1]),
                       preferred_element_type=f.dtype)
    chain_time(one_big_dot, (cs.feats, cmap.nbr, cmap.found),
               label='gather + transpose + 1 big dot')

    def einsum_form(f, nb, fo):
        t = SC._gather_taps(f, nb, fo)
        return jnp.einsum('kvf,kfg->vg', t, B_stack,
                          preferred_element_type=f.dtype)
    chain_time(einsum_form, (cs.feats, cmap.nbr, cmap.found),
               label='gather + einsum kvf,kfg->vg')

    chain_time(lambda f, zm, *m: SC.subm_conv_columns(
        f, zm, SC.ColumnMap(*m), w, formulation='banded'),
        (cs.feats, cs.zmask) + tuple(cmap),
        label='full subm (banded, builds B)')

    # fp32 accumulate variant
    def dots_f32(taps):
        out = None
        for k in range(9):
            acc = jnp.dot(taps[k], B_stack[k],
                          preferred_element_type=jnp.float32)
            out = acc if out is None else out + acc
        return out.astype(jnp.bfloat16)
    chain_time(dots_f32, (taps,), label='9 dots, fp32 accum')

    # --- gather variants (the dominant cost) ---
    side_idx = jnp.stack([cmap.nbr[k] for k in (0, 1, 2, 6, 7, 8)])
    side_fnd = jnp.stack([cmap.found[k] for k in (0, 1, 2, 6, 7, 8)])

    chain_time(lambda f, i: f[i], (cs.feats, side_idx),
               label='6-tap gather, NO mask')
    chain_time(lambda f, i, m: jnp.where(m[:, :, None], f[i], 0),
               (cs.feats, side_idx, side_fnd),
               label='6-tap gather + where mask')
    neg = jnp.where(side_fnd, side_idx, -1)
    chain_time(lambda f, i: f.at[i].get(mode='fill', fill_value=0),
               (cs.feats, neg), label='6-tap fill-gather (idx=-1)')

    def masked_dots(f, i, m):
        g = jnp.where(m[:, :, None], f[i], 0)
        out = None
        for k in range(6):
            acc = jnp.dot(g[k], B_stack[k], preferred_element_type=f.dtype)
            out = acc if out is None else out + acc
        return out
    chain_time(masked_dots, (cs.feats, side_idx, side_fnd),
               label='6-tap gather+mask+6 dots')

    def fill_dots(f, i):
        g = f.at[i].get(mode='fill', fill_value=0)
        out = None
        for k in range(6):
            acc = jnp.dot(g[k], B_stack[k], preferred_element_type=f.dtype)
            out = acc if out is None else out + acc
        return out
    chain_time(fill_dots, (cs.feats, neg),
               label='6-tap fill-gather+6 dots')

    # gather per 256-lane slice (three narrower gathers)
    def sliced_gather(f, i):
        outs = [f[:, a:a + 256][i] for a in range(0, f.shape[1], 256)]
        return jnp.concatenate(outs, axis=-1)
    chain_time(sliced_gather, (cs.feats, side_idx),
               label='6-tap gather in 256-lane slices')

    # 3-row windowed gather anchored at the face slots (2 descriptors per
    # column instead of 6): rows [p-1, p, p+1] per dx — the speed of the
    # corrected-window design (exactness machinery not included here)
    face = jnp.stack([cmap.nbr[1], cmap.nbr[7]])        # (2, V)
    def window_gather(f, anchors):
        starts = (anchors - 1).reshape(-1)[:, None]
        w = jax.lax.gather(
            f, starts,
            jax.lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                           collapsed_slice_dims=(),
                                           start_index_map=(0,)),
            slice_sizes=(3, f.shape[1]), mode='clip')
        return w.reshape(2, anchors.shape[1], 3, f.shape[1])
    chain_time(window_gather, (cs.feats, face),
               label='2x 3-row windowed gather (same bytes as 6-tap)')


if __name__ == '__main__':
    main()
