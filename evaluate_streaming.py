"""Streaming evaluation: predict at sub-keyframe intervals (0.05 s lattice).

TPU-native counterpart of reference evaluate_streaming.py — enables
multisweep labels (DATASET.USE_MULTISWEEP) and subsamples the dense target
timestamp lattice by ``--eval-interval`` (units of 0.05 s, reference
:118-126).  The GRU-ODE decodes at exactly the requested times; no
retraining is involved.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from evaluate import build_eval_state, get_eval_parser, run_eval

    parser = get_eval_parser()
    parser.add_argument('--eval-interval', type=int, default=1,
                        help='prediction interval in 0.05 s units')
    args = parser.parse_args()

    def mutate(cfg):
        cfg.DATASET.USE_MULTISWEEP = True

    cfg, ckpt = build_eval_state(args, cfg_mutator=mutate)
    cfg.EVAL_INTERVAL = args.eval_interval  # consumed by the loader hook

    # Subsampling hook: thin the future targets by eval_interval while
    # keeping the past keyframes (reference evaluate_streaming.py:118-126).
    from streamingflow_tpu.data import dataloader as DL
    rf = cfg.TIME_RECEPTIVE_FIELD
    interval = args.eval_interval
    orig_collate = DL.collate

    def collate_with_interval(items):
        batch = orig_collate(items)
        if interval != 1 and 'target_timestamp' in batch:
            tt = batch['target_timestamp']
            past = tt[:, :rf - 1]
            future = tt[:, rf - 1:][:, ::interval]
            batch['target_timestamp'] = np.concatenate([past, future], axis=1)
        return batch

    DL.collate = collate_with_interval
    try:
        run_eval(cfg, ckpt, short_interval=(interval < 10))
    finally:
        DL.collate = orig_collate


if __name__ == '__main__':
    main()
