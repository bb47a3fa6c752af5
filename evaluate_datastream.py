"""Datastream evaluation: vary the LiDAR input stream rate.

TPU-native counterpart of reference evaluate_datastream.py — sweeps
``cfg.DATASET.FRAME_SKIP`` (LiDAR observation rate = 20/FRAME_SKIP Hz,
reference :43) to measure robustness to slower sensor streams.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from evaluate import build_eval_state, get_eval_parser, run_eval

    parser = get_eval_parser()
    parser.add_argument('--frame-skip', type=int, default=4,
                        help='group this many 20 Hz sweeps per observation')
    args = parser.parse_args()

    def mutate(cfg):
        cfg.DATASET.FRAME_SKIP = args.frame_skip

    cfg, ckpt = build_eval_state(args, cfg_mutator=mutate)
    run_eval(cfg, ckpt)


if __name__ == '__main__':
    main()
