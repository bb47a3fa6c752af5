"""Standard evaluation: IoU / PQ (VPQ) / planning metrics over validation.

TPU-native counterpart of reference evaluate.py:30-350 — restores a
checkpoint, runs the jitted forward over the val split, applies the
host-side instance post-processing, and prints the metric table.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def get_eval_parser():
    parser = argparse.ArgumentParser(description='StreamingFlow-TPU evaluation')
    parser.add_argument('--checkpoint', default=None,
                        help='checkpoint directory (LOG_DIR/TAG/checkpoints)')
    parser.add_argument('--dataroot', default=None)
    parser.add_argument('--version', default=None,
                        help="dataset version, e.g. 'mini' or 'trainval'")
    parser.add_argument('--future-frames', type=int, default=None,
                        help='override N_FUTURE_FRAMES (horizon sweep)')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--plot', default=None, metavar='DIR',
                        help='save prediction-vs-label panels to DIR '
                             '(reference evaluate.py plot_prediction:218)')
    parser.add_argument('--config-file', default='')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    return parser


def build_eval_state(args, cfg_mutator=None):
    from streamingflow_tpu.config import get_cfg
    from streamingflow_tpu.training import trainer as TR
    from streamingflow_tpu.training.checkpoint import CheckpointManager

    if args.checkpoint:
        ckpt = CheckpointManager(args.checkpoint)
        cfg = ckpt.load_cfg()
    else:
        ckpt = None
        cfg = get_cfg(args)
    if args.dataroot:
        cfg.DATASET.DATAROOT = args.dataroot
    if args.version:
        cfg.DATASET.VERSION = args.version
    if args.future_frames is not None:
        cfg.N_FUTURE_FRAMES = args.future_frames
    cfg.BATCHSIZE = args.batch_size
    if cfg_mutator is not None:
        cfg_mutator(cfg)
    return cfg, ckpt


def run_eval(cfg, ckpt, short_interval: bool = False, plot_dir=None,
             eval_interval: int = 1):
    """Metric loop over the validation split.

    ``eval_interval`` thins the *future* target-timestamp lattice by that
    stride (units of the lattice step; reference evaluate_streaming.py
    :118-126) and subsamples the labels in lockstep at metric-update time
    (reference :142, :164) so predictions and multisweep labels always have
    the same T."""
    from streamingflow_tpu.data.dataloader import prepare_dataloaders
    from streamingflow_tpu.postprocess import (
        predict_instance_segmentation_and_trajectories)
    from streamingflow_tpu.training import trainer as TR
    from streamingflow_tpu.training.metrics import (IntersectionOverUnion,
                                                    PanopticMetric,
                                                    PlanningMetric)
    from streamingflow_tpu.utils.visualisation import visualise_output

    _, valloader = prepare_dataloaders(cfg)
    n_classes = len(cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS)
    metric_vehicle = IntersectionOverUnion(n_classes)
    metric_panoptic = PanopticMetric(n_classes=n_classes)
    metric_pedestrian = (IntersectionOverUnion(n_classes)
                         if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED else None)
    # one planning metric per future second (reference evaluate.py:77-80)
    metric_planning = []
    if cfg.PLANNING.ENABLED:
        future_second = max(cfg.N_FUTURE_FRAMES // 2, 1)
        metric_planning = [PlanningMetric(cfg, 2 * (i + 1))
                           for i in range(future_second)]
    if plot_dir:
        os.makedirs(plot_dir, exist_ok=True)

    state = None
    rf = cfg.TIME_RECEPTIVE_FIELD
    eval_fwd = None
    planning_fwd = None
    t_fwd = []

    def sub(label_seq):
        """Label future subsample in lockstep with the thinned targets
        (applies to [:, rf-1:] slices; reference evaluate_streaming.py:142)."""
        return label_seq[:, ::eval_interval] if eval_interval != 1 \
            else label_seq

    for i, batch_np in enumerate(valloader):
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if isinstance(v, np.ndarray)}
        if eval_interval != 1:
            tt = batch['target_timestamp']
            batch['target_timestamp'] = jnp.concatenate(
                [tt[:, :rf - 1], tt[:, rf - 1:][:, ::eval_interval]], axis=1)
        if state is None:
            state = TR.create_train_state(cfg, jax.random.PRNGKey(0), batch)
            if ckpt is not None and ckpt.latest_step() is not None:
                state = ckpt.restore(state)
            eval_fwd = jax.jit(
                lambda s, b: TR.eval_forward(s, b, cfg))
        labels = TR.prepare_future_labels(batch, cfg)

        t0 = time.time()
        output = eval_fwd(state, batch)
        jax.block_until_ready(output['segmentation'])
        t_fwd.append(time.time() - t0)

        for k, v in output.get('diagnostics', {}).items():
            if ('dropped' in k or 'cap_hit' in k) and float(v) > 0:
                print(f'WARNING: sparse-engine capacity event {k} = '
                      f'{int(v)} — raise MODEL.SPARSE_ENCODER caps '
                      f'(tools/size_caps.py)', flush=True)

        seg_pred = np.argmax(np.asarray(output['segmentation']), axis=-1)
        seg_label = np.asarray(labels['segmentation'])[..., 0]
        metric_vehicle.update(seg_pred[:, rf - 1:], sub(seg_label[:, rf - 1:]))

        ped_pred = None
        if metric_pedestrian is not None:
            ped_pred = np.argmax(np.asarray(output['pedestrian']), axis=-1)
            ped_label = np.asarray(labels['pedestrian'])[..., 0]
            metric_pedestrian.update(ped_pred[:, rf - 1:],
                                     sub(ped_label[:, rf - 1:]))

        consistent = predict_instance_segmentation_and_trajectories(
            {k: np.asarray(v) for k, v in output.items()
             if v is not None and k in ('segmentation', 'instance_center',
                                        'instance_offset', 'instance_flow')},
            short_interval=short_interval)
        metric_panoptic.update(
            consistent[:, rf - 1:],
            sub(np.asarray(labels['instance'])[:, rf - 1:]))

        if metric_planning:
            final_traj = _run_planner(state, cfg, batch, labels, output,
                                      seg_pred, ped_pred, rf)
            # metric occupancy comes from *labels* (reference :167-171)
            occupancy = seg_label[:, rf:].astype(bool)
            if metric_pedestrian is not None:
                occupancy |= np.asarray(labels['pedestrian'])[..., 0][:, rf:]\
                    .astype(bool)
            gt = np.asarray(batch['gt_trajectory'])
            for j, m in enumerate(metric_planning):
                cur = 2 * (j + 1)
                m.update(final_traj[:, :cur], gt[:, 1:cur + 1],
                         occupancy[:, :cur])

        if plot_dir is not None:
            frames = visualise_output(labels, output, n_present=rf)
            _save_panels(frames, os.path.join(plot_dir, f'sample_{i:05d}'))

    results = {'iou': metric_vehicle.compute(),
               'pq': metric_panoptic.compute()}
    print('==== evaluation results ====')
    print(f"vehicle IoU: {results['iou']}")
    for k, v in results['pq'].items():
        print(f'{k}: {v}')
    if metric_pedestrian is not None:
        print(f'pedestrian IoU: {metric_pedestrian.compute()}')
    if metric_planning:
        results['planning'] = []
        for j, m in enumerate(metric_planning):
            vals = m.compute()
            results['planning'].append(vals)
            for k, v in vals.items():
                print(f'planning@{j + 1}s {k}: {v}')
    if t_fwd:
        print(f'mean forward time: {np.mean(t_fwd[1:] or t_fwd):.3f}s')
    return results


def _run_planner(state, cfg, batch, labels, output, seg_pred, ped_pred, rf):
    """Eval-time planner call on *predicted* occupancy/hd-map (reference
    evaluate.py:155-166: semantic_pred from predictions, hd_map =
    output['hdmap']).  Returns final_traj (B, n_future, 3) numpy."""
    occupancy = seg_pred.astype(np.float32)
    if ped_pred is not None:
        occupancy = np.logical_or(seg_pred, ped_pred).astype(np.float32)
    if output.get('hdmap') is not None:
        # decoder emits channels-last; the planner takes (B, C, H, W)
        hd_map = jnp.moveaxis(output['hdmap'], -1, 1)
    else:
        # reference couples planning eval to the hdmap head (it would crash
        # without it, evaluate.py:163); run with a zero map instead so the
        # planner stays usable in hdmap-free configs
        h, w = seg_pred.shape[-2:]
        hd_map = jnp.zeros((seg_pred.shape[0], 2, h, w), jnp.float32)

    def planner(mdl, **kw):
        return mdl.model.planning(**kw)

    _, final_traj = state.apply_fn(
        {'params': state.params, 'batch_stats': state.batch_stats},
        cam_front=output['cam_front'],
        trajs=batch['sample_trajectory'][:, :, 1:],
        gt_trajs=batch['gt_trajectory'][:, 1:],
        cost_volume=output['costvolume'][:, rf:],
        semantic_pred=jnp.asarray(occupancy[:, rf:]),
        hd_map=hd_map,
        commands=batch['command'].astype(jnp.int32),
        target_points=batch['target_point'],
        train=False, method=planner)
    return np.asarray(final_traj)


def _save_panels(frames: np.ndarray, prefix: str) -> None:
    """Write (T, H, W, 3) uint8 panels as PNGs (one per timestep)."""
    try:
        from PIL import Image
    except ImportError:
        np.save(prefix + '.npy', frames)
        return
    for t, frame in enumerate(frames):
        Image.fromarray(frame).save(f'{prefix}_t{t}.png')


def main():
    args = get_eval_parser().parse_args()
    cfg, ckpt = build_eval_state(args)
    run_eval(cfg, ckpt, plot_dir=args.plot)


if __name__ == '__main__':
    main()
