"""Training CLI: config -> dataloaders -> pjit data-parallel fit.

TPU-native counterpart of reference train.py:44-99 — instead of Lightning
DDP/NCCL, one jitted train step is sharded over a 1-D device mesh ('data'
axis); gradient / BN-stat reductions are XLA collectives inserted from the
shardings.  Auto-resumes from the latest checkpoint in the log dir.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from streamingflow_tpu.config import get_cfg, get_parser
from streamingflow_tpu.data.dataloader import prepare_dataloaders
from streamingflow_tpu.parallel import make_data_parallel_step, make_mesh
from streamingflow_tpu.training import trainer as TR
from streamingflow_tpu.training.checkpoint import CheckpointManager, warm_start
from streamingflow_tpu.training.logging import MetricsLogger, SimpleProfiler


def run_validation(state, valloader, cfg, eval_fwd):
    """Epoch validation metrics (reference trainer.py:226-281 /
    validation_epoch_end): vehicle IoU (+pedestrian), panoptic PQ."""
    from streamingflow_tpu.postprocess import (
        predict_instance_segmentation_and_trajectories)
    from streamingflow_tpu.training.metrics import (IntersectionOverUnion,
                                                    PanopticMetric)
    n_classes = len(cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS)
    metric_vehicle = IntersectionOverUnion(n_classes)
    metric_panoptic = PanopticMetric(n_classes=n_classes)
    metric_ped = (IntersectionOverUnion(n_classes)
                  if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED else None)
    rf = cfg.TIME_RECEPTIVE_FIELD
    for batch_np in valloader:
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if isinstance(v, np.ndarray)}
        labels = TR.prepare_future_labels(batch, cfg)
        output = eval_fwd(state, batch)
        seg_pred = np.argmax(np.asarray(output['segmentation']), axis=-1)
        seg_label = np.asarray(labels['segmentation'])[..., 0]
        metric_vehicle.update(seg_pred[:, rf - 1:], seg_label[:, rf - 1:])
        if metric_ped is not None:
            ped_pred = np.argmax(np.asarray(output['pedestrian']), axis=-1)
            metric_ped.update(
                ped_pred[:, rf - 1:],
                np.asarray(labels['pedestrian'])[..., 0][:, rf - 1:])
        if cfg.INSTANCE_SEG.ENABLED:
            consistent = predict_instance_segmentation_and_trajectories(
                {k: np.asarray(v) for k, v in output.items()
                 if v is not None and k in ('segmentation', 'instance_center',
                                            'instance_offset',
                                            'instance_flow')})
            metric_panoptic.update(
                consistent[:, rf - 1:],
                np.asarray(labels['instance'])[:, rf - 1:])
    results = {'vehicle_iou': float(np.asarray(metric_vehicle.compute())[-1])}
    for k, v in metric_panoptic.compute().items():
        results[f'panoptic_{k}'] = float(np.asarray(v)[-1])
    if metric_ped is not None:
        results['pedestrian_iou'] = float(
            np.asarray(metric_ped.compute())[-1])
    return results


def main():
    args = get_parser().parse_args()
    cfg = get_cfg(args)

    trainloader, valloader = prepare_dataloaders(cfg)
    print(f'train batches: {len(trainloader)}  val batches: {len(valloader)}')

    mesh = make_mesh(batch_size=cfg.BATCHSIZE)
    print(f'data-parallel over {len(mesh.devices)} device(s)')
    first_batch = next(iter(trainloader))
    batch = {k: jnp.asarray(v) for k, v in first_batch.items()
             if isinstance(v, np.ndarray)}

    rng = jax.random.PRNGKey(42)
    state = TR.create_train_state(cfg, rng, batch)
    if cfg.PRETRAINED.LOAD_WEIGHTS:
        # single-frame warm start, decoder keys dropped (ref train.py:50-58)
        state, n = warm_start(state, cfg.PRETRAINED.PATH)
        print(f'warm start: loaded {n} tensors from {cfg.PRETRAINED.PATH} '
              '(decoder dropped)')
    step_fn = make_data_parallel_step(cfg, mesh, template=state)
    eval_fwd = jax.jit(lambda s, b: TR.eval_forward(s, b, cfg))

    save_dir = os.path.join(cfg.LOG_DIR, cfg.TAG, 'checkpoints')
    ckpt = CheckpointManager(save_dir)
    start_epoch = 0
    latest = ckpt.latest_step()
    if latest is not None:
        print(f'resuming from checkpoint step {latest}')
        state = ckpt.restore(state, latest)
        start_epoch = latest

    # fused-vector state for the hot loop (checkpoints/eval stay in the
    # portable tree layout): see trainer.PackedTrainState
    packed = TR.pack_train_state(state)

    logger = MetricsLogger(os.path.join(cfg.LOG_DIR, cfg.TAG))
    profiler = SimpleProfiler()

    global_step = 0
    for epoch in range(start_epoch, cfg.EPOCHS):
        t0 = time.time()
        for batch_np in trainloader:
            with profiler.span('host_to_device'):
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                         if isinstance(v, np.ndarray)}
            rng, step_rng = jax.random.split(rng)
            with profiler.span('train_step'):
                packed, metrics = step_fn(packed, batch, step_rng)
            global_step += 1
            if global_step % cfg.LOGGING_INTERVAL == 0 or global_step == 1:
                loss = float(metrics['total_loss'])
                # per-loss scalars each step (reference trainer.py:406-407)
                logger.scalars(metrics, global_step, prefix='step/')
                dt = time.time() - t0
                print(f'epoch {epoch} step {global_step} '
                      f'loss {loss:.4f} ({dt:.1f}s)', flush=True)
                # static-cap overflow is data loss — warn, don't be silent
                for k, v in metrics.items():
                    if (k.startswith('diag/') and
                            ('dropped' in k or 'cap_hit' in k)
                            and float(v) > 0):
                        print(f'WARNING: sparse-engine capacity event '
                              f'{k[5:]} = {int(v)} at step {global_step} — '
                              f'raise MODEL.SPARSE_ENCODER caps '
                              f'(tools/size_caps.py)', flush=True)
            if cfg.VIS_INTERVAL and global_step % cfg.VIS_INTERVAL == 0:
                # BEV prediction video (reference trainer.py:396-409)
                from streamingflow_tpu.utils.visualisation import \
                    visualise_output
                labels = TR.prepare_future_labels(batch, cfg)
                output = eval_fwd(TR.unpack_train_state(packed, state),
                                  batch)
                frames = visualise_output(
                    jax.device_get(labels), jax.device_get(output),
                    n_present=cfg.TIME_RECEPTIVE_FIELD)
                logger.video('train_outputs', frames, global_step)
        state = TR.unpack_train_state(packed, state)
        with profiler.span('checkpoint'):
            ckpt.save(epoch + 1, state, cfg)
        with profiler.span('validation'):
            val_metrics = run_validation(state, valloader, cfg, eval_fwd)
        logger.scalars(val_metrics, epoch + 1, prefix='val/')
        print('val ' + ' '.join(f'{k}={v:.4f}'
                                for k, v in val_metrics.items()), flush=True)
        # uncertainty-weight tracking (reference trainer.py:426-486)
        tw = state.params.get('task_weights', {})
        logger.scalars({k: 1.0 / (2.0 * np.exp(np.asarray(v)))
                        for k, v in tw.items()}, epoch + 1,
                       prefix='epoch_weight/')
        logger.flush()
        print(f'epoch {epoch} done in {time.time() - t0:.1f}s; '
              f'checkpoint saved')
    print(profiler.summary())


if __name__ == '__main__':
    main()
