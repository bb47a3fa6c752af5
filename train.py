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
from streamingflow_tpu.training.checkpoint import CheckpointManager
from streamingflow_tpu.training.logging import MetricsLogger, SimpleProfiler


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
    step_fn = make_data_parallel_step(cfg, mesh)

    save_dir = os.path.join(cfg.LOG_DIR, cfg.TAG, 'checkpoints')
    ckpt = CheckpointManager(save_dir)
    start_epoch = 0
    latest = ckpt.latest_step()
    if latest is not None:
        print(f'resuming from checkpoint step {latest}')
        state = ckpt.restore(state, latest)
        start_epoch = latest

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
                state, metrics = step_fn(state, batch, step_rng)
            global_step += 1
            if global_step % cfg.LOGGING_INTERVAL == 0 or global_step == 1:
                loss = float(metrics['total_loss'])
                # per-loss scalars each step (reference trainer.py:406-407)
                logger.scalars(metrics, global_step, prefix='step/')
                dt = time.time() - t0
                print(f'epoch {epoch} step {global_step} '
                      f'loss {loss:.4f} ({dt:.1f}s)', flush=True)
        with profiler.span('checkpoint'):
            ckpt.save(epoch + 1, state, cfg)
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
