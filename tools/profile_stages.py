"""Per-stage wall-time profiling of the flagship model on the attached chip.

Times each branch of StreamingFlow independently (camera encoder+lift-splat,
LiDAR sparse engine, temporal models, GRU-ODE, decoder) the way SURVEY.md §5
prescribes (block_until_ready spans).  Usage:

    python tools/profile_stages.py [--preset full|tiny] [--reps 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='full')
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--points', type=int, default=80000)
    ap.add_argument('--bf16', action='store_true',
                    help='cast weights/inputs to bf16 like bench.py')
    args = ap.parse_args()

    from bench import full_cfg
    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.models import StreamingFlow
    from streamingflow_tpu.training.trainer import batch_to_model_args

    cfg = full_cfg() if args.preset == 'full' else tiny_config()
    if args.preset == 'tiny':
        cfg.MODEL.MODALITY.USE_LIDAR = True
        args.points = min(args.points, 2048)

    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=1, n_points=args.points).items()}
    margs = batch_to_model_args(batch, cfg)
    model = StreamingFlow(cfg)
    key = jax.random.PRNGKey(0)
    print('init...', flush=True)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(
        {'params': key, 'dropout': key, 'sample': key}, **margs)
    jax.block_until_ready(variables)
    print(f'init done in {time.perf_counter() - t0:.1f}s', flush=True)

    if args.bf16:
        def to_bf16(v):
            return (v.astype(jnp.bfloat16)
                    if hasattr(v, 'dtype') and v.dtype == jnp.float32 else v)
        variables = jax.tree.map(to_bf16, variables)
        for k in ('image', 'points'):
            if margs.get(k) is not None:
                margs[k] = to_bf16(margs[k])

    rf = cfg.TIME_RECEPTIVE_FIELD

    # host<->device scalar round-trip latency: on tunneled device platforms
    # block_until_ready can return before execution completes, so the only
    # reliable sync is a scalar readback — whose fixed RTT must be paid once
    # per measurement, not once per rep (reps are dependency-chained).
    tiny = jax.jit(lambda s: s + 1.0)
    zero = jnp.zeros((), jnp.float32)
    float(tiny(zero))
    rtt = min((lambda t0: (float(tiny(zero)), time.perf_counter() - t0))(
        time.perf_counter())[1] for _ in range(3))
    print(f'readback rtt {rtt * 1e3:.1f} ms', flush=True)

    def timed(name, fn, *a):
        jfn = jax.jit(fn)
        jchain = jax.jit(lambda s, *a: s * 0.0 + jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), jfn(*a), 0.0))
        t0 = time.perf_counter()
        out = jax.block_until_ready(jfn(*a))
        compile_s = time.perf_counter() - t0
        float(jchain(zero, *a))
        t0 = time.perf_counter()
        s = zero
        for _ in range(args.reps):
            s = jchain(s, *a)
        float(s)
        run_s = (time.perf_counter() - t0 - rtt) / args.reps
        print(f'{name:28s} compile {compile_s:7.1f}s   run {run_s * 1e3:9.2f} ms',
              flush=True)
        return out

    # camera branch
    if cfg.MODEL.MODALITY.USE_CAMERA:
        def cam(img, intr, extr, ego):
            return model.apply(
                variables,
                img[:, :rf], intr[:, :rf], extr[:, :rf], ego[:, :rf], False,
                method=StreamingFlow.calculate_birds_eye_view_features,
                rngs={'sample': key})
        bev, _, _ = timed('camera: encode+lift-splat', cam, margs['image'],
                          margs['intrinsics'], margs['extrinsics'],
                          margs['future_egomotion'])

        def cam_temporal(x):
            return model.apply(
                variables, x, False,
                method=lambda m, x, train: m.temporal_model(x, train=train),
                rngs={'sample': key})
        # temporal model input needs egopose channels appended
        if cfg.MODEL.TEMPORAL_MODEL.INPUT_EGOPOSE:
            b, s, h, w, _ = bev.shape
            bev_in = jnp.concatenate(
                [bev, jnp.zeros((b, s, h, w, 6), bev.dtype)], axis=-1)
        else:
            bev_in = bev
        cam_states = timed('camera: temporal model', cam_temporal, bev_in)

    # lidar branch
    if cfg.MODEL.MODALITY.USE_LIDAR:
        def lidar(points):
            return model.apply(
                variables, points, False,
                method=lambda m, p, train: m.lidar_encoder(p, train=train),
                rngs={'sample': key})
        feat = timed('lidar: voxelize+sparse conv', lidar, margs['points'])

        def lidar_temporal(x):
            return model.apply(
                variables, x, False,
                method=lambda m, x, train: m.temporal_model_lidar(
                    m.lidar_reduce(x) if m.lidar_pre_reduce else x,
                    train=train),
                rngs={'sample': key})
        lidar_states = timed('lidar: temporal model', lidar_temporal, feat)

    # future prediction (ODE)
    states = cam_states if cfg.MODEL.MODALITY.USE_CAMERA else lidar_states

    def ode(present, cam_s, lid_s):
        return model.apply(
            variables, present, cam_s, margs['camera_timestamp'], lid_s,
            margs['lidar_timestamp'], margs['target_timestamp'], False,
            method=lambda m, p, cs, ct, ls, lt, tt, train:
                m.future_prediction(p, cs, ct, ls, lt, tt, train=train),
            rngs={'sample': key})
    fut = timed('gru-ode future prediction', ode, states[:, -1:],
                cam_states if cfg.MODEL.MODALITY.USE_CAMERA else None,
                lidar_states if cfg.MODEL.MODALITY.USE_LIDAR else None)

    def dec(x):
        return model.apply(
            variables, x, False,
            method=lambda m, x, train: m.decoder(x, train=train),
            rngs={'sample': key})
    timed('decoder', dec, fut)

    # full forward for reference
    def full(a):
        return model.apply(variables, **a, rngs={'sample': key})['segmentation']
    timed('FULL forward', full, margs)


if __name__ == '__main__':
    main()
