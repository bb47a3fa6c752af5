"""Benchmark: BEV forecasts/sec/chip (past 1 s -> future 2 s).

Runs the flagship-shape forward pass on the attached accelerator and prints
ONE JSON line.  Baseline target: >=10 forecasts/s/chip on TPU v5e
(BASELINE.md).  Preset via STREAMINGFLOW_BENCH_PRESET:

* ``full`` (default): reference dimensions — EfficientNet-B4 over 6 cameras
  at 224x480, spconv8x LiDAR at 0.0625 m over 1600^2x41, 200x200 BEV,
  variable-step GRU-ODE, 4 future frames at 0.5 s.
* ``tiny``: the CPU-testable miniature (smoke/debug).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def full_cfg():
    from streamingflow_tpu.config import Config
    cfg = Config()
    cfg.TIME_RECEPTIVE_FIELD = 3
    cfg.N_FUTURE_FRAMES = 4
    cfg.MODEL.MODALITY.USE_CAMERA = True
    cfg.MODEL.MODALITY.USE_LIDAR = True
    cfg.MODEL.FUTURE_PRED.USE_VARIABLE_ODE_STEP = True
    cfg.MODEL.IMPUTE = True
    cfg.MODEL.BEV_POOL_BACKEND = 'pallas_patch'
    cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED = False
    cfg.SEMANTIC_SEG.HDMAP.ENABLED = False
    cfg.PLANNING.ENABLED = False
    # 'pillar8x' (default) or 'spconv8x' — the exact sparse engine the
    # reference checkpoint maps onto (docs/PERF.md records both)
    cfg.MODEL.LIDAR.BACKBONE = os.environ.get(
        'STREAMINGFLOW_BENCH_BACKBONE', cfg.MODEL.LIDAR.BACKBONE)
    # sparse-engine sweep knobs (docs/PERF.md "tiled engine")
    se = cfg.MODEL.SPARSE_ENCODER
    se.ENGINE = os.environ.get('STREAMINGFLOW_BENCH_SPARSE_ENGINE', se.ENGINE)
    se.Z_FORMULATION = os.environ.get('STREAMINGFLOW_BENCH_ZFORM',
                                      se.Z_FORMULATION)
    if 'STREAMINGFLOW_BENCH_DENSE_FROM' in os.environ:
        # dense-tail entry stage (execution strategy only — the parameter
        # tree is engine-portable, so this does not change what model is
        # being trained).  Train at flagship scale fits HBM at 4 (stage 3
        # stays columnar: 2.3x smaller activations than the dense grid).
        se.DENSE_TAIL_FROM_STAGE = int(
            os.environ['STREAMINGFLOW_BENCH_DENSE_FROM'])
    if 'STREAMINGFLOW_BENCH_TILE_SHAPE' in os.environ:
        se.TILE_SHAPE = tuple(int(x) for x in os.environ[
            'STREAMINGFLOW_BENCH_TILE_SHAPE'].split(','))
    if os.environ.get('STREAMINGFLOW_BENCH_DTYPE', 'bf16') == 'bf16':
        # LiDAR ladder in bf16 while points stay fp32 (binning exactness)
        se.COMPUTE_DTYPE = 'bfloat16'
    return cfg


def _timed_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _probe_device(timeout_s: int = 180):
    """Fail fast if the accelerator backend is unreachable.

    On this platform a dead device tunnel makes ``jax.devices()`` hang
    forever with no output; probing in a subprocess with a hard timeout
    turns a silent multi-hour hang into an immediate, explicit error."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f'bench: device backend unreachable (jax.devices() did not '
              f'return within {timeout_s}s) — aborting instead of hanging',
              file=sys.stderr)
        raise SystemExit(1)
    if proc.returncode != 0:
        print('bench: device backend init failed:\n' + proc.stderr[-2000:],
              file=sys.stderr)
        raise SystemExit(1)


def _train_mode(cfg, n_points, reps):
    """One full optimisation step (fwd + bwd + clip + adam), donated state.

    Prints forecasts-trained/sec plus an MFU estimate from XLA's own cost
    analysis of the compiled step (VERDICT r2 item 8)."""
    import jax.numpy as jnp

    from streamingflow_tpu.data import make_batch
    from streamingflow_tpu.training import trainer as TR

    bsz = int(os.environ.get('STREAMINGFLOW_BENCH_BATCH', '1'))
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=bsz, n_points=n_points).items()}
    state = TR.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    if os.environ.get('STREAMINGFLOW_BENCH_DTYPE', 'bf16') == 'bf16':
        # params/opt state stay fp32 (optimizer math); inputs ride
        # COMPUTE_DTYPE inside the model
        pass
    # packed state: params/BN-stats/Adam moments as fused vectors — the
    # ~2,300-buffer tree state costs ~87 s/call of host dispatch on this
    # runtime (per-buffer cost scales with loaded-executable size);
    # packing returns the step to device-bound speed (docs/PERF.md)
    packed = TR.pack_train_state(state)
    jstep = TR.make_packed_train_step(cfg, state)

    lowered = jstep.lower(packed, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get('flops', 0.0)) if cost else 0.0

    packed, metrics = jstep(packed, batch, jax.random.PRNGKey(1))
    float(metrics['total_loss'])   # sync after compile+first step
    t0 = time.perf_counter()
    for i in range(reps):
        packed, metrics = jstep(packed, batch, jax.random.PRNGKey(2 + i))
    float(metrics['total_loss'])
    dt = (time.perf_counter() - t0) / reps
    # v5e peak: 197 TFLOP/s bf16 (394 int8); XLA reports fp equivalents
    mfu = flops / dt / 197e12 if flops else 0.0
    print(json.dumps({
        'metric': 'train forecasts/sec/chip (fwd+bwd+adam)',
        'value': round(1.0 / dt, 3),
        'unit': 'steps/s',
        'batch_size': bsz,
        'vs_baseline': round((1.0 / dt) / 10.0, 3),
        'step_flops': flops,
        'mfu_vs_197tf_bf16': round(mfu, 4),
        'mode': 'train',
        'backbone': cfg.MODEL.LIDAR.BACKBONE,
        'sparse_engine': cfg.MODEL.SPARSE_ENCODER.ENGINE,
        'z_formulation': cfg.MODEL.SPARSE_ENCODER.Z_FORMULATION,
        'bev_pool_backend': cfg.MODEL.BEV_POOL_BACKEND,
        'remat': cfg.MODEL.REMAT,
    }))


def main():
    if os.environ.get('STREAMINGFLOW_BENCH_SKIP_PROBE') != '1':
        _probe_device()
    preset = os.environ.get('STREAMINGFLOW_BENCH_PRESET', 'full')
    n_points = int(os.environ.get('STREAMINGFLOW_BENCH_POINTS', '80000'))
    reps = int(os.environ.get('STREAMINGFLOW_BENCH_REPS', '10'))

    from streamingflow_tpu.data import make_batch, tiny_config
    from streamingflow_tpu.models import StreamingFlow
    from streamingflow_tpu.training.trainer import batch_to_model_args

    if preset == 'tiny':
        from streamingflow_tpu.data import tiny_config
        cfg = tiny_config()
        cfg.MODEL.MODALITY.USE_LIDAR = True
        n_points = min(n_points, 2048)
    else:
        cfg = full_cfg()

    if os.environ.get('STREAMINGFLOW_BENCH_MODE') == 'train':
        _train_mode(cfg, n_points, reps)
        return

    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=1, n_points=n_points).items()}
    args = batch_to_model_args(batch, cfg)
    model = StreamingFlow(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        {'params': key, 'dropout': key, 'sample': key}, **args)

    # Mixed precision (reference ships PRECISION: 16,
    # configs/Prediction_LC_ODE_Variable.yml:6): run the forward in bf16.
    # Timestamps / camera geometry / POINTS stay fp32 (ODE step arithmetic
    # and voxel quantisation are precision-sensitive — bf16 ulp at 54 m
    # range exceeds the 0.0625 m voxel size); the LiDAR branch still runs
    # bf16 via SPARSE_ENCODER.COMPUTE_DTYPE (set in full_cfg), so dense
    # tensors and weights hit the MXU at full rate and HBM traffic halves.
    if os.environ.get('STREAMINGFLOW_BENCH_DTYPE', 'bf16') == 'bf16':
        def to_bf16(x):
            return (x.astype(jnp.bfloat16)
                    if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x)
        variables = jax.tree.map(to_bf16, variables)
        if args.get('image') is not None:
            args['image'] = to_bf16(args['image'])

    @jax.jit
    def forward(chain, a):
        out = model.apply(variables, **a,
                          rngs={'sample': jax.random.PRNGKey(0)})
        # scalar output, dependency-chained across reps: on remote/tunneled
        # device platforms block_until_ready can return before execution
        # completes, and a per-rep host readback would add its round-trip
        # latency to every rep.  Chaining forces sequential device
        # execution; ONE readback at the end syncs the whole run.
        return chain * 0.0 + jnp.sum(out['segmentation'].astype(jnp.float32))

    zero = jnp.zeros((), jnp.float32)
    # warmup / compile
    float(forward(zero, args))
    # host<->device scalar round-trip latency (subtracted from the run: the
    # loop pays it exactly once)
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(zero))
    rtt = min(_timed_once(lambda: float(tiny(zero))) for _ in range(3))
    t0 = time.perf_counter()
    s = zero
    for _ in range(reps):
        s = forward(s, args)
    float(s)
    dt = (time.perf_counter() - t0 - rtt) / reps
    value = 1.0 / dt

    # self-documenting configuration labels (VERDICT r3 item 10): what this
    # number measured — backbone, sparse engine, camera pool backend, mode.
    # Since round 4 the pallas_patch pool has a custom VJP and the model
    # remats, so the benched configuration IS a trainable configuration.
    print(json.dumps({
        'metric': 'BEV forecasts/sec/chip (past-1s->future-2s)',
        'value': round(value, 3),
        'unit': 'forecasts/s',
        'vs_baseline': round(value / 10.0, 3),
        'mode': 'forward',
        'backbone': cfg.MODEL.LIDAR.BACKBONE,
        'sparse_engine': cfg.MODEL.SPARSE_ENCODER.ENGINE,
        'z_formulation': cfg.MODEL.SPARSE_ENCODER.Z_FORMULATION,
        'bev_pool_backend': cfg.MODEL.BEV_POOL_BACKEND,
    }))


if __name__ == '__main__':
    main()
