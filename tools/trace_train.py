"""Trace the flagship train step and print the top ops by self time.

    python tools/trace_train.py [n_points] [reps]

Used to attribute the round-4 train-step wall time (the first flagship
train step ever to run on one chip measured 52 s/step — ~1000x over the
FLOP bound — and this trace is how the offender is found)."""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 80000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from streamingflow_tpu.data import make_batch
    from streamingflow_tpu.training import trainer as TR

    cfg = bench.full_cfg()
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, batch_size=1, n_points=n_points).items()}
    state = TR.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = TR.make_train_step(cfg)

    print('compiling...', flush=True)
    lowered = jax.jit(
        lambda s, b, r: step(s, b, r), donate_argnums=0).lower(
        state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    try:
        mem = compiled.memory_analysis()
        print('memory:', mem, flush=True)
    except Exception as e:  # pragma: no cover
        print('memory_analysis unavailable:', e, flush=True)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    float(metrics['total_loss'])

    tdir = '/tmp/sf_trace_train'
    os.system(f'rm -rf {tdir}')
    with jax.profiler.trace(tdir):
        for i in range(reps):
            state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
        float(metrics['total_loss'])

    xplanes = glob.glob(f'{tdir}/**/*.xplane.pb', recursive=True)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xplanes, 'framework_op_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    out = '/tmp/sf_trace_train_opstats.json'
    with open(out, 'w') as f:
        f.write(data)
    print(f'wrote {out}')
    summarize(out, reps)


def summarize(path: str, reps: int):
    raw = open(path).read()
    # gviz json: {"byProgram": ...} or table rows; handle the common layout
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        print('could not parse; inspect', path)
        return
    rows = None
    if isinstance(d, dict) and 'rows' in d:
        rows = d['rows']
        cols = [c.get('label', c.get('id', '')) for c in d['cols']]
    elif isinstance(d, list) and d and isinstance(d[0], dict) and 'rows' in d[0]:
        rows = d[0]['rows']
        cols = [c.get('label', c.get('id', '')) for c in d[0]['cols']]
    if rows is None:
        print('unrecognised layout; keys:',
              list(d)[:10] if isinstance(d, dict) else type(d))
        return
    entries = []
    for r in rows:
        vals = [c.get('v') for c in r['c']]
        rec = dict(zip(cols, vals))
        entries.append(rec)
    key_time = next((k for k in entries[0]
                     if 'self' in k.lower() and 'time' in k.lower()), None)
    name_key = next((k for k in entries[0]
                     if 'operation' in k.lower() or 'name' in k.lower()), None)
    entries.sort(key=lambda e: -(e.get(key_time) or 0))
    tot = sum(e.get(key_time) or 0 for e in entries)
    print(f'total self time: {tot / 1e6 / reps:.1f} ms/step  '
          f'(cols: {key_time!r}, {name_key!r})')
    for e in entries[:25]:
        t = (e.get(key_time) or 0) / 1e6 / reps
        print(f'{t:10.2f} ms  {str(e.get(name_key))[:110]}')


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'summ':
        summarize(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 1)
    else:
        main()
