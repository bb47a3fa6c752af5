"""Multi-process eval-result gather: the TPU-native analogue of the
reference's rank-gather of eval outputs
(mmdet3d/models/beverse/tools/multi_gpu_test.py:212-287) and Lightning's
summed metric states (streamingflow/metrics.py:32-35).

Spawns two REAL `jax.distributed` processes (CPU backend, Gloo collectives)
and checks `gather_across_processes` / `sum_across_processes` end-to-end —
not just the single-process identity fallback.
"""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(f'localhost:{port}', num_processes=2,
                               process_id=pid)
    import numpy as np
    sys.path.insert(0, sys.argv[3])
    from streamingflow_tpu.parallel.collect import (gather_across_processes,
                                                    sum_across_processes)
    from streamingflow_tpu.training.metrics import IntersectionOverUnion

    local = np.arange(4, dtype=np.float32) + 10.0 * (pid + 1)
    g = gather_across_processes(local)
    assert g.shape == (2, 4), g.shape
    np.testing.assert_array_equal(g[0], np.arange(4, dtype=np.float32) + 10.0)
    np.testing.assert_array_equal(g[1], np.arange(4, dtype=np.float32) + 20.0)

    s = sum_across_processes(local)
    np.testing.assert_array_equal(
        s, 2.0 * np.arange(4, dtype=np.float32) + 30.0)

    # metric states ride the same reduction: each process sees half the
    # batch; the summed state must equal the single-process global metric
    m = IntersectionOverUnion(2)
    pred = np.array([[pid, 1 - pid], [pid, pid]])[None, None]
    lab = np.array([[pid, pid], [1 - pid, pid]])[None, None]
    m.update(pred, lab)
    m.load_state(sum_across_processes(m.state()))
    glob = IntersectionOverUnion(2)
    for q in range(2):
        p = np.array([[q, 1 - q], [q, q]])[None, None]
        l = np.array([[q, q], [1 - q, q]])[None, None]
        glob.update(p, l)
    np.testing.assert_allclose(np.asarray(m.compute()),
                               np.asarray(glob.compute()))
    print(f'proc {pid} ok', flush=True)
""")


def test_two_process_gather(tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER)
    port = '29517'
    env = {k: v for k, v in os.environ.items()
           if 'XLA_FLAGS' not in k}  # no virtual-device flag in the children
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port, REPO],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc {pid} failed:\n{out}'
        assert f'proc {pid} ok' in out
