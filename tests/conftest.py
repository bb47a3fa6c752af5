"""Test harness: run everything on a virtual 8-device CPU mesh.

Sharding/pjit paths are validated without TPU hardware; the real chip is only
used by bench.py and the driver's compile checks.

Tiers:
  SF_FAST_TESTS=1   skip the two multi-minute compile-bound tests
                    (planning train step, engine-gradient agreement)
  SF_HEAVY_TESTS=1  additionally run the full-model spconv8x multichip
                    proof (tests/test_multichip.py)
"""
import os

if os.environ.get('TEST_ON_TPU', '0') != '1':
    os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if os.environ.get('TEST_ON_TPU', '0') != '1':
    # A sitecustomize-registered accelerator plugin may have force-updated
    # jax_platforms at interpreter startup; the env var alone is not enough.
    # Re-pin to CPU after importing jax (backends initialise lazily).
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

# Persistent compilation cache: the end-to-end train-step compiles are the
# dominant test cost; cache them across runs.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', os.path.join(
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
