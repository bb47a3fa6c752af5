"""Test harness: run everything on a virtual 8-device CPU mesh.

Sharding/pjit paths are validated without TPU hardware; the real chip is only
used by bench.py and the driver's compile checks.
"""
import os

if os.environ.get('TEST_ON_TPU', '0') != '1':
    os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_enable_x64', False)
