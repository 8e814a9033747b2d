'''
Test configuration: force the CPU platform with 8 virtual devices so the
whole suite (including multi-chip sharding tests) runs fast and without
TPU hardware.  Must run before jax is imported anywhere.
'''

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
