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

# Persistent compilation cache: the suite is compile-dominated (every
# engine variant traces a 5-bounce wavefront graph), so cache compiled
# executables across test processes and reruns.
jax.config.update('jax_compilation_cache_dir', '/tmp/ptina_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')
