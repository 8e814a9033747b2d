'''
Multi-chip scaling evidence without multi-chip hardware.

Two measurements on an N-virtual-device CPU mesh (the same environment
the driver's dryrun_multichip uses):

1. COMPILE-LEVEL: the sharded render's optimized HLO must contain ZERO
   cross-device collectives — rendering is communication-free by
   construction, so per-chip throughput is flat in mesh size up to
   whatever the interconnect-independent compute gives.  The train step
   must contain exactly the gradient/loss reductions and nothing else.
2. WALL-CLOCK weak-scaling proxy: fixed per-device film band, time
   render_sharded at N = 1, 2, 4, 8.  NOTE: on this host all virtual
   devices share the physical cores (2 here), so wall time grows once
   N exceeds the core count — the honest proxy is (1) plus the
   observation that per-band device time is constant; real chips are
   the only true test (BASELINE.md:34 targets >= 80% at 2 hosts).

Usage: python tools/scaling_proxy.py [--json out.json]
Each N runs in a subprocess (the device count is fixed at backend init).
'''

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(n):
    '''Measure one mesh size in a fresh process; prints a json line.'''
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/ptina_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
    jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    from ptina_tpu.scenes import cornell_box
    from ptina_tpu.film import new_film
    from ptina_tpu.parallel import make_mesh, render_sharded
    from ptina_tpu.parallel.sharding import _render_fn

    devices = jax.devices()[:n]
    assert len(devices) == n
    mesh = make_mesh(devices)
    band = 32          # rows per device (weak scaling)
    nx, ny = band * n, 64
    spp = 4
    scene = cornell_box()

    film = render_sharded(scene, new_film(nx, ny), 0, mesh, spp=spp)
    jax.block_until_ready(film)

    t0 = time.perf_counter()
    film = render_sharded(scene, new_film(nx, ny), 0, mesh, spp=spp)
    checksum = float(jnp.sum(film))
    dt = time.perf_counter() - t0

    # collective census of the optimized sharded-render HLO
    fn = _render_fn(mesh, nx, ny, spp)
    hlo = fn.lower(scene, film, jnp.asarray(0, jnp.int32)) \
            .compile().as_text()
    collectives = sum(hlo.count(op) for op in
                      ('all-reduce', 'all-gather', 'all-to-all',
                       'collective-permute', 'reduce-scatter'))
    print(json.dumps({
        'n_devices': n, 'rows_per_device': band, 'spp': spp,
        'wall_s': round(dt, 4),
        'pixel_samples_per_s': round(nx * ny * spp / dt),
        'render_collectives': collectives,
        'checksum_finite': checksum == checksum,
    }), flush=True)


def main():
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                            + f' --xla_force_host_platform_device_count={n}'
                            ).strip()
        out = subprocess.run(
            [sys.executable, __file__, '--one', str(n)],
            env=env, capture_output=True, text=True, cwd=REPO)
        line = out.stdout.strip().split('\n')[-1] if out.stdout else ''
        try:
            results.append(json.loads(line))
            print(line, flush=True)
        except json.JSONDecodeError:
            print(f'N={n} FAILED:\n{out.stderr[-2000:]}', file=sys.stderr)
            sys.exit(1)
    base = results[0]['pixel_samples_per_s']
    for r in results:
        r['weak_scaling_efficiency'] = round(
            r['pixel_samples_per_s'] / (base * 1.0), 3)
    summary = {'scaling_proxy': results,
               'note': 'virtual CPU devices share 2 physical cores; '
                       'render_collectives==0 is the load-bearing fact'}
    print(json.dumps(summary))
    if '--json' in sys.argv:
        path = sys.argv[sys.argv.index('--json') + 1]
        with open(path, 'w') as f:
            json.dump(summary, f, indent=1)


if __name__ == '__main__':
    if '--one' in sys.argv:
        run_one(int(sys.argv[sys.argv.index('--one') + 1]))
    else:
        main()
