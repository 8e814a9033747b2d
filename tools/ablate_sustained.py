'''
Sustained-throughput ablation of the megakernel, one variant per
PROCESS (monkeypatching after a jit compile does not retrace — jit
caches by function identity; and the tunnel's per-process dispatch
latency varies wildly, so only long sustained runs in fresh processes
compare cleanly).

Usage:  python tools/ablate_sustained.py            # runs all variants
        python tools/ablate_sustained.py <variant>  # one, in-process
'''

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

VARIANTS = ['full', 'no_sample', 'no_eval', 'no_lights', 'no_fetch',
            'no_closest', 'no_shadow', 'no_casts', 'shell']

RES, SPP = 512, 320


def apply(variant):
    import jax.numpy as jnp
    import ptina_tpu.engine.fused as F
    from ptina_tpu.utils.vec import V3

    if variant in ('no_sample', 'shell'):
        def fake_sample(p, normal, sign, indir, su, sv, sw, zero=None):
            return normal, jnp.ones_like(su), p['basecolor']
        F.disney_sample = fake_sample
    if variant in ('no_eval', 'shell'):
        def fake_eval(p, normal, sign, indir, outdir, zero=None):
            t = jnp.full_like(sign, 0.1)
            return V3(t, t, t)
        F.disney_eval = fake_eval
    if variant in ('no_lights', 'shell'):
        def fake_lh(lt, count, ro, rd):
            z = jnp.zeros(ro.x.shape)
            return z > 1, z + 1e6, z, V3(z, z, z)

        def fake_ls(lt, count, hitpos, su, sv, sz):
            z = jnp.zeros(hitpos.x.shape)
            return z + 1e6, V3(z, z + 1, z), z + 1.0, V3(z + 1, z + 1, z + 1)
        F._lights_hit_k = fake_lh
        F._lights_sample_k = fake_ls
    if variant in ('no_fetch', 'shell'):
        def fake_fm(fac, mtlid, mtl_lanes, tr):
            sh = (mtl_lanes.shape[1] // tr, tr)
            m1 = fac.shape[1]
            base = V3(jnp.full(sh, 0.8), jnp.full(sh, 0.8), jnp.full(sh, 0.8))
            scal = [jnp.broadcast_to(fac[3 + i, m1 - 1], sh)
                    for i in range(11)]
            return base, scal
        F._fetch_material_k = fake_fm
    if variant in ('no_closest', 'no_casts', 'shell'):
        def fake_closest(t5, attrs, ro, rd, avoid_lanes, o, z, interp):
            sh = ro.x.shape
            t = jnp.full(sh, 2.0)
            idx = jnp.zeros(sh, jnp.int32)
            idx_lanes = jnp.zeros((1, sh[0] * sh[1]), jnp.int32)
            zero = jnp.zeros(sh)
            a6 = [zero, zero, jnp.ones(sh), zero, zero, zero]
            a6_lanes = jnp.zeros((6, sh[0] * sh[1]))
            return t, idx, idx_lanes, a6, a6_lanes
        F._tile_cast_closest = fake_closest
    if variant in ('no_shadow', 'no_casts', 'shell'):
        F._tile_cast_mint = lambda t5, ro, rd, avoid, o, z, i: \
            jnp.full(ro.x.shape, 1e6)


def run_one(variant):
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/ptina_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
    jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')
    apply(variant)
    from ptina_tpu.scenes import cornell_box
    from ptina_tpu.film import new_film
    from ptina_tpu.engine.path import render
    scene = cornell_box()
    film = new_film(RES, RES)
    film = render(scene, film, 0, spp=16)
    float(jnp.sum(film))
    film = new_film(RES, RES)
    t0 = time.perf_counter()
    film = render(scene, film, 0, spp=SPP)
    float(jnp.sum(film))
    dt = time.perf_counter() - t0
    print(f'{variant:<12}{dt / SPP * 1e3:8.3f} ms/sample  '
          f'({SPP / dt:.0f} sps sustained)', flush=True)


def main():
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    for v in VARIANTS:
        r = subprocess.run([sys.executable, __file__, v],
                           capture_output=True, text=True, timeout=900)
        out = [l for l in r.stdout.splitlines() if 'ms/sample' in l]
        print(out[0] if out else f'{v}: FAILED\n{r.stderr[-500:]}',
              flush=True)


if __name__ == '__main__':
    main()
