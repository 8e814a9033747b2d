'''
Component-level TPU profile of one progressive sample.

Times each stage of the wavefront pipeline in isolation on the real
device (cornell, 512x512) so perf work targets the actual wall, not a
guess.  Run:  python tools/profile_tpu.py [--scene cornell_monkey]

Uses utils.trace.timed; pass --xprof to also dump an xprof trace.
'''

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/ptina_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')

from ptina_tpu.utils.trace import timed, timings, log, profile_trace
from ptina_tpu.utils.vec import V3
from ptina_tpu import scenes
from ptina_tpu.film import new_film
from ptina_tpu.camera import camera_rays
from ptina_tpu.sampling.sobol import sample_dims
from ptina_tpu.intersect.dispatch import cast_any, cast_shaded
from ptina_tpu.lights import lights_hit, lights_sample
from ptina_tpu.mtllib import fetch_material
from ptina_tpu.materials.disney import disney_eval, disney_sample
from ptina_tpu.engine.path import render_sample, render, PATH_DIMS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', default='cornell_box')
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--xprof', action='store_true')
    args = ap.parse_args()

    scene = getattr(scenes, args.scene)()
    res = args.res
    n = res * res
    film = new_film(res, res)
    log('Profile', f'scene={args.scene} faces={scene.tri_w2b.shape[0]} '
        f'res={res} backend={jax.default_backend()}')

    ii, jj = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing='ij')
    ii, jj = ii.reshape(-1), jj.reshape(-1)

    f_dims = jax.jit(lambda s: sample_dims(s, ii, jj, PATH_DIMS))
    u = f_dims(0)

    f_rays = jax.jit(lambda u: camera_rays(
        scene.cam_v2w,
        (ii.astype(jnp.float32) + u[0]) / res * 2 - 1,
        (jj.astype(jnp.float32) + u[1]) / res * 2 - 1))
    ro, rd = f_rays(u)
    avoid = jnp.full((n,), -1, jnp.int32)

    f_cast = jax.jit(lambda ro, rd: cast_shaded(scene, ro, rd, avoid))
    hit, normal, ts, tt, mtl = f_cast(ro, rd)
    hitpos = ro + rd * hit.t

    f_any = jax.jit(lambda ro, rd: cast_any(ro, rd, scene.tri_w2b,
                                            avoid, jnp.full((n,), 10.0)))
    occ = f_any(hitpos, rd)

    def shade_only(u, normal, sign, rd, ts, tt, mtl):
        li = lights_sample(scene.lights, hitpos, u[2], u[3], u[4])
        mat = fetch_material(scene, mtl, ts, tt)
        ev = disney_eval(mat, normal, sign, -rd, li['dir'])
        out, pdf, col = disney_sample(mat, normal, sign, -rd,
                                      u[5], u[6], u[7])
        lh = lights_hit(scene.lights, hitpos, out)
        return ev, out, pdf, col, lh['pdf']

    sign = jnp.abs(jnp.ones((n,)))
    f_shade = jax.jit(shade_only)
    r = f_shade(u, normal, sign, rd, ts, tt, mtl)

    f_sample = jax.jit(lambda f: render_sample(scene, f, 0))
    film2 = f_sample(film)

    def run(name, fn, *a):
        fn(*a)  # warm
        for _ in range(args.reps):
            with timed(name, quiet=True) as box:
                box['sync'] = fn(*a)

    run('sobol_dims', f_dims, 1)
    run('camera_rays', f_rays, u)
    run('cast_shaded', f_cast, ro, rd)
    run('cast_any', f_any, hitpos, rd)
    run('shade_nee_sample', f_shade, u, normal, sign, rd, ts, tt, mtl)
    run('render_sample(full)', f_sample, film)
    run('render(spp=4)/4', lambda f: render(scene, f, 0, spp=4), film)

    print(f'\n{"stage":<24}{"ms (min over reps)":>20}')
    full = min(timings['render_sample(full)'])
    for name, ts_ in timings.items():
        ms = min(ts_) * 1e3
        if name == 'render(spp=4)/4':
            ms /= 4
        print(f'{name:<24}{ms:>18.3f}  ({ms / (full * 1e3) * 100:5.1f}% of sample)')
    bounce_est = (min(timings['cast_shaded']) + min(timings['cast_any'])
                  + min(timings['shade_nee_sample'])) * 1e3
    print(f'{"5x(cast+any+shade)":<24}{bounce_est * 5:>18.3f}')

    if args.xprof:
        with profile_trace('/tmp/ptina_trace'):
            jax.block_until_ready(f_sample(film))


if __name__ == '__main__':
    main()
