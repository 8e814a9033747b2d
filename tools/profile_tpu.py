'''
Component-level TPU profile of one progressive sample.

The device sits behind a tunnel: a single dispatch+sync round trip costs
~24 ms here, swamping any per-stage timing.  So every stage is iterated
K times inside ONE jitted lax.fori_loop (with a data dependency between
iterations so nothing folds away), and per-iteration cost is
(loop_time - overhead) / K.

Run:  python tools/profile_tpu.py [--scene cornell_monkey] [--xprof]
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
    ap.add_argument('--iters', type=int, default=32, help='loop trips per stage')
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--xprof', action='store_true')
    args = ap.parse_args()
    K = args.iters

    scene = getattr(scenes, args.scene)()
    res = args.res
    n = res * res
    log('Profile', f'scene={args.scene} faces={scene.tri_w2b.shape[0]} '
        f'res={res} backend={jax.default_backend()} iters={K}')

    ii, jj = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing='ij')
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    u0 = jax.jit(lambda: sample_dims(0, ii, jj, PATH_DIMS))()
    ro0, rd0 = jax.jit(lambda u: camera_rays(
        scene.cam_v2w,
        (ii.astype(jnp.float32) + u[0]) / res * 2 - 1,
        (jj.astype(jnp.float32) + u[1]) / res * 2 - 1))(u0)
    avoid0 = jnp.full((n,), -1, jnp.int32)
    hit0, normal0, ts0, tt0, mtl0 = jax.jit(
        lambda: cast_shaded(scene, ro0, rd0, avoid0))()
    hitpos0 = ro0 + rd0 * hit0.t
    sign0 = jnp.ones((n,))

    # Each stage: body(carry_scalar) -> carry_scalar with a real data dep.
    def dep(x):
        '''Cheap scalar data dependency from any array/pytree.'''
        leaves = jax.tree.leaves(x)
        acc = jnp.float32(0)
        for l in leaves:
            acc = acc + jnp.asarray(l).ravel()[0].astype(jnp.float32)
        return acc * 1e-30

    stages = {}

    def sobol_body(c):
        u = sample_dims(c.astype(jnp.int32), ii, jj, PATH_DIMS)
        return c + dep(u)
    stages['sobol_dims(32)'] = sobol_body

    def camera_body(c):
        ro, rd = camera_rays(scene.cam_v2w,
                             (ii.astype(jnp.float32) + c) / res * 2 - 1,
                             (jj.astype(jnp.float32)) / res * 2 - 1)
        return c + dep((ro, rd))
    stages['camera_rays'] = camera_body

    def cast_body(c):
        ro = V3(ro0.x + c * 1e-12, ro0.y, ro0.z)
        hit, nrm, s, t, m = cast_shaded(scene, ro, rd0, avoid0)
        return c + dep((hit.t, nrm.x))
    stages['cast_shaded'] = cast_body

    def any_body(c):
        ro = V3(hitpos0.x + c * 1e-12, hitpos0.y, hitpos0.z)
        occ = cast_any(ro, rd0, scene.tri_w2b, hit0.index,
                       jnp.full((n,), 10.0))
        return c + dep(occ.astype(jnp.float32))
    stages['cast_any'] = any_body

    def lights_body(c):
        lh = lights_hit(scene.lights, ro0, rd0)
        li = lights_sample(scene.lights, hitpos0, u0[2] + c * 1e-12,
                           u0[3], u0[4])
        return c + dep((lh['pdf'], li['pdf']))
    stages['lights_hit+sample'] = lights_body

    def mat_body(c):
        mat = fetch_material(scene, mtl0, ts0 + c * 1e-12, tt0)
        return c + dep(mat['basecolor'].x)
    stages['fetch_material'] = mat_body

    def disney_body(c):
        mat = fetch_material(scene, mtl0, ts0, tt0)
        ev = disney_eval(mat, normal0, sign0, -1.0 * rd0, rd0)
        out, pdf, col = disney_sample(mat, normal0, sign0, -1.0 * rd0,
                                      u0[5] + c * 1e-12, u0[6], u0[7])
        return c + dep((ev.x, pdf, col.x))
    stages['material+disney'] = disney_body

    def sample_body(c):
        f = render_sample(scene, new_film(res, res) + c * 1e-30, 0)
        return c + dep(f)
    stages['render_sample(full)'] = sample_body

    def null_body(c):
        return c + 1e-30
    stages['(dispatch overhead)'] = null_body

    results = {}
    for name, body in stages.items():
        k = 1 if name == '(dispatch overhead)' else K

        @jax.jit
        def looped(c, body=body, k=k):
            return jax.lax.fori_loop(0, k, lambda i, cc: body(cc), c)

        looped(jnp.float32(0)).block_until_ready()  # compile
        best = float('inf')
        for _ in range(args.reps):
            with timed(name, quiet=True) as box:
                box['sync'] = looped(jnp.float32(0))
            best = min(best, timings[name][-1])
        results[name] = best

    over = results['(dispatch overhead)']
    full = (results['render_sample(full)'] - over) / K
    print(f'\n{"stage":<24}{"ms/iter":>12}{"% of sample":>14}')
    for name, t in results.items():
        if name == '(dispatch overhead)':
            print(f'{name:<24}{t * 1e3:>12.3f}{"":>14}')
            continue
        ms = (t - over) / K * 1e3
        print(f'{name:<24}{ms:>12.3f}{ms / (full * 1e3) * 100:>13.1f}%')
    bounce = sum((results[k] - over) / K for k in
                 ('cast_shaded', 'cast_any', 'lights_hit+sample',
                  'material+disney'))
    print(f'{"5x(bounce parts)":<24}{bounce * 5 * 1e3:>12.3f}'
          f'{bounce * 5 / full * 100:>13.1f}%')

    if args.xprof:
        f = jax.jit(lambda c: jax.lax.fori_loop(
            0, 4, lambda i, cc: sample_body(cc), c))
        f(jnp.float32(0)).block_until_ready()
        with profile_trace('/tmp/ptina_trace'):
            jax.block_until_ready(f(jnp.float32(0)))


if __name__ == '__main__':
    main()
