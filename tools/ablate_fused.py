'''
Ablation profile of the whole-path Pallas megakernel (engine/fused.py).

The megakernel is ONE fused Mosaic kernel, so xprof can't attribute time
inside it.  Instead each stage is ablated by monkeypatching the
module-global it is called through BEFORE tracing, and the full-kernel
time minus the ablated time bounds that stage's cost.  Results are
wall-clock over 32 samples at 512x512 (the bench shape), one warmup.

Run on the real TPU:  python tools/ablate_fused.py
'''

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/ptina_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')

import ptina_tpu.engine.fused as F
from ptina_tpu.utils.vec import V3
from ptina_tpu.scenes import cornell_box

RES, SPP = 512, 32


def time_variant(name, scene):
    n = RES * RES
    ii, jj = jnp.meshgrid(jnp.arange(RES), jnp.arange(RES), indexing='ij')
    from ptina_tpu.sampling.sobol import sample_dims
    from ptina_tpu.camera import camera_rays
    from ptina_tpu.engine.path import PATH_DIMS
    ii, jj = ii.reshape(-1), jj.reshape(-1)

    @jax.jit
    def step(s):
        u = sample_dims(s, ii, jj, PATH_DIMS)
        x = (ii.astype(jnp.float32) + u[0]) / RES * 2 - 1
        y = (jj.astype(jnp.float32) + u[1]) / RES * 2 - 1
        ro, rd = camera_rays(scene.cam_v2w, x, y)
        from ptina_tpu.sampling import wanghash2
        from ptina_tpu.sampling.sobol import sobol_block
        pt = sobol_block(s, PATH_DIMS)
        base = wanghash2(ii, jj)
        # the UNJITTED body: fused_trace's own jit caches its jaxpr across
        # outer traces, so monkeypatched stages would never re-trace
        rad = F.fused_trace.__wrapped__(scene, ro, rd, pt, base)
        return jnp.sum(rad.x) + jnp.sum(rad.y) + jnp.sum(rad.z)

    float(step(jnp.int32(0)))  # warmup/compile
    t0 = time.perf_counter()
    acc = 0.0
    outs = [step(jnp.int32(s)) for s in range(SPP)]
    acc = float(sum(outs))
    dt = time.perf_counter() - t0
    print(f'{name:<28}{dt / SPP * 1e3:>9.3f} ms/sample   '
          f'({SPP / dt:.0f} sps)  checksum={acc:.1f}', flush=True)
    return dt / SPP


def main():
    scene = cornell_box()
    orig_any = F._tile_cast_mint
    orig_closest = F._tile_cast_closest
    orig_sample = F.disney_sample
    orig_eval = F.disney_eval
    orig_lh = F._lights_hit_k
    orig_ls = F._lights_sample_k
    orig_fm = F._fetch_material_k

    full = time_variant('full kernel', scene)

    # no shadow cast: NEE treats everything unoccluded
    F._tile_cast_mint = lambda t5, ro, rd, avoid, o, z, i, **kw: \
        jnp.full(ro.x.shape, 1e6)
    time_variant('- shadow cast', scene)
    F._tile_cast_mint = orig_any

    # no disney_sample: bounce straight up with pdf 1
    def fake_sample(p, normal, sign, indir, su, sv, sw, zero=()):
        return normal, jnp.ones_like(su), p['basecolor']
    F.disney_sample = fake_sample
    time_variant('- disney_sample', scene)
    F.disney_sample = orig_sample

    # no disney_eval (NEE brdf): constant grey
    def fake_eval(p, normal, sign, indir, outdir, zero=()):
        t = jnp.full_like(sign, 0.1)
        return V3(t, t, t)
    F.disney_eval = fake_eval
    time_variant('- disney_eval', scene)
    F.disney_eval = orig_eval

    # no light queries
    def fake_lh(lt, count, ro, rd, kinds=None):
        z = jnp.zeros(ro.x.shape)
        return z > 1, z + 1e6, z, V3(z, z, z)

    def fake_ls(lt, count, hitpos, su, sv, sz, kinds=None):
        z = jnp.zeros(hitpos.x.shape)
        return z + 1e6, V3(z, z + 1, z), z + 1.0, V3(z + 1, z + 1, z + 1)
    F._lights_hit_k = fake_lh
    F._lights_sample_k = fake_ls
    time_variant('- light queries', scene)
    F._lights_hit_k = orig_lh
    F._lights_sample_k = orig_ls

    # no material table fetch: defaults row only
    def fake_fm(fac, mtlid, mtl_lanes=None, tr=None):
        from ptina_tpu.materials.disney import disney_derive
        from ptina_tpu.scene import MATERIAL_PARAMS
        sh = mtlid.shape
        base = V3(jnp.full(sh, 0.8), jnp.full(sh, 0.8), jnp.full(sh, 0.8))
        m1 = fac.shape[1]  # -1 would be a dynamic_slice inside Pallas
        scal = [jnp.broadcast_to(fac[3 + i, m1 - 1], sh)
                for i in range(11)]
        return base, scal
    F._fetch_material_k = fake_fm
    time_variant('- material fetch', scene)
    F._fetch_material_k = orig_fm

    # closest cast replaced by a fixed plane hit (floor-ish)
    def fake_closest(t5, attrs, ro, rd, avoid_lanes, ones1, zeros1, interp,
                     conds=None, key_ref=None, ext_ref=None):
        sh = ro.x.shape
        t = jnp.full(sh, 2.0)
        idx = jnp.zeros(sh, jnp.int32)
        idx_lanes = jnp.zeros((1, sh[0] * sh[1]), jnp.int32)
        zero = jnp.zeros(sh)
        a6 = [zero, zero, jnp.ones(sh), zero, zero, zero]
        a6_lanes = jnp.zeros((6, sh[0] * sh[1]))
        return t, idx, idx_lanes, a6, a6_lanes
    F._tile_cast_closest = fake_closest
    time_variant('- closest cast', scene)
    F._tile_cast_closest = orig_closest

    print(f'\nfull = {full * 1e3:.3f} ms; deltas above bound each stage.')


if __name__ == '__main__':
    main()
