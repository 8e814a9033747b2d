'''
The fused whole-path megakernel (engine/fused.py) must agree with the
wavefront integrator (engine/path.py) ray-for-ray: same uniforms in,
same radiance out.  On CPU the kernel runs in Pallas interpret mode;
on a real TPU the compiled kernel is covered by the same comparison
(tools/profile_tpu.py and bench.py exercise it there).
'''

import numpy as np
import jax
import jax.numpy as jnp

from ptina_tpu.scenes import cornell_box
from ptina_tpu.engine.path import path_trace, PATH_DIMS
from ptina_tpu.engine.fused import fused_trace, fused_eligible
from ptina_tpu.sampling import wanghash2
from ptina_tpu.sampling.sobol import sample_dims, sobol_block
from ptina_tpu.camera import camera_rays


def _primary(scene, res):
    '''Primary rays plus BOTH random-stream forms: the wavefront's
    materialized uniforms and the megakernel's (sobol point, pixel
    hash) pair that generates the same stream in-kernel.'''
    ii, jj = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing='ij')
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    u = sample_dims(0, ii, jj, PATH_DIMS)
    x = (ii.astype(jnp.float32) + u[0]) / res * 2.0 - 1.0
    y = (jj.astype(jnp.float32) + u[1]) / res * 2.0 - 1.0
    ro, rd = camera_rays(scene.cam_v2w, x, y)
    pt = sobol_block(0, PATH_DIMS)
    base = wanghash2(ii, jj)
    return ro, rd, u, pt, base


def test_fused_matches_wavefront():
    scene = cornell_box()
    res = 16
    ro, rd, u, pt, base = _primary(scene, res)
    interpret = jax.default_backend() != 'tpu'
    rad_f = fused_trace(scene, ro, rd, pt, base, interpret=interpret)
    rad_w = path_trace(scene, ro, rd, u)
    a = np.stack([np.asarray(rad_f.x), np.asarray(rad_f.y),
                  np.asarray(rad_f.z)])
    b = np.stack([np.asarray(rad_w.x), np.asarray(rad_w.y),
                  np.asarray(rad_w.z)])
    assert np.isfinite(a).all()
    # The kernels compute t/u/v with different roundings (Plücker matmul
    # + Newton reciprocal vs exact division), and 1-2 ulp differences
    # amplify chaotically over 5 bounces when a path grazes an edge —
    # a small fraction of PATHS legitimately diverges while the
    # estimator (the mean) agrees tightly.
    d = np.abs(a - b).max(axis=0)
    assert (d < 1e-3).mean() > 0.95, f'{(d >= 1e-3).mean():.3f} paths differ'
    assert abs(a.mean() - b.mean()) < 2e-3 * max(b.mean(), 1e-6)


def test_fused_primary_matches_wavefront():
    '''The fully-fused production entry (fused_trace_primary: camera
    rays, lens jitter and the whole bounce stream generated in-kernel)
    must agree with the wavefront integrator fed the SAME Sobol/
    rotation streams built on the XLA side.'''
    from ptina_tpu.engine.fused import fused_trace_primary
    scene = cornell_box()
    res = 16
    ro, rd, u, pt, base = _primary(scene, res)
    interpret = jax.default_backend() != 'tpu'
    rad_f = fused_trace_primary(scene, pt, res, res, interpret=interpret)
    rad_w = path_trace(scene, ro, rd, u)
    a = np.stack([np.asarray(rad_f.x), np.asarray(rad_f.y),
                  np.asarray(rad_f.z)])
    b = np.stack([np.asarray(rad_w.x), np.asarray(rad_w.y),
                  np.asarray(rad_w.z)])
    assert np.isfinite(a).all()
    d = np.abs(a - b).max(axis=0)
    assert (d < 1e-3).mean() > 0.95, f'{(d >= 1e-3).mean():.3f} paths differ'
    assert abs(a.mean() - b.mean()) < 2e-3 * max(b.mean(), 1e-6)


def test_fused_primary_tiles_compose():
    '''Film tiling through the in-kernel ray generator: two half-frame
    renders at (x0=0 / x0=res/2) must reproduce the full frame exactly
    (the offsets are TRACED SMEM inputs — the sharded render feeds
    axis_index-derived offsets).'''
    from ptina_tpu.engine.fused import fused_trace_primary
    scene = cornell_box()
    res = 16
    _, _, _, pt, _ = _primary(scene, res)
    interpret = jax.default_backend() != 'tpu'
    full = fused_trace_primary(scene, pt, res, res, interpret=interpret)
    top = fused_trace_primary(scene, pt, res // 2, res,
                              x0=jnp.asarray(0), fnx=res, fny=res,
                              interpret=interpret)
    bot = fused_trace_primary(scene, pt, res // 2, res,
                              x0=jnp.asarray(res // 2), fnx=res, fny=res,
                              interpret=interpret)
    for c in 'xyz':
        whole = np.asarray(getattr(full, c))
        halves = np.concatenate([np.asarray(getattr(top, c)),
                                 np.asarray(getattr(bot, c))])
        np.testing.assert_array_equal(whole, halves)


def test_fused_uniforms_matches_wavefront():
    '''The explicit-uniforms megakernel entry (MLT chain replay,
    fused_trace_uniforms) must reproduce path_trace on the SAME uniform
    block — no Sobol regeneration involved, so the streams are
    identical and only cast/shading rounding differs.'''
    from ptina_tpu.engine.fused import fused_trace_uniforms
    scene = cornell_box()
    res = 16
    ro, rd, u, pt, base = _primary(scene, res)
    interpret = jax.default_backend() != 'tpu'
    rad_f = fused_trace_uniforms(scene, ro, rd, u, interpret=interpret)
    rad_w = path_trace(scene, ro, rd, u)
    a = np.stack([np.asarray(rad_f.x), np.asarray(rad_f.y),
                  np.asarray(rad_f.z)])
    b = np.stack([np.asarray(rad_w.x), np.asarray(rad_w.y),
                  np.asarray(rad_w.z)])
    assert np.isfinite(a).all()
    d = np.abs(a - b).max(axis=0)
    assert (d < 1e-3).mean() > 0.95, f'{(d >= 1e-3).mean():.3f} paths differ'
    assert abs(a.mean() - b.mean()) < 2e-3 * max(b.mean(), 1e-6)


def test_fused_eligibility_gates():
    scene = cornell_box()
    # eligibility is a static trace-time property
    on_tpu = jax.default_backend() == 'tpu'
    assert fused_eligible(scene) == on_tpu


def _bench_texture():
    return (np.linspace(0, 1, 64 * 64, dtype=np.float32)
            .reshape(64, 64, 1) * np.ones((1, 1, 3), np.float32))


def test_fused_textured_matches_wavefront():
    '''The in-kernel weight-matmul texture fetch (engine/fused.py
    _tex_bilinear_k) must reproduce the wavefront's gather-based
    sample_texture: same textured cornell, same uniforms, same radiance
    (up to the fetch's bf16 matmul rounding).'''
    scene = cornell_box(textured_image=_bench_texture())
    assert scene.materials.textured == ((0, 0, 0),)
    res = 16
    ro, rd, u, pt, base = _primary(scene, res)
    interpret = jax.default_backend() != 'tpu'
    rad_f = fused_trace(scene, ro, rd, pt, base, interpret=interpret)
    rad_w = path_trace(scene, ro, rd, u)
    a = np.stack([np.asarray(rad_f.x), np.asarray(rad_f.y),
                  np.asarray(rad_f.z)])
    b = np.stack([np.asarray(rad_w.x), np.asarray(rad_w.y),
                  np.asarray(rad_w.z)])
    assert np.isfinite(a).all()
    # same tolerance rationale as test_fused_matches_wavefront, plus the
    # texture weight matmul's bf16-truncated bilinear weights (~2^-8)
    d = np.abs(a - b) / np.maximum(np.abs(b), 0.05)
    assert (d.max(axis=0) < 2e-2).mean() > 0.95, \
        f'{(d.max(axis=0) >= 2e-2).mean():.3f} paths differ'
    assert abs(a.mean() - b.mean()) < 1e-2 * max(b.mean(), 1e-6)


def test_fused_env_texture_matches_wavefront():
    '''The megakernel's in-VMEM equirect environment fetch must match
    the wavefront's world_at (reference WorldLight.at semantics incl.
    the blender swizzle): an open scene where most paths escape to a
    textured sky.'''
    from ptina_tpu.scene import make_scene

    h, w = 16, 32
    ty = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    tx = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
    env = np.concatenate([0.2 + 0.8 * ty + 0 * tx,
                          0.1 + 0.5 * tx + 0 * ty,
                          0.6 - 0.4 * ty + 0 * tx], axis=2)
    # one floor quad; everything else escapes to the sky
    verts = np.zeros((6, 8), np.float32)
    verts[:, 0:3] = [[-3, 0, 3], [3, 0, 3], [3, 0, -3],
                     [-3, 0, 3], [3, 0, -3], [-3, 0, -3]]
    verts[:, 4] = 1.0  # +y normals
    scene = make_scene(verts, images=[env.astype(np.float32)],
                       world_tex=0, world_fac=(1.0, 1.0, 1.0, 1.0))
    assert scene.world_textured

    res = 16
    ro, rd, u, pt, base = _primary(scene, res)
    interpret = jax.default_backend() != 'tpu'
    rad_f = fused_trace(scene, ro, rd, pt, base, interpret=interpret)
    rad_w = path_trace(scene, ro, rd, u)
    a = np.stack([np.asarray(rad_f.x), np.asarray(rad_f.y),
                  np.asarray(rad_f.z)])
    b = np.stack([np.asarray(rad_w.x), np.asarray(rad_w.y),
                  np.asarray(rad_w.z)])
    assert np.isfinite(a).all()
    d = np.abs(a - b) / np.maximum(np.abs(b), 0.05)
    assert (d.max(axis=0) < 2e-2).mean() > 0.95, \
        f'{(d.max(axis=0) >= 2e-2).mean():.3f} paths differ'
    assert abs(a.mean() - b.mean()) < 1e-2 * max(b.mean(), 1e-6)


def test_fused_above_2048_faces_matches_wavefront():
    '''Face-id aliasing guard (advisor round 4): tables above 2048 faces
    must widen the packed-key fid mask (plucker.key_mask_for) or hits on
    face f >= 2048 return f - 2048 and fetch the wrong attributes.  The
    matball scene (2216 faces) crosses the boundary; depth 2 keeps
    interpret mode affordable.'''
    from ptina_tpu.scenes import matball
    scene = matball()
    assert scene.tri_w2b.shape[0] > 2048

    res = 12
    depth = 2
    dims = 2 + 6 * depth
    ii, jj = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing='ij')
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    u = sample_dims(0, ii, jj, dims)
    x = (ii.astype(jnp.float32) + u[0]) / res * 2.0 - 1.0
    y = (jj.astype(jnp.float32) + u[1]) / res * 2.0 - 1.0
    ro, rd = camera_rays(scene.cam_v2w, x, y)
    pt = sobol_block(0, dims)
    base = wanghash2(ii, jj)
    interpret = jax.default_backend() != 'tpu'
    rad_f = fused_trace(scene, ro, rd, pt, base, interpret=interpret)
    rad_w = path_trace(scene, ro, rd, u)
    a = np.stack([np.asarray(rad_f.x), np.asarray(rad_f.y),
                  np.asarray(rad_f.z)])
    b = np.stack([np.asarray(rad_w.x), np.asarray(rad_w.y),
                  np.asarray(rad_w.z)])
    assert np.isfinite(a).all()
    d = np.abs(a - b) / np.maximum(np.abs(b), 0.05)
    assert (d.max(axis=0) < 2e-2).mean() > 0.95, \
        f'{(d.max(axis=0) >= 2e-2).mean():.3f} paths differ'
    assert abs(a.mean() - b.mean()) < 5e-3 * max(b.mean(), 1e-6)


def test_fused_texture_eligibility():
    '''Texture-size and binding-count caps gate the megakernel.'''
    on_tpu = jax.default_backend() == 'tpu'
    scene = cornell_box(textured_image=_bench_texture())
    assert fused_eligible(scene) == on_tpu
    # an atlas past the VMEM cap falls back to the wavefront path
    big = np.ones((640, 640, 3), np.float32)
    scene_big = cornell_box(textured_image=big)
    assert not fused_eligible(scene_big)
