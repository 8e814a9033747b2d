'''
Albedo & normal AOV engine for fast preview and denoise auxiliaries.

Counterpart of the reference PreviewEngine (ptina/engine/preview.py):
one primary ray per pixel, albedo (basecolor) into film pass 1 and the
shading normal into pass 2.
'''

import functools

import jax
import jax.numpy as jnp

from ptina_tpu.utils.vec import vwhere
from ptina_tpu.camera import camera_rays
from ptina_tpu.intersect.dispatch import cast_shaded
from ptina_tpu.mtllib import fetch_material
from ptina_tpu.sampling.sobol import sample_dims
from ptina_tpu.film import film_add, PASS_ALBEDO, PASS_NORMAL

__all__ = ['render_preview_sample', 'render_preview']


def render_preview_sample(scene, film, sample_index, x0=0, y0=0,
                          full_res=None):
    '''One AOV sample (reference preview.py:22-41).'''
    _, _, nx, ny = film.shape
    fnx, fny = full_res if full_res is not None else (nx, ny)
    ii, jj = jnp.meshgrid(x0 + jnp.arange(nx), y0 + jnp.arange(ny),
                          indexing='ij')
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    u = sample_dims(sample_index, ii, jj, 2)

    x = (ii.astype(jnp.float32) + u[0]) / fnx * 2.0 - 1.0
    y = (jj.astype(jnp.float32) + u[1]) / fny * 2.0 - 1.0
    ro, rd = camera_rays(scene.cam_v2w, x, y)

    avoid = jnp.full(ro.x.shape, -1, jnp.int32)
    hit, normal, tex_s, tex_t, mtlid = cast_shaded(scene, ro, rd, avoid)
    material = fetch_material(scene, mtlid, tex_s, tex_t)

    albedo = vwhere(hit.hit, material['basecolor'], 0.0)
    normal = vwhere(hit.hit, normal, 0.0)

    one = jnp.ones_like(albedo.x)
    film = film_add(film, PASS_ALBEDO, albedo.x, albedo.y, albedo.z, one)
    film = film_add(film, PASS_NORMAL, normal.x, normal.y, normal.z, one)
    return film


@functools.partial(jax.jit, static_argnames=('spp',), donate_argnames=('film',))
def render_preview(scene, film, start_sample, spp=1):
    def body(s, f):
        return render_preview_sample(scene, f, start_sample + s)
    return jax.lax.fori_loop(0, spp, body, film)
