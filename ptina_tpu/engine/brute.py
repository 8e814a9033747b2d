'''
Brute-force path integrator: no next-event estimation, no MIS — light is
only collected when a bounce ray happens to hit an emitter or escapes to
the environment.  Slow to converge but unbiased and simple; used as the
ground-truth cross-check for the MIS integrator (that is also its role
in the reference: "for testing purpose", ptina/engine/brute.py:1-3).
'''

import functools

import jax
import jax.numpy as jnp

from ptina_tpu.utils.vec import V3, vnormalize, vwhere
from ptina_tpu.camera import camera_rays
from ptina_tpu.engine.path import _cast_and_shade, MAX_DEPTH
from ptina_tpu.lights import lights_hit, world_at
from ptina_tpu.materials.disney import disney_sample
from ptina_tpu.sampling.sobol import sample_dims
from ptina_tpu.film import film_add

__all__ = ['brute_trace', 'render_brute_sample', 'render_brute']


def brute_trace(scene, ro, rd, uniforms):
    '''Reference brute.py:29-62 semantics, wavefront SoA form.
    ro, rd: V3 rows; uniforms [2 + 6 * depth, N] (row count sets the
    bounce cap, like path_trace).  Returns V3 radiance.'''
    depth = (uniforms.shape[0] - 2) // 6
    n_sh = ro.x.shape
    zero = jnp.zeros(n_sh)
    one = jnp.ones(n_sh)
    result = V3(zero, zero, zero)
    throughput = V3(one, one, one)
    def body(carry, u):
        ro, rd, throughput, result, avoid, alive = carry
        rd = vnormalize(rd)
        hit, hitpos, normal, sign, material = _cast_and_shade(
            scene, ro, rd, avoid)

        lit = lights_hit(scene.lights, ro, rd)
        lit_vis = lit['hit'] & (~hit.hit | (lit['dis'] < hit.t))
        result = result + vwhere(alive & lit_vis,
                                 throughput * lit['color'], 0.0)

        miss = ~hit.hit
        result = result + vwhere(alive & miss,
                                 throughput * world_at(scene, rd), 0.0)
        live = alive & ~miss

        outdir, pdf, color = disney_sample(material, normal, sign, -rd,
                                           u[3], u[4], u[5],
                                           zero=scene.materials.zero)
        throughput = vwhere(live, throughput * color, throughput)
        ro = vwhere(live, hitpos, ro)
        rd = vwhere(live, outdir, rd)
        avoid = jnp.where(live, hit.index, avoid)
        alive = live \
            & ((throughput.x > 0.0) | (throughput.y > 0.0)
               | (throughput.z > 0.0)) \
            & ((rd.x != 0.0) | (rd.y != 0.0) | (rd.z != 0.0))
        return (ro, rd, throughput, result, avoid, alive), None

    # one scanned bounce body, like engine/path.path_trace (compile time)
    bounce_u = uniforms[2:2 + 6 * depth].reshape(
        (depth, 6) + uniforms.shape[1:])
    carry = (ro, rd, throughput, result,
             jnp.full(n_sh, -1, jnp.int32), jnp.ones(n_sh, bool))
    carry, _ = jax.lax.scan(body, carry, bounce_u)
    return carry[3]


def render_brute_sample(scene, film, sample_index, max_depth=MAX_DEPTH):
    _, _, nx, ny = film.shape
    ii, jj = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), indexing='ij')
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    u = sample_dims(sample_index, ii, jj, 2 + 6 * max_depth)
    x = (ii.astype(jnp.float32) + u[0]) / nx * 2.0 - 1.0
    y = (jj.astype(jnp.float32) + u[1]) / ny * 2.0 - 1.0
    ro, rd = camera_rays(scene.cam_v2w, x, y)
    rad = brute_trace(scene, ro, rd, u)
    return film_add(film, 0, rad.x, rad.y, rad.z, jnp.ones_like(rad.x))


@functools.partial(jax.jit, static_argnames=('spp', 'max_depth'),
                   donate_argnames=('film',))
def render_brute(scene, film, start_sample, spp=1, max_depth=MAX_DEPTH):
    def body(s, f):
        return render_brute_sample(scene, f, start_sample + s, max_depth)
    return jax.lax.fori_loop(0, spp, body, film)
