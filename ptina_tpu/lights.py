'''
Analytic lights (point spheres / area rects) and the environment light.

Vectorized counterparts of the reference LightPool
(ptina/light/__init__.py:51-121) and WorldLight (ptina/light/world.py):
light queries evaluate all L fixed slots for all N rays as dense [N, L]
tests, masked by the live count — no per-lane loops.
'''

import jax.numpy as jnp

from ptina_tpu.utils.mathutils import INF, clamp, dot_or_zero, norm, spherical, dir2tex
from ptina_tpu.geometry import ray_sphere, ray_rect
from ptina_tpu.scene import LIGHT_POINT, LIGHT_AREA
from ptina_tpu.texture import sample_texture

__all__ = ['lights_hit', 'lights_sample', 'world_at']


def _contract(onehot, table):
    '''Select per-ray rows of a tiny [L, ...] table with a [N, L] one-hot
    contraction.  Per-ray gathers (`table[idx]`) lower to scalar-unit
    gather loops on TPU (~milliseconds at N=512x512); a [N,L]@[L,k]
    matmul with L <= 64 is VPU/MXU work in the tens of microseconds.'''
    flat = table.reshape(table.shape[0], -1)
    out = jnp.dot(onehot, flat, preferred_element_type=jnp.float32)
    return out.reshape((onehot.shape[0],) + table.shape[1:])


def lights_hit(lights, ro, rd):
    '''Direct-hit query against every light (reference hit(),
    ptina/light/__init__.py:51-81).  The reference scans slots in order
    and stops at the first hit — we reproduce that by selecting the
    lowest-index hit slot.  Returns dict(hit [N] bool, dis [N],
    pdf [N], color [N, 3]).'''
    L = lights.size.shape[0]
    ro_b = ro[:, None, :]
    rd_b = rd[:, None, :]
    live = jnp.arange(L)[None, :] < lights.count

    t_sph = ray_sphere(ro_b, rd_b, lights.pos[None], (lights.size ** 2)[None])
    area_sph = jnp.pi * lights.size ** 2

    dirx = jnp.einsum('lij,j->li', lights.axes, jnp.asarray([1.0, 0.0, 0.0])) \
        * lights.size[:, None]
    diry = jnp.einsum('lij,j->li', lights.axes, jnp.asarray([0.0, 1.0, 0.0])) \
        * lights.size[:, None]
    hit_rect, t_rect = ray_rect(ro_b, rd_b, lights.pos[None], dirx[None], diry[None])
    area_rect = 4.0 * lights.size ** 2

    is_point = lights.type == LIGHT_POINT
    is_area = lights.type == LIGHT_AREA
    t = jnp.where(is_point[None], t_sph,
                  jnp.where(is_area[None] & hit_rect, t_rect, 0.0))
    area = jnp.where(is_point, area_sph, area_rect)
    valid = live & (t > 0.0) & (t < INF)

    # lowest hit slot per ray, as a one-hot (first valid <=> cumulative
    # count of valids up to and including the slot is exactly 1)
    first_oh = (valid & (jnp.cumsum(valid, axis=1) == 1)).astype(t.dtype)
    any_hit = jnp.any(valid, axis=1)
    dis = jnp.sum(t * first_oh, axis=1)
    area_sel = jnp.sum(area[None, :] * first_oh, axis=1)
    pdf = dis ** 2 / jnp.maximum(area_sel, 1e-12)
    color = _contract(first_oh, lights.color)
    return dict(hit=any_hit, dis=jnp.where(any_hit, dis, INF),
                pdf=jnp.where(any_hit, pdf, 0.0),
                color=jnp.where(any_hit[:, None], color, 0.0))


def lights_sample(lights, hitpos, samp):
    '''Next-event sample (reference sample()/_sample(),
    ptina/light/__init__.py:83-121).  hitpos [N,3], samp [N,3]
    (z picks the light).  Returns dict(dis, dir, pdf, color) with color
    already divided by pdf and cosine-weighted for area lights, exactly
    like the reference.'''
    n = hitpos.shape[0]
    L = lights.size.shape[0]
    count = jnp.maximum(lights.count, 1)
    idx = jnp.clip((samp[:, 2] * count.astype(samp.dtype)).astype(jnp.int32),
                   0, count - 1)

    oh = (idx[:, None] == jnp.arange(L)[None, :]).astype(samp.dtype)
    ltype = jnp.sum(lights.type[None, :].astype(samp.dtype) * oh,
                    axis=1).astype(jnp.int32)
    color = _contract(oh, lights.color)
    pos = _contract(oh, lights.pos)
    size = jnp.sum(lights.size[None, :] * oh, axis=1)
    # frame columns contracted separately — a per-ray [N, 3, 3] matrix
    # would materialize minor-axis-padded (8, 128) tiles on TPU
    ax_x = _contract(oh, lights.axes[:, :, 0])  # [N, 3]
    ax_y = _contract(oh, lights.axes[:, :, 1])
    ax_z = _contract(oh, lights.axes[:, :, 2])

    # point: surface point on the light sphere — the reference samples
    # spherical(samp.x, ...) whose z >= 0, i.e. the +z hemisphere
    # (light/__init__.py:97-100); kept verbatim for parity.
    disp_pt = spherical(samp[:, 0], samp[:, 1])
    litpos_pt = pos + size[:, None] * disp_pt
    area_pt = jnp.pi * size ** 2

    lx = (samp[:, 0] * 2.0 - 1.0)[:, None]
    ly = (samp[:, 1] * 2.0 - 1.0)[:, None]
    disp_ar = ax_x * lx + ax_y * ly
    nrm_ar = ax_z
    litpos_ar = pos + size[:, None] * disp_ar
    area_ar = 4.0 * size ** 2

    is_area = ltype == LIGHT_AREA
    litpos = jnp.where(is_area[:, None], litpos_ar, litpos_pt)
    area = jnp.where(is_area, area_ar, area_pt)
    nrm = jnp.where(is_area[:, None], nrm_ar, 0.0)

    toli = litpos - hitpos
    dis = jnp.maximum(norm(toli), 1e-12)
    direction = toli / dis[:, None]
    pdf = dis ** 2 / jnp.maximum(area, 1e-12)
    out_color = color / pdf[:, None]
    cosine = dot_or_zero(nrm, direction)
    out_color = jnp.where(is_area[:, None], out_color * cosine[:, None], out_color)

    empty = lights.count == 0
    return dict(
        dis=jnp.where(empty, INF, dis),
        dir=jnp.where(empty, 0.0, direction),
        pdf=jnp.where(empty, 0.0, pdf),
        color=jnp.where(empty, 0.0, out_color),
    )


def world_at(scene, rd):
    '''Environment radiance for directions rd [N,3] (reference
    WorldLight.at, ptina/light/world.py:22-29, including the blender axis
    swizzle for the equirect lookup).'''
    fac = scene.world_fac
    if scene.textures.data.shape[1] == 1 and scene.textures.data.shape[2] == 1:
        # no real textures loaded (static shape) -> the equirect fetch and
        # its arctan2s would be dead work on every bounce; skip at trace time
        return jnp.broadcast_to(fac[None, :3], (rd.shape[0], 3))
    textured = scene.world_tex >= 0
    texid = jnp.maximum(scene.world_tex, 0)
    d = jnp.stack([rd[:, 0], rd[:, 2], -rd[:, 1]], axis=-1)
    s, t = dir2tex(d)
    tex = sample_texture(scene.textures, jnp.full(rd.shape[:1], texid), s, t)
    out = jnp.where(textured, fac[None] * tex, fac[None])
    return out[:, :3]
