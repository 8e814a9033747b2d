'''
Material table fetch: mtlid + texcoord -> per-lane Disney parameter dict.

Counterpart of the reference MaterialPool.get (ptina/mtllib.py:79-95):
each of the 12 Disney parameters is a (factor, texture) pair and the
factor is multiplied by the texture sample when a texture is bound
(ParameterPair.get, mtllib.py:30-38).  mtlid == -1 selects the defaults
row (the table's last row, see scene.make_materials).

The factor fetch is unrolled over the (small, static) material table:
each parameter row becomes a chain of elementwise selects over dense [N]
rows — no gathers, no one-hot matmuls, no padded [N, 48] intermediates —
so the whole fetch fuses into the shading pipeline.  Texture multiplies
fall back to gathers, executed only when the scene has any textures.
'''

import jax.numpy as jnp

from ptina_tpu.scene import MATERIAL_PARAMS
from ptina_tpu.utils.vec import V3, vwhere
from ptina_tpu.texture import sample_texture
from ptina_tpu.materials.disney import disney_derive

__all__ = ['fetch_material']


def fetch_material(scene, mtlid, tex_s, tex_t):
    '''mtlid [N] i32, tex_s/tex_t [N] -> derived Disney param dict of
    per-lane rows (basecolor V3, scalars [N]).'''
    mats = scene.materials
    m1 = mats.fac.shape[0]  # M + 1 (last row = defaults for mtlid -1)
    row = jnp.where(mtlid < 0, m1 - 1, mtlid)

    # unrolled select over the static-size material table: start from the
    # defaults row and overwrite where the lane's id matches (the table
    # values are traced so texture/material grads still flow; only the
    # table SIZE is static)
    base = V3(jnp.broadcast_to(mats.fac[m1 - 1, 0, 0], row.shape),
              jnp.broadcast_to(mats.fac[m1 - 1, 0, 1], row.shape),
              jnp.broadcast_to(mats.fac[m1 - 1, 0, 2], row.shape))
    scal = [jnp.broadcast_to(mats.fac[m1 - 1, p, 0], row.shape)
            for p in range(1, 12)]
    for m in range(m1 - 1):
        sel = row == m
        base = vwhere(sel, V3(mats.fac[m, 0, 0], mats.fac[m, 0, 1],
                              mats.fac[m, 0, 2]), base)
        for p in range(1, 12):
            scal[p - 1] = jnp.where(sel, mats.fac[m, p, 0], scal[p - 1])

    # texture-modulated parameters (textured scenes only; the texture
    # fetch is a real gather so it is gated on the static atlas shape)
    if scene.textures.data.shape[1] > 1 or scene.textures.data.shape[2] > 1:
        per_lane_tex = scene.materials.tex[row]  # [N, 12] gather (small)
        has_tex = per_lane_tex >= 0
        for p_i in range(12):
            tid = jnp.maximum(per_lane_tex[:, p_i], 0)
            texval = sample_texture(scene.textures, tid, tex_s, tex_t)
            if p_i == 0:
                base = V3(
                    base.x * jnp.where(has_tex[:, 0], texval[..., 0], 1.0),
                    base.y * jnp.where(has_tex[:, 0], texval[..., 1], 1.0),
                    base.z * jnp.where(has_tex[:, 0], texval[..., 2], 1.0))
            else:
                scal[p_i - 1] = scal[p_i - 1] * jnp.where(
                    has_tex[:, p_i], texval[..., 0], 1.0)

    params = {'basecolor': base}
    for p_i, name in enumerate(MATERIAL_PARAMS[1:], start=1):
        params[name] = scal[p_i - 1]
    return disney_derive(params)
