'''
Material table fetch: mtlid + texcoord -> per-lane Disney parameter dict.

Counterpart of the reference MaterialPool.get (ptina/mtllib.py:79-95):
each of the 12 Disney parameters is a (factor, texture) pair and the
factor is multiplied by the texture sample when a texture is bound
(ParameterPair.get, mtllib.py:30-38).  mtlid == -1 selects the defaults
row (the table's last row, see scene.make_materials).

The per-lane factor fetch is a [N, M+1] one-hot contraction with the
packed [M+1, 48] factor table — one small matmul instead of 12 gathers.
Texture multiplies fall back to gathers, executed only when the scene has
any textured material.
'''

import jax.numpy as jnp

from ptina_tpu.scene import MATERIAL_PARAMS
from ptina_tpu.texture import sample_texture
from ptina_tpu.materials.disney import disney_derive

__all__ = ['fetch_material']


def fetch_material(scene, mtlid, texcoord):
    '''mtlid [N] i32, texcoord [N, 2] -> derived Disney param dict of
    per-lane arrays (basecolor [N,3], scalars [N]).'''
    mats = scene.materials
    m1 = mats.fac.shape[0]  # M + 1
    row = jnp.where(mtlid < 0, m1 - 1, mtlid)

    oh = jnp.equal(row[:, None], jnp.arange(m1)[None, :]).astype(scene.tri_pos.dtype)
    fac = jnp.dot(oh, mats.fac.reshape(m1, 12 * 4),
                  preferred_element_type=jnp.float32).reshape(-1, 12, 4)

    # texture-modulated parameters (no-op when untextured; the texture id
    # select is a one-hot contraction, not a per-lane gather — see
    # lights._contract for why)
    texids = jnp.dot(oh, mats.tex.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    texids = jnp.round(texids).astype(jnp.int32)  # [N, 12]
    has_tex = texids >= 0
    if scene.textures.data.shape[0] > 1 or scene.textures.data.shape[1] > 1:
        s, t = texcoord[:, 0], texcoord[:, 1]
        for p_i in range(12):
            tid = jnp.maximum(texids[:, p_i], 0)
            texval = sample_texture(scene.textures, tid, s, t)
            fac = fac.at[:, p_i, :].multiply(
                jnp.where(has_tex[:, p_i][:, None], texval, 1.0))

    params = {'basecolor': fac[:, 0, :3]}
    for p_i, name in enumerate(MATERIAL_PARAMS[1:], start=1):
        params[name] = fac[:, p_i, 0]
    return disney_derive(params)
