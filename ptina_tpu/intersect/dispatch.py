'''
Backend dispatch for ray casts.

On TPU the fused Pallas kernels (pallas_cast.py) are ~10-500x faster than
the XLA blocked path; on CPU (tests, debugging) the XLA path is used —
Mosaic kernels don't run there and interpret mode is slow.  The choice is
made at trace time from jax.default_backend(), so each jit cache entry
gets the right implementation with no runtime cost.

`cast_shaded` is the preferred closest-hit entry: on TPU it returns the
winner's interpolated shading attributes from the same kernel pass
(normals/uvs/material id), eliminating the per-ray attribute gathers that
dominate the XLA profile.
'''

import jax
import jax.numpy as jnp

from ptina_tpu.utils.mathutils import normalize
from ptina_tpu.intersect import brute
from ptina_tpu.intersect.pallas_cast import (
    pallas_cast_closest, pallas_cast_any, pallas_cast_shade, MAX_VMEM_FACES,
)

__all__ = ['cast_closest', 'cast_any', 'cast_shaded']


def _use_pallas(nfaces):
    return jax.default_backend() == 'tpu' and nfaces <= MAX_VMEM_FACES


def cast_closest(ro, rd, tri_w2b, avoid):
    if _use_pallas(tri_w2b.shape[0]):
        return pallas_cast_closest(ro, rd, tri_w2b, avoid)
    return brute.cast_closest(ro, rd, tri_w2b, avoid)


def cast_any(ro, rd, tri_w2b, avoid, tmax):
    if _use_pallas(tri_w2b.shape[0]):
        return pallas_cast_any(ro, rd, tri_w2b, avoid, tmax)
    return brute.cast_any(ro, rd, tri_w2b, avoid, tmax)


def cast_shaded(scene, ro, rd, avoid):
    '''Closest hit + shading attributes.
    Returns (hit, normal [N,3] unit (not yet two-sided-flipped),
    texcoord [N,2], mtlid [N] i32 (-1 on miss/defaults)).'''
    if _use_pallas(scene.tri_w2b.shape[0]):
        hit, attrs = pallas_cast_shade(ro, rd, scene.tri_w2b, avoid,
                                       scene.tri_attrs)
        normal = normalize(attrs[:, 0:3])
        texcoord = attrs[:, 3:5]
        mtlid = jnp.round(attrs[:, 5]).astype(jnp.int32)
        mtlid = jnp.where(hit.hit, mtlid, -1)
        return hit, normal, texcoord, mtlid
    hit = brute.cast_closest(ro, rd, scene.tri_w2b, avoid)
    idx = jnp.maximum(hit.index, 0)
    w = jnp.stack([1.0 - hit.uv[:, 0] - hit.uv[:, 1],
                   hit.uv[:, 0], hit.uv[:, 1]], axis=-1)
    normal = normalize(jnp.einsum('nk,nkc->nc', w, scene.tri_nrm[idx]))
    texcoord = jnp.einsum('nk,nkc->nc', w, scene.tri_uv[idx])
    mtlid = jnp.where(hit.hit, scene.tri_mtl[idx], -1)
    return hit, normal, texcoord, mtlid
