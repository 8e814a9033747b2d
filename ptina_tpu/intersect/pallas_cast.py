'''
Fused Pallas ray-cast kernels (wavefront integrator's device casts).

The pure-XLA blocked cast (intersect/brute.py) is HBM-bound: its [N, F]
intermediates (two matmul outputs + masks) round-trip HBM every tile,
costing ~20 ms per cast at 512x512.  These kernels apply the
flash-attention recipe instead: tile the RAY axis across the grid, keep
the whole triangle table in VMEM, and fuse

    matmul -> validity -> packed-key min-reduce -> winner
    attributes (barycentric-interpolated normals/uvs/material id)

into one kernel whose only HBM traffic is the rays in and the per-ray
results out (~60 bytes/ray instead of ~8*F bytes/ray).

The per-(face, ray) math is the shared Plücker core
(intersect/plucker.py): one [5FC, 14] @ [14, TR] MXU matmul per
64-face chunk and a division-free ~16-op VPU tail, which replaced this
module's original 6-matmul generic form with its per-pair division
(reference semantics unchanged: Face.intersect + BVH nearest-hit loop,
ptina/geometries.py:117-148, lbvh.py:313-347).

Layout: rays live on the LANE axis (blocks are [14, TR] ray features /
[5F, 14] faces); the reduction over faces runs across sublanes, which
the VPU does natively.  TR is a multiple of 128.
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptina_tpu.utils.mathutils import INF
from ptina_tpu.intersect.brute import Hit
from ptina_tpu.intersect.plucker import (
    pack_plucker, pack_extract, ray_features, cast_closest_chunks,
    cast_mint_chunks, key_decode_t, key_mask_for, KEY_MISS, N_COEF)

__all__ = ['pallas_cast_closest', 'pallas_cast_any', 'pallas_cast_shade',
           'MAX_VMEM_FACES']

MAX_VMEM_FACES = 8192  # single-pass limit: all triangle data stays in VMEM

TR = 512  # rays per grid step: the chunked casts bound the working set
# per FACE_CHUNK (not per F), so the lane tile stays wide at every
# face count (the pre-chunking kernels had to shrink TR with F).


def _closest_kernel(q_ref, avoid_ref, t5_ref, coef_ref,
                    t_ref, idx_ref, u_ref, v_ref, *, fid_mask, interp):
    key, u, v, _ = cast_closest_chunks(t5_ref[:], coef_ref[:], q_ref[:],
                                       avoid_ref[:], interp, fid_mask)
    hitm = key != KEY_MISS
    t_ref[:] = jnp.where(hitm, key_decode_t(key, fid_mask), INF)
    idx_ref[:] = jnp.where(hitm, key & fid_mask, -1)
    u_ref[:] = jnp.where(hitm, u, 0.0)
    v_ref[:] = jnp.where(hitm, v, 0.0)


def _any_kernel(q_ref, avoid_ref, tmax_ref, t5_ref, occ_ref, *, interp):
    mint = cast_mint_chunks(t5_ref[:], q_ref[:], avoid_ref[:], interp)
    # clamp tmax to the far clip: mint == INF means miss, which must not
    # occlude even when the caller's tmax exceeds INF
    occ_ref[:] = (mint < jnp.minimum(tmax_ref[:], INF)).astype(jnp.int32)


def _shade_kernel(q_ref, avoid_ref, t5_ref, ext_ref,
                  t_ref, idx_ref, u_ref, v_ref, out_ref, *, fid_mask,
                  interp, n_attr):
    '''Closest hit + fused barycentric attribute interpolation.
    ext_ref: [3*C + 15, F] extraction table (pack_extract) — C attribute
    channels per corner (normals, uvs, mtlid) over the face coefficient
    rows.  out_ref: [C, TR] interpolated winner attributes.'''
    key, u, v, att = cast_closest_chunks(t5_ref[:], ext_ref[:], q_ref[:],
                                         avoid_ref[:], interp, fid_mask,
                                         n_attr=n_attr)
    hitm = key != KEY_MISS
    t_ref[:] = jnp.where(hitm, key_decode_t(key, fid_mask), INF)
    idx_ref[:] = jnp.where(hitm, key & fid_mask, -1)
    u_ref[:] = jnp.where(hitm, u, 0.0)
    v_ref[:] = jnp.where(hitm, v, 0.0)
    out_ref[:] = jnp.where(hitm, att, 0.0)


def _prep(ro, rd, avoid, tr):
    '''Stack V3 ray rows into lane-major homogeneous [4, N], pad N to tr.
    (With SoA rays this is a concat of dense rows — no [N, 4] transpose.)'''
    n = ro.x.shape[0]
    npad = -n % tr
    one = jnp.ones_like(ro.x)
    zero = jnp.zeros_like(one)
    o4 = jnp.stack([ro.x, ro.y, ro.z, one])
    d4 = jnp.stack([rd.x, rd.y, rd.z, zero])
    if npad:
        o4 = jnp.pad(o4, ((0, 0), (0, npad)))
        d4 = jnp.pad(d4, ((0, 0), (0, npad)), constant_values=0.0)
        avoid = jnp.pad(avoid, (0, npad), constant_values=-1)
    return o4, d4, avoid[None, :], n, n + npad


def _specs(tr, f):
    q_spec = pl.BlockSpec((14, tr), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, tr), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    t5_spec = pl.BlockSpec((5 * f, 14), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    return q_spec, lane_spec, t5_spec


_VMEM = dict(compiler_params=pltpu.CompilerParams(
    dimension_semantics=('parallel',),
    vmem_limit_bytes=100 * 1024 * 1024))


def _params(interpret):
    return {} if interpret else _VMEM


@functools.partial(jax.jit, static_argnames=('interpret',))
def pallas_cast_closest(ro, rd, tri_w2b, avoid, interpret=False):
    '''Drop-in fused replacement for brute.cast_closest.'''
    f = tri_w2b.shape[0]
    assert f <= MAX_VMEM_FACES, 'use the blocked two-level path'
    fid_mask = key_mask_for(f)
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, TR)
    q = ray_features(o4t, d4t)
    t5 = pack_plucker(tri_w2b)
    coef = pack_extract(tri_w2b)
    q_spec, lane_spec, t5_spec = _specs(TR, f)
    coef_spec = pl.BlockSpec((N_COEF, f), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    t, idx, u, v = pl.pallas_call(
        functools.partial(_closest_kernel, fid_mask=fid_mask,
                          interp=interpret),
        grid=(ntotal // TR,),
        in_specs=[q_spec, lane_spec, t5_spec, coef_spec],
        out_specs=[lane_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.int32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
        ],
        interpret=interpret,
        **_params(interpret),
    )(q, avoid2, t5, coef)
    return Hit(hit=idx[0, :n] >= 0, t=t[0, :n], index=idx[0, :n],
               u=u[0, :n], v=v[0, :n])


@functools.partial(jax.jit, static_argnames=('interpret',))
def pallas_cast_any(ro, rd, tri_w2b, avoid, tmax, interpret=False):
    f = tri_w2b.shape[0]
    assert f <= MAX_VMEM_FACES
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, TR)
    q = ray_features(o4t, d4t)
    t5 = pack_plucker(tri_w2b)
    npad = ntotal - n
    tmax2 = (jnp.pad(tmax, (0, npad)) if npad else tmax)[None, :]
    q_spec, lane_spec, t5_spec = _specs(TR, f)
    occ = pl.pallas_call(
        functools.partial(_any_kernel, interp=interpret),
        grid=(ntotal // TR,),
        in_specs=[q_spec, lane_spec, lane_spec, t5_spec],
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((1, ntotal), jnp.int32),
        interpret=interpret,
        **_params(interpret),
    )(q, avoid2, tmax2, t5)
    return occ[0, :n] > 0


@functools.partial(jax.jit, static_argnames=('interpret',))
def pallas_cast_shade(ro, rd, tri_w2b, avoid, corner_attrs,
                      interpret=False):
    '''Closest hit with fused attribute interpolation.
    corner_attrs: [3*C, F] (corner-major channels).  Returns
    (Hit, attrs [C, N] — dense per-channel rows).'''
    f = tri_w2b.shape[0]
    assert f <= MAX_VMEM_FACES
    fid_mask = key_mask_for(f)
    c3 = corner_attrs.shape[0]
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, TR)
    q = ray_features(o4t, d4t)
    t5 = pack_plucker(tri_w2b)
    ext = pack_extract(tri_w2b, corner_attrs)
    q_spec, lane_spec, t5_spec = _specs(TR, f)
    attr_in_spec = pl.BlockSpec((c3 + N_COEF, f), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    attr_out_spec = pl.BlockSpec((c3 // 3, TR), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    t, idx, u, v, attrs = pl.pallas_call(
        functools.partial(_shade_kernel, fid_mask=fid_mask,
                          interp=interpret, n_attr=c3 // 3),
        grid=(ntotal // TR,),
        in_specs=[q_spec, lane_spec, t5_spec, attr_in_spec],
        out_specs=[lane_spec] * 4 + [attr_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.int32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((c3 // 3, ntotal), jnp.float32),
        ],
        interpret=interpret,
        **_params(interpret),
    )(q, avoid2, t5, ext)
    hit = Hit(hit=idx[0, :n] >= 0, t=t[0, :n], index=idx[0, :n],
              u=u[0, :n], v=v[0, :n])
    return hit, attrs[:, :n]
