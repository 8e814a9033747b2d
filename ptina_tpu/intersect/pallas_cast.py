'''
Fused Pallas ray-cast kernels.

The pure-XLA blocked cast (intersect/brute.py) is HBM-bound: its [N, F]
intermediates (two matmul outputs + masks) round-trip HBM every tile,
costing ~20 ms per cast at 512x512.  These kernels apply the
flash-attention recipe instead: tile the RAY axis across the grid, keep
the whole triangle table in VMEM, and fuse

    matmul -> t/u/v -> validity mask -> masked min-reduce -> winner
    attributes (barycentric-interpolated normals/uvs/material id)

into one kernel whose only HBM traffic is the rays in and the per-ray
results out (~40 bytes/ray instead of ~8*F bytes/ray).

Layout choice: rays live on the LANE axis (blocks are [4, TR] / [F, TR])
so the reduction over triangles runs across sublanes, which the VPU does
natively; TR is a multiple of 128.

Math is identical to intersect/brute.py (per-triangle affine functionals,
reference semantics of Face.intersect + BVH nearest-hit loop,
ptina/geometries.py:117-148, lbvh.py:313-347).
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptina_tpu.utils.mathutils import EPS, INF
from ptina_tpu.intersect.brute import Hit

__all__ = ['pallas_cast_closest', 'pallas_cast_any', 'pallas_cast_shade',
           'MAX_VMEM_FACES']

MAX_VMEM_FACES = 8192  # single-pass limit: all triangle data stays in VMEM


def _tr_for(f):
    '''Rays per grid step: keep the [F, TR] working set ~2 MB x #buffers
    inside VMEM.  Multiple of 128 (lane axis).'''
    if f <= 1024:
        return 512
    if f <= 2048:
        return 256
    return 128


def _plane_uv(m0_ref, m1_ref, m2_ref, o4, d4):
    '''Shared geometry math: returns (t, u, v, live) as [F, TR] arrays.
    m*_ref: [F, 4] functional rows; o4, d4: [4, TR] homogeneous rays.'''
    f32 = jnp.float32
    a0 = jnp.dot(m0_ref[:], o4, preferred_element_type=f32)
    b0 = jnp.dot(m0_ref[:], d4, preferred_element_type=f32)
    a1 = jnp.dot(m1_ref[:], o4, preferred_element_type=f32)
    b1 = jnp.dot(m1_ref[:], d4, preferred_element_type=f32)
    a2 = jnp.dot(m2_ref[:], o4, preferred_element_type=f32)
    b2 = jnp.dot(m2_ref[:], d4, preferred_element_type=f32)
    live = jnp.abs(b0) >= EPS
    t = -a0 / jnp.where(live, b0, 1.0)
    u = a1 + t * b1
    v = a2 + t * b2
    return t, u, v, live


def _valid(t, u, v, live, avoid, fids):
    return (live & (t > 0.0)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (fids != avoid))


def _closest_kernel(o4_ref, d4_ref, avoid_ref, m0_ref, m1_ref, m2_ref,
                    t_ref, idx_ref, u_ref, v_ref):
    f = m0_ref.shape[0]
    t, u, v, live = _plane_uv(m0_ref, m1_ref, m2_ref, o4_ref[:], d4_ref[:])
    fids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    valid = _valid(t, u, v, live, avoid_ref[:], fids)
    tm = jnp.where(valid, t, INF)
    tmin = jnp.min(tm, axis=0, keepdims=True)          # [1, TR]
    # winner one-hot: among min-t faces take the lowest face id
    eq = (tm == tmin) & valid
    widx = jnp.min(jnp.where(eq, fids, jnp.int32(2**30)), axis=0, keepdims=True)
    first = eq & (fids == widx)
    ff = first.astype(jnp.float32)
    t_ref[:] = tmin
    idx_ref[:] = jnp.where(widx == 2**30, -1, widx)
    u_ref[:] = jnp.sum(u * ff, axis=0, keepdims=True)
    v_ref[:] = jnp.sum(v * ff, axis=0, keepdims=True)


def _any_kernel(o4_ref, d4_ref, avoid_ref, tmax_ref, m0_ref, m1_ref, m2_ref,
                occ_ref):
    t, u, v, live = _plane_uv(m0_ref, m1_ref, m2_ref, o4_ref[:], d4_ref[:])
    fids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    valid = _valid(t, u, v, live, avoid_ref[:], fids)
    hit = valid & (t < tmax_ref[:])
    occ_ref[:] = jnp.max(hit.astype(jnp.int32), axis=0, keepdims=True)


def _shade_kernel(o4_ref, d4_ref, avoid_ref, m0_ref, m1_ref, m2_ref,
                  attr_ref, t_ref, idx_ref, u_ref, v_ref, out_ref):
    '''Closest hit + fused barycentric attribute interpolation.
    attr_ref: [3*C, F] — C attribute channels per corner (normals, uvs,
    mtlid).  out_ref: [C, TR] interpolated winner attributes.'''
    f = m0_ref.shape[0]
    t, u, v, live = _plane_uv(m0_ref, m1_ref, m2_ref, o4_ref[:], d4_ref[:])
    fids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    valid = _valid(t, u, v, live, avoid_ref[:], fids)
    tm = jnp.where(valid, t, INF)
    tmin = jnp.min(tm, axis=0, keepdims=True)
    eq = (tm == tmin) & valid
    widx = jnp.min(jnp.where(eq, fids, jnp.int32(2**30)), axis=0, keepdims=True)
    first = eq & (fids == widx)
    ff = first.astype(jnp.float32)
    t_ref[:] = tmin
    idx_ref[:] = jnp.where(widx == 2**30, -1, widx)
    uw = jnp.sum(u * ff, axis=0, keepdims=True)
    vw = jnp.sum(v * ff, axis=0, keepdims=True)
    u_ref[:] = uw
    v_ref[:] = vw
    # winner one-hot matmul: [3C, F] @ [F, TR] -> [3C, TR]
    corners = jnp.dot(attr_ref[:], ff, preferred_element_type=jnp.float32)
    c = corners.shape[0] // 3
    w0 = 1.0 - uw - vw
    out_ref[:] = (corners[0 * c:1 * c] * w0
                  + corners[1 * c:2 * c] * uw
                  + corners[2 * c:3 * c] * vw)


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


def _rows(tri_w2b):
    return tri_w2b[:, 0, :], tri_w2b[:, 1, :], tri_w2b[:, 2, :]


def _ray_specs(tr):
    ray_spec = pl.BlockSpec((4, tr), lambda i: (0, i), memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, tr), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return ray_spec, lane_spec, full


@jax.jit
def pallas_cast_closest(ro, rd, tri_w2b, avoid):
    '''Drop-in fused replacement for brute.cast_closest.'''
    f = tri_w2b.shape[0]
    assert f <= MAX_VMEM_FACES, 'use the LBVH/two-level path for big scenes'
    tr = _tr_for(f)
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, tr)
    m0, m1, m2 = _rows(tri_w2b)
    ray_spec, lane_spec, full = _ray_specs(tr)
    grid = (ntotal // tr,)
    t, idx, u, v = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec, lane_spec,
                  full((f, 4)), full((f, 4)), full((f, 4))],
        out_specs=[lane_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.int32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
        ],
    )(o4t, d4t, avoid2, m0, m1, m2)
    return Hit(hit=idx[0, :n] >= 0, t=t[0, :n], index=idx[0, :n],
               u=u[0, :n], v=v[0, :n])


@jax.jit
def pallas_cast_any(ro, rd, tri_w2b, avoid, tmax):
    f = tri_w2b.shape[0]
    assert f <= MAX_VMEM_FACES
    tr = _tr_for(f)
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, tr)
    npad = ntotal - n
    tmax2 = (jnp.pad(tmax, (0, npad)) if npad else tmax)[None, :]
    m0, m1, m2 = _rows(tri_w2b)
    ray_spec, lane_spec, full = _ray_specs(tr)
    occ = pl.pallas_call(
        _any_kernel,
        grid=(ntotal // tr,),
        in_specs=[ray_spec, ray_spec, lane_spec, lane_spec,
                  full((f, 4)), full((f, 4)), full((f, 4))],
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((1, ntotal), jnp.int32),
    )(o4t, d4t, avoid2, tmax2, m0, m1, m2)
    return occ[0, :n] > 0


@jax.jit
def pallas_cast_shade(ro, rd, tri_w2b, avoid, corner_attrs):
    '''Closest hit with fused attribute interpolation.
    corner_attrs: [3*C, F] (corner-major channels).  Returns
    (Hit, attrs [C, N] — dense per-channel rows).'''
    f = tri_w2b.shape[0]
    assert f <= MAX_VMEM_FACES
    c3 = corner_attrs.shape[0]
    tr = _tr_for(f)
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, tr)
    m0, m1, m2 = _rows(tri_w2b)
    ray_spec, lane_spec, full = _ray_specs(tr)
    attr_out_spec = pl.BlockSpec((c3 // 3, tr), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    t, idx, u, v, attrs = pl.pallas_call(
        _shade_kernel,
        grid=(ntotal // tr,),
        in_specs=[ray_spec, ray_spec, lane_spec,
                  full((f, 4)), full((f, 4)), full((f, 4)),
                  full((c3, f))],
        out_specs=[lane_spec] * 4 + [attr_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.int32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((1, ntotal), jnp.float32),
            jax.ShapeDtypeStruct((c3 // 3, ntotal), jnp.float32),
        ],
    )(o4t, d4t, avoid2, m0, m1, m2, corner_attrs)
    hit = Hit(hit=idx[0, :n] >= 0, t=t[0, :n], index=idx[0, :n],
              u=u[0, :n], v=v[0, :n])
    return hit, attrs[:, :n]
