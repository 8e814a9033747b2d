'''
Analytic intersection primitives, vectorized over ray batches.

Counterparts of the reference's per-thread primitive tests
(reference: ptina/geometries.py) re-expressed as whole-array ops: every
function takes [N, 3] ray origins/directions (or any batch prefix) and
returns per-lane results, so they fuse into the wavefront pipeline.

Triangle intersection lives in intersect/brute.py (MXU formulation) —
this module keeps the light-geometry tests (sphere, rect) and the AABB
slab test used by BVH traversal.
'''

import jax.numpy as jnp

from ptina_tpu.utils.mathutils import EPS, INF, dot, normalize, cross, safe_sqrt

__all__ = ['ray_aabb', 'ray_sphere', 'ray_rect']


def ray_aabb(ro, rd, lo, hi):
    '''Slab test (reference: ptina/geometries.py:23-46).
    ro, rd: [..., 3]; lo, hi: broadcastable [..., 3].
    Returns (hit [...], near [...], far [...]).  Matches the reference's
    semantics: rays parallel to a slab hit only if the origin is inside it,
    and `near` is clamped at 0 (no hits behind the origin are reported by
    `near`, but boxes containing the origin do hit).'''
    parallel = jnp.abs(rd) < EPS
    inv = 1.0 / jnp.where(parallel, 1.0, rd)
    t1 = (lo - ro) * inv
    t2 = (hi - ro) * inv
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    # parallel slabs: ignore in min/max, but reject if origin outside
    tmin = jnp.where(parallel, 0.0, tmin)
    tmax = jnp.where(parallel, INF, tmax)
    near = jnp.maximum(jnp.max(tmin, axis=-1), 0.0)
    far = jnp.min(tmax, axis=-1)
    outside_parallel = jnp.any(parallel & ((ro < lo) | (ro > hi)), axis=-1)
    hit = (near <= far) & ~outside_parallel
    return hit, near, far


def ray_sphere(ro, rd, center, radius2):
    '''Nearest positive sphere intersection distance, 0.0 on miss
    (reference: ptina/geometries.py:158-178).'''
    op = center - ro
    b = dot(op, rd)
    det = b * b + radius2 - dot(op, op)
    sq = safe_sqrt(det)
    t_near = b - sq
    t_far = b + sq
    t = jnp.where(t_near > EPS, t_near, jnp.where(t_far > EPS, t_far, 0.0))
    return jnp.where(det >= 0.0, t, 0.0)


def ray_rect(ro, rd, pos, dirx, diry):
    '''One-sided rectangle in an axes frame
    (reference: ptina/geometries.py:57-73).  The rect spans pos +/- dirx
    +/- diry and is only visible from the side its normal faces away from
    (NoD > eps, matching the reference's one-sided test).
    Returns (hit [...], depth [...]).'''
    nrm = normalize(cross(dirx, diry))
    nod = dot(nrm, rd)
    facing = nod > EPS
    t = dot(nrm, pos - ro) / jnp.where(facing, nod, 1.0)
    p = ro + t[..., None] * rd - pos
    u = dot(p, dirx) / jnp.maximum(dot(dirx, dirx), 1e-20)
    v = dot(p, diry) / jnp.maximum(dot(diry, diry), 1e-20)
    inside = (jnp.abs(u) < 1.0) & (jnp.abs(v) < 1.0)
    hit = facing & inside
    return hit, jnp.where(hit, t, INF)
