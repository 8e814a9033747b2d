'''
Shared Plücker-form ray-cast core for every Pallas cast kernel
(engine/fused.py megakernel, intersect/pallas_cast.py wavefront casts,
intersect/blocked.py two-level narrow phase).

The generic cast evaluates a = M [o,1], b = M [d,0] per functional row
(reference Face.intersect semantics, ptina/geometries.py:117-148) and
then pays a per-(face, ray) DIVISION for t plus two fmas for u, v.  But
the barycentric numerators are BILINEAR in (o, d):

    U = u*b0 = sum_{i<j} C_ij (o_i d_j - o_j d_i)

with per-triangle antisymmetric coefficients C — a dot product of a
per-triangle 14-vector against the ray's Plücker features.  One MXU
matmul [5F, 14] @ [14, NR] therefore yields U, V, W = b0-U-V, B = b0
and An = -a0 for every pair, and the VPU tail is division-free:

    valid = sign(U)==sign(V)==sign(W)==sign(B)  and  An*B > 0
    key   = (bits(min(An*recip(B), INF)) & ~FID_MASK) | face_id
    hit   = min-reduce(key)      -- nearest t, lowest-fid tiebreak
                                    (the reference's first-hit-wins
                                    rule) in ONE reduction

The tail runs at VPU speed of light (measured ~1.7e12 f32 ops/s on
v5e), so its per-pair op count IS the cast's cost model: ~16 ops for a
closest hit with barycentrics, ~12 for an occlusion test.  Division
(~7 VPU ops) and the compare-per-term validity (14 ops) of the generic
form are exactly what this module eliminates.
'''

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ptina_tpu.utils.mathutils import INF

__all__ = [
    'FACE_CHUNK', 'KEY_FID_MASK', 'KEY_MISS', 'N_COEF',
    'pack_plucker', 'pack_extract',
    'ray_features', 'chunk_uvwta', 'chunk_valid', 'key_mask_for',
    'cast_closest_chunks', 'cast_mint_chunks', 'key_decode_t', 'recip',
]

FACE_CHUNK = 64  # faces per in-kernel cast chunk.  The chunk matmul
# output [5*FC, NR] f32 materializes in full (an unchunked F=968 kernel
# OOMed the 16 MB scoped VMEM default at 19.8 MB), so FC bounds it:
# 5*64*4096*4B = 5.2 MB, leaving room for the tail temps.

# packed comparison key: the i32 bit pattern of a POSITIVE f32 orders
# like the float, so (t_bits & ~KEY_FID_MASK) | face_id min-reduces to
# the nearest hit with ties broken toward the lowest face id in ONE
# reduction.  11 id bits; t resolution loss is 2^-12 relative.
KEY_FID_MASK = 2047
# the miss sentinel is int32-max: it exceeds every valid key (whose t
# bits are <= bits(INF)), and its masked bit pattern decodes to a NaN,
# so key_decode_t(miss) FAILS every < comparison — downstream min/
# better tests reject misses with zero extra ops.  (bits(INF) | mask
# would NOT work: INF = 1e6 has low mantissa bits, so masking them off
# decodes BELOW INF and a miss masquerades as a hit at t ~ 999936.)
KEY_MISS = 2 ** 31 - 1


def key_mask_for(nfaces):
    '''Smallest all-ones fid mask covering `nfaces` ids (>= the default
    11 bits; 8192-face tables use 13, trading t resolution 2^-12 ->
    2^-10 — ordering-grade only, the occlusion casts keep full f32).'''
    m = KEY_FID_MASK
    while m + 1 < nfaces:
        m = (m << 1) | 1
    return m


def recip(x, interp=False, approx=False):
    '''Reciprocal: hardware approximation, plus one Newton step unless
    approx=True (~2^-12 relative suffices for comparison-grade t and
    shading barycentrics).  (Plain division under the Pallas
    interpreter, where the TPU reciprocal primitive has no lowering.)'''
    if interp:
        return 1.0 / x
    r = pl.reciprocal(x, approx=True)
    if approx:
        return r
    return r * (2.0 - x * r)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


_IJ = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _anti(ma, mb):
    # C_ij = ma_i mb_j - mb_i ma_j for i<j (antisymmetric part)
    return jnp.stack([ma[:, i] * mb[:, j] - mb[:, i] * ma[:, j]
                      for i, j in _IJ], axis=1)  # [F, 6]


N_COEF = 15  # extraction rows appended by pack_extract: cu(6) cv(6) m0.xyz(3)


def pack_extract(tri_w2b, attrs=None):
    '''Winner-extraction table [3C + 15, F] (or [15, F] when attrs is
    None): the caller's corner-major attribute channels stacked over 15
    per-face coefficient rows — cu (6), cv (6), m0.xyz (3) — from which
    cast_closest_chunks reconstructs the winner's EXACT barycentrics per
    RAY:  U = cu . q[0:6],  V = cv . q[0:6],  B = m0.xyz . d,
    u = U/B, v = V/B.  Delivering the coefficients through the same
    one-hot MXU matmul as the attributes moves all u/v work off the
    per-(face, ray) tail.'''
    m0, m1, m2 = tri_w2b[:, 0], tri_w2b[:, 1], tri_w2b[:, 2]
    coef = jnp.concatenate([_anti(m1, m0).T, _anti(m2, m0).T,
                            m0[:, 0:3].T], axis=0)  # [15, F]
    if attrs is None:
        return coef
    return jnp.concatenate([attrs, coef], axis=0)


def pack_plucker(tri_w2b, chunk=FACE_CHUNK):
    '''[5F, 14] Plücker cast matrix from the [F, 3, 4] affine
    functionals: F rows each of U-, V-, W-, B- and An-coefficients
    against the ray feature vector of `ray_features`.  CHUNK-MAJOR row
    order: [U V W B An] row groups repeat per `chunk` faces so a cast
    loop slices contiguous [5*fc, 14] blocks (chunk=None: one group).

    The a0 row is NEGATED at pack time: t = -a0/b0 = An * (1/b0), so
    the kernel never spends a per-pair negate and t > 0 becomes the
    same-sign test An * B > 0 (see chunk_valid).'''
    m0, m1, m2 = tri_w2b[:, 0], tri_w2b[:, 1], tri_w2b[:, 2]  # [F, 4]
    cu = _anti(m1, m0)   # U = a1 b0 - a0 b1
    cv = _anti(m2, m0)   # V = a2 b0 - a0 b2
    z4 = jnp.zeros_like(m0)
    z6 = jnp.zeros_like(cu)
    r_u = jnp.concatenate([cu, z4, z4], axis=1)
    r_v = jnp.concatenate([cv, z4, z4], axis=1)
    r_w = jnp.concatenate([-(cu + cv), m0, z4], axis=1)  # W = b0 - U - V
    r_b = jnp.concatenate([z6, m0, z4], axis=1)          # b0 = m0 . d4
    r_a = jnp.concatenate([z6, z4, -m0], axis=1)         # An = -m0 . o4
    f = m0.shape[0]
    if chunk is None:
        chunk = f
    rows = []
    for ci in range(0, max(f, 1), chunk):
        e = min(ci + chunk, f)
        rows += [r_u[ci:e], r_v[ci:e], r_w[ci:e], r_b[ci:e], r_a[ci:e]]
    return jnp.concatenate(rows, axis=0)


def ray_features(o4, d4):
    '''Ray feature matrix [14, N] from homogeneous [4, N] origin /
    direction rows: the 6 Plücker coordinates of the (o,1)/(d,0) pair
    in (i<j) order — where p_i3 collapses to -d_i — then d, 0, o, 1.'''
    ox, oy, oz, one = o4[0:1], o4[1:2], o4[2:3], o4[3:4]
    dx, dy, dz, zero = d4[0:1], d4[1:2], d4[2:3], d4[3:4]
    p01 = ox * dy - oy * dx
    p02 = ox * dz - oz * dx
    p12 = oy * dz - oz * dy
    return jnp.concatenate([p01, p02, -dx, p12, -dy, -dz,
                            dx, dy, dz, zero,
                            ox, oy, oz, one], axis=0)


def chunk_uvwta_T(t5Tc, q, precision=None):
    '''Transposed-layout variant of chunk_uvwta: t5Tc [QR, 5FC] with the
    coefficient rows on the SUBLANE axis (QR = 14 padded up for DMA
    alignment; q padded to match with zero rows).  One dot_general
    contracting axis 0 of both operands — the MXU takes either
    orientation — so the blocked cast can DMA block tables whose minor
    dimension (5FC) is 128-aligned (Mosaic requires it for manual
    HBM->VMEM slice copies; a [5FC, 14] minor-14 slice is rejected).

    precision: None = the TPU default single-pass bf16; the STREAMED
    blocked tier (>131k faces, densest tessellations) passes HIGHEST
    (exact f32) — round-5 f64 adjudication found the bf16 truncation
    produced phantom hits and off-by-a-face winners on ~3e-5-area
    triangles (while at <=131k density the errors stay at the
    adjacent-coplanar-face level both oracles share).  Mosaic supports
    only DEFAULT and HIGHEST; HIGHEST costs ~4x on this matmul-layout-
    bound kernel, hence the tiering.'''
    fc = t5Tc.shape[1] // 5
    g = jax.lax.dot_general(t5Tc, q, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)
    return (g[0:fc], g[fc:2 * fc], g[2 * fc:3 * fc], g[3 * fc:4 * fc],
            g[4 * fc:5 * fc])


def chunk_uvwta(t5c, q):
    '''[5FC, 14] @ [14, NR] -> U, V, W, B(=b0), An(= -a0) as [FC, NR].

    Matmul precision: jax's DEFAULT on TPU feeds the MXU single-pass
    bf16-truncated inputs with f32 accumulation.  Measured: explicitly
    casting the operands to bf16 produces BIT-IDENTICAL images at the
    same speed (the truncation already happens), and Precision.HIGHEST
    (3-pass exact f32) blew the compile budget on the chunked kernel.
    The ~2^-9 coefficient quantization is invisible at render noise
    levels — the f32 tail (reciprocal, compares) is what preserves the
    hit ordering.'''
    fc = t5c.shape[0] // 5
    g = jnp.dot(t5c, q, preferred_element_type=jnp.float32)
    return (g[0:fc], g[fc:2 * fc], g[2 * fc:3 * fc], g[3 * fc:4 * fc],
            g[4 * fc:5 * fc])


def chunk_valid(U, V, W, B, An, base, avoid):
    '''Division-free validity in 11 ops/pair (vs 14 for the compare-
    per-term form):
      u,v,w >= 0  <=>  U,V,W sign-match B  <=>  (U^B)|(V^B)|(W^B) >= 0
                       (sign-BIT tests; bitcasts are free views)
      t > 0       <=>  An and B same sign and both nonzero
                  <=>  An * B > 0   (one mul + one compare, and it
                       subsumes every degenerate case: B == 0 parallel
                       rays, all-zero padding faces, An == 0 origins on
                       the plane — IEEE gives the product +/-0 or a
                       sign-correct value; denormal underflow to 0 only
                       drops hits with t far beyond the INF clamp)
    Valid lanes therefore have An * r strictly positive and never NaN
    (B != 0 guaranteed; denormal B gives +inf, rejected by the caller's
    t < INF far-clip test).
    Exact-edge hits whose numerator computes to -0.0 are rejected where
    the >=-form accepted them — a measure-zero semantics difference.
    KNOWN DIVERGENCE from intersect/brute.py (and the reference's
    Face.intersect): brute rejects near-parallel rays with |b0| < EPS
    (1e-6) outright; here any B != 0 with a sub-far-clip t counts, so a
    grazing ray with |b0| in (0, 1e-6) and small An can hit where brute
    misses.  Measure-zero in practice; the cross-check tests use scenes
    away from that edge.
    Returns (valid, fids).'''
    bi = _i32(B)
    fids = base + jax.lax.broadcasted_iota(jnp.int32, B.shape, 0)
    side = (_i32(U) ^ bi) | (_i32(V) ^ bi) | (_i32(W) ^ bi)
    valid = (side >= 0) & (An * B > 0.0) & (fids != avoid)
    return valid, fids


def key_decode_t(key, fid_mask=KEY_FID_MASK):
    '''Winner t from the packed key's own bits (the masked fid bits only
    make it ~2^-12 smaller); the KEY_MISS sentinel decodes to a NaN
    pattern, so misses fail every ordered comparison downstream.'''
    return jax.lax.bitcast_convert_type(
        key & ~jnp.int32(fid_mask), jnp.float32)


def cast_closest_chunks(t5, ext, q, avoid, interp=False,
                        fid_mask=KEY_FID_MASK, n_attr=0,
                        transposed=False, precision=None):
    '''Closest hit + exact barycentrics (+ optionally interpolated
    corner attributes) for one ray tile.

    Two passes over the face table in FACE_CHUNK chunks:
      1. nearest-hit PACKED-KEY minimum — the only per-(face, ray) work
         is validity + reciprocal + key + min (~18 ops/pair);
      2. winner one-hot (fids == winner_fid: 2 ops/pair) driving ONE
         accumulated MXU matmul against `ext` (pack_extract), which
         delivers both the winner's corner attributes and its 15 face
         coefficients; u, v and the barycentric attribute mix are then
         reconstructed per RAY (~70 ops/ray, amortized over all faces).
    The old single-pass form extracted u/v with per-chunk one-hot sums
    (~7 ops/pair more) — at 968 faces that was ~5 ms/sample of pure
    VPU tail on the 512x512 benchmark.

    t5: [5F, 14] chunk-major (pack_plucker); ext [3*n_attr + 15 (or
    more; trailing pad rows are ignored), F] (pack_extract); q [14, NR];
    avoid [*, NR] i32 face ids LOCAL to this table (block-local callers
    subtract their base once per ray).
    transposed: t5 is [QR, 5F] and q [QR, NR] (see chunk_uvwta_T).
    Returns (key [1, NR] i32 — decode with key_decode_t / & fid_mask,
    == KEY_MISS on miss (decodes to NaN: every < test rejects it for
    free) — u, v [1, NR], att [n_attr, NR] or None).  Miss lanes carry
    garbage u/v/att; callers mask on the key.
    fid_mask: key_mask_for(f) when the table exceeds 2048 ids.'''
    f = (t5.shape[1] if transposed else t5.shape[0]) // 5
    nc = -(-f // FACE_CHUNK)
    nr = q.shape[1]

    best_key = jnp.full((1, nr), KEY_MISS, jnp.int32)
    for ci in range(nc):
        fc = min(FACE_CHUNK, f - ci * FACE_CHUNK)
        if transposed:
            t5c = t5[:, 5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta_T(t5c, q, precision)
        else:
            t5c = t5[5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta(t5c, q)
        valid, fids = chunk_valid(U, V, W, B, An, ci * FACE_CHUNK, avoid)
        r = recip(B, interp, approx=True)
        # valid sign structure guarantees An * r >= 0; hits at or beyond
        # the far clip (t >= INF, incl. B ~ 0 giving inf/huge t) are
        # MISSES — matching brute.cast_closest's `t < INF` hit test.
        # (Clamping them ONTO the sentinel instead packed a key below
        # KEY_MISS, so far-clip geometry shadowed as a hit at t~999936.)
        ts = An * r
        key = jnp.where(
            valid & (ts < INF),
            (_i32(ts) & ~jnp.int32(fid_mask)) | fids,
            KEY_MISS)
        km = jnp.min(key, axis=0, keepdims=True)          # [1, NR]
        best_key = km if nc == 1 else jnp.minimum(best_key, km)

    # pass 2: winner extraction (misses match fid == fid_mask, which is
    # either no face or an arbitrary one — their lanes are masked by
    # the caller, and the select below never propagates their values)
    wfid = best_key & fid_mask
    corners = None
    for ci in range(nc):
        fc = min(FACE_CHUNK, f - ci * FACE_CHUNK)
        fids = ci * FACE_CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (fc, nr), 0)
        ffc = (fids == wfid).astype(jnp.float32)
        extc = ext[:, ci * FACE_CHUNK:ci * FACE_CHUNK + fc]
        dot = jnp.dot(extc, ffc, preferred_element_type=jnp.float32)
        corners = dot if corners is None else corners + dot
    coefw = corners[3 * n_attr:]
    uw_num = sum(coefw[k:k + 1] * q[k:k + 1] for k in range(6))
    vw_num = sum(coefw[6 + k:7 + k] * q[k:k + 1] for k in range(6))
    bw = sum(coefw[12 + k:13 + k] * q[6 + k:7 + k] for k in range(3))
    rb = jnp.minimum(recip(bw, interp, approx=True), 1e18)
    u = uw_num * rb
    v = vw_num * rb
    att = None
    if n_attr:
        att = (corners[0:n_attr] * (1.0 - u - v)
               + corners[n_attr:2 * n_attr] * u
               + corners[2 * n_attr:3 * n_attr] * v)
    return best_key, u, v, att


def cast_keys_chunks(t5, q, avoid, interp=False, fid_mask=KEY_FID_MASK,
                     transposed=False, precision=None):
    '''Packed-key minimum ONLY — pass 1 of a deferred-extraction closest
    cast (the blocked traversal tracks (key, winning block) per ray and
    runs ONE gated extraction sweep after ALL blocks are visited,
    instead of paying the one-hot extraction matmuls per visit;
    measured: per-visit extraction was ~73% of the 102k-face sample).
    Returns best_key [1, NR] i32 (KEY_MISS = miss).'''
    f = (t5.shape[1] if transposed else t5.shape[0]) // 5
    nc = -(-f // FACE_CHUNK)
    nr = q.shape[1]
    best_key = jnp.full((1, nr), KEY_MISS, jnp.int32)
    for ci in range(nc):
        fc = min(FACE_CHUNK, f - ci * FACE_CHUNK)
        if transposed:
            t5c = t5[:, 5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta_T(t5c, q, precision)
        else:
            t5c = t5[5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta(t5c, q)
        valid, fids = chunk_valid(U, V, W, B, An, ci * FACE_CHUNK, avoid)
        r = recip(B, interp, approx=True)
        ts = An * r
        key = jnp.where(
            valid & (ts < INF),
            (_i32(ts) & ~jnp.int32(fid_mask)) | fids,
            KEY_MISS)
        km = jnp.min(key, axis=0, keepdims=True)
        best_key = km if nc == 1 else jnp.minimum(best_key, km)
    return best_key


def extract_winner(ext, q, onehot, interp=False, n_attr=0):
    '''Winner extraction for ONE block given its [F, NR] one-hot (at
    most one set row per ray lane across ALL calls): accumulatable
    [3*n_attr + 15, NR] corner/coefficient mix via one MXU matmul.
    Finish with finish_extraction once every ray's winner is in.'''
    return jnp.dot(ext, onehot, preferred_element_type=jnp.float32)


def finish_extraction(corners, q, interp=False, n_attr=0):
    '''u, v and barycentric attribute mix from the accumulated corner
    table (see cast_closest_chunks pass 2).'''
    coefw = corners[3 * n_attr:]
    uw_num = sum(coefw[k:k + 1] * q[k:k + 1] for k in range(6))
    vw_num = sum(coefw[6 + k:7 + k] * q[k:k + 1] for k in range(6))
    bw = sum(coefw[12 + k:13 + k] * q[6 + k:7 + k] for k in range(3))
    rb = jnp.minimum(recip(bw, interp, approx=True), 1e18)
    u = uw_num * rb
    v = vw_num * rb
    att = None
    if n_attr:
        att = (corners[0:n_attr] * (1.0 - u - v)
               + corners[n_attr:2 * n_attr] * u
               + corners[2 * n_attr:3 * n_attr] * v)
    return u, v, att


def cast_mint_chunks(t5, q, avoid, interp=False, transposed=False,
                     farclip=True, precision=None):
    '''Nearest valid t per ray, [1, NR] f32 (INF = no hit), chunked like
    cast_closest_chunks.  The batched occlusion test: compare against
    the light distance wherever that value lives cheaply.
    farclip=False drops the t < INF far-clip test (2 ops/pair): callers
    that only compare the result against a FINITE tmax (the megakernel's
    NEE shadow test — light distances are always < INF) get identical
    occlusion bits without paying for the clip.'''
    f = (t5.shape[1] if transposed else t5.shape[0]) // 5
    nc = -(-f // FACE_CHUNK)
    nr = q.shape[1]
    best = jnp.full((1, nr), INF)
    for ci in range(nc):
        fc = min(FACE_CHUNK, f - ci * FACE_CHUNK)
        if transposed:
            t5c = t5[:, 5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta_T(t5c, q, precision)
        else:
            t5c = t5[5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta(t5c, q)
        valid, _ = chunk_valid(U, V, W, B, An, ci * FACE_CHUNK, avoid)
        r = recip(B, interp, approx=True)
        # t >= INF is a miss (brute parity; see cast_closest_chunks)
        ts = An * r
        if farclip:
            ts = jnp.where(valid & (ts < INF), ts, INF)
        else:
            ts = jnp.where(valid, ts, INF)
        best = jnp.minimum(best, jnp.min(ts, axis=0, keepdims=True))
    return best
