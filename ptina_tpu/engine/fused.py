'''
Fused whole-path Pallas megakernel.

The wavefront integrator (engine/path.py) runs each bounce as separate
device passes: a closest-hit Pallas cast, a shadow Pallas cast, and an
XLA shading fusion, with the [N]-ray state round-tripping HBM between
them.  Profiling (tools/profile_tpu.py) shows those boundaries cost
~2 ms of the ~4.2 ms per 512x512 sample.  This module fuses the ENTIRE
path — all MAX_DEPTH bounces: cast, direct-light MIS, NEE + shadow
cast, Disney sampling — into ONE Pallas kernel: the triangle table,
material table and light table live in VMEM for the whole path, per-ray
state lives in registers/VMEM tiles, and the only HBM traffic is the
primary rays + per-path uniforms in and the radiance out.

Semantics are identical to engine/path.path_trace (same reference
behavior: ptina/engine/path.py:17-64); tests/test_fused.py checks the
two integrators agree ray-for-ray.  The BSDF/material/light math is the
same code (materials/disney.py etc. are pure jnp functions, so they
trace directly inside the kernel on [1, TR] rows).

Eligibility (dispatched by engine/path.render_sample at trace time):
TPU backend, face table <= MAX_FUSED_FACES, texture atlas within the
in-VMEM fetch budget (MAX_FUSED_TEX_BYTES / MAX_FUSED_TEX_BINDINGS).
The kernel is forward-only; differentiable renders pair it with a
wavefront-recompute backward via jax.custom_vjp (fused_trace_diff),
and MLT chain replay feeds it explicit uniform rows
(fused_trace_uniforms).
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptina_tpu.utils.mathutils import INF
from ptina_tpu.intersect.plucker import (
    FACE_CHUNK, KEY_FID_MASK, KEY_MISS, pack_plucker, pack_extract,
    cast_closest_chunks, cast_mint_chunks, chunk_uvwta, chunk_valid,
    key_decode_t, key_mask_for, recip)
from ptina_tpu.utils.vec import V3, vdot, vdot_or_zero, vnormalize, vwhere, vavg3
from ptina_tpu.engine.path import MAX_DEPTH, power_heuristic
from ptina_tpu.materials.disney import disney_derive, disney_eval, disney_sample
from ptina_tpu.scene import LIGHT_POINT, LIGHT_AREA
from ptina_tpu.utils.mathutils import safe_sqrt
from ptina_tpu.utils.vec import vspherical

__all__ = ['MAX_FUSED_FACES', 'MAX_FUSED_TEX_BYTES', 'fused_eligible',
           'fused_trace', 'fused_trace_primary', 'fused_trace_uniforms',
           'fused_trace_diff']

MAX_FUSED_FACES = 2560  # per-chunk working set is bounded (FACE_CHUNK),
# so this cap is about total VMEM tables + the unrolled chunk-loop's
# compile time (40 chunks x 2 passes x 2 casts x depth); covers the
# matball / envlight benchmark scenes (2216 faces)

# Texture atlases up to this packed-f32 size ride inside the kernel
# (VMEM-resident, fetched by the weight-matmul of _tex_bilinear_k); a
# 64x64 RGBA texture is 64 KB.  Bigger atlases fall back to wavefront.
MAX_FUSED_TEX_BYTES = 4 * 1024 * 1024
MAX_FUSED_TEX_BINDINGS = 8  # unrolled (material, param, texid) triples


def _tr_for(f):
    # the cast works set is bounded per FACE_CHUNK (not per F), so the
    # lane tile stays wide regardless of face count.  (Swept round 5:
    # TR=1024 measured 671 sps on cornell vs 512's ~685; SPB=16
    # measured 668 — both knobs stay put.)
    return 512


def fused_eligible(scene):
    '''Static (trace-time) check: can this scene use the megakernel?'''
    tex = scene.textures.data
    no_tex = tex.shape[1] == 1 and tex.shape[2] == 1
    tex_ok = no_tex or (
        tex.size * 4 <= MAX_FUSED_TEX_BYTES
        and len(scene.materials.textured) <= MAX_FUSED_TEX_BINDINGS)
    if scene.world_textured and no_tex:
        tex_ok = False  # world_tex points at a texture that isn't loaded
    return (jax.default_backend() == 'tpu'
            and scene.tri_w2b.shape[0] <= MAX_FUSED_FACES
            and scene.accel != 'blocked'
            and tex_ok)


# in-kernel geometry: the shared Plücker cast core (intersect/plucker.py)
# — one [5FC, 14] @ [14, NR] matmul per face chunk plus a division-free
# packed-key tail.  See that module for the math and the op-count
# budget; this kernel contributes only the tile layout around it.


# ---------------------------------------------------------------------------
# in-kernel lights: same math as lights.py but reading the packed
# [18, L] table (rows 0-2 pos, 3-5 color, 6-8/9-11/12-14 axes x/y/z,
# 15 size, 16 type).  Kept in lockstep with lights.lights_hit /
# lights_sample (reference ptina/light/__init__.py:51-121);
# tests/test_fused.py guards against drift.
# ---------------------------------------------------------------------------

def _lt_v3(lt, row, l):
    return V3(lt[row, l], lt[row + 1, l], lt[row + 2, l])


# the sphere/rect primitives trace directly inside the kernel (pure
# elementwise jnp over V3 rows): ONE implementation, shared with the
# wavefront light queries.
from ptina_tpu.lights import ray_sphere as _sphere_t, ray_rect as _rect_t


def _lights_hit_k(lt, count, ro, rd, kinds=('point', 'area')):
    # NOTE all masks are built as [1, TR] VECTORS (scalar bools broadcast
    # into vector-bool selects lower to an i8->i1 truncation Mosaic
    # rejects; comparing a broadcast f32/i32 row instead stays on i1).
    # `kinds` statically drops absent light geometry (scene.Lights.kinds).
    L = lt.shape[1]
    has_pt = 'point' in kinds
    has_ar = 'area' in kinds
    n_sh = ro.x.shape
    found = jnp.zeros(n_sh, bool)
    dis = jnp.full(n_sh, INF)
    pdf = jnp.zeros(n_sh)
    color = V3(jnp.zeros(n_sh), jnp.zeros(n_sh), jnp.zeros(n_sh))
    countv = jnp.full(n_sh, count)
    for l in range(L):
        live = jnp.int32(l) < countv
        typv = jnp.full(n_sh, lt[16, l])
        is_point = typv == float(LIGHT_POINT)
        is_area = typv == float(LIGHT_AREA)
        size = lt[15, l]
        pos = _lt_v3(lt, 0, l)
        t_sph = _sphere_t(ro, rd, pos, size * size) if has_pt else 0.0
        if has_ar:
            dirx = _lt_v3(lt, 6, l) * size
            diry = _lt_v3(lt, 9, l) * size
            hit_rect, t_rect = _rect_t(ro, rd, pos, dirx, diry)
            t_ar = jnp.where(is_area & hit_rect, t_rect, 0.0)
        else:
            t_ar = 0.0
        if has_pt and has_ar:
            t = jnp.where(is_point, t_sph, t_ar)
        elif has_pt:
            t = jnp.where(is_point, t_sph, 0.0)
        else:
            t = t_ar
        area = jnp.where(is_point, jnp.pi * size * size, 4.0 * size * size)
        # nearest light wins (dis starts INF) — see lights.lights_hit
        valid = live & (t > 0.0) & (t < dis)
        dis = jnp.where(valid, t, dis)
        pdf = jnp.where(valid, t * t / jnp.maximum(area, 1e-12), pdf)
        color = vwhere(valid, _lt_v3(lt, 3, l), color)
        found = found | valid
    return found, dis, pdf, color


def _lights_sample_k(lt, count, hitpos, su, sv, sz, kinds=('point', 'area')):
    L = lt.shape[1]
    has_pt = 'point' in kinds
    has_ar = 'area' in kinds
    n_sh = hitpos.x.shape
    cnt = jnp.maximum(count, 1)
    idx = jnp.clip((sz * cnt.astype(su.dtype)).astype(jnp.int32), 0, cnt - 1)
    zero = jnp.zeros(n_sh)
    litpos = V3(zero, zero, zero)
    nrm = V3(zero, zero, zero)
    area = zero
    color = V3(zero, zero, zero)
    is_area_sel = jnp.zeros(n_sh, bool)
    # point-light sphere trig skipped when no point light exists
    disp_pt = vspherical(su, sv) if has_pt else None
    lx = su * 2.0 - 1.0
    ly = sv * 2.0 - 1.0
    for l in range(L):
        sel = idx == l
        size = lt[15, l]
        pos = _lt_v3(lt, 0, l)
        # vector mask (see _lights_hit_k note on scalar bools)
        is_area = jnp.full(n_sh, lt[16, l]) == float(LIGHT_AREA)
        lp_pt = pos + disp_pt * size if has_pt else None
        ax_x = _lt_v3(lt, 6, l)
        ax_y = _lt_v3(lt, 9, l)
        ax_z = _lt_v3(lt, 12, l)
        lp_ar = pos + (ax_x * lx + ax_y * ly) * size if has_ar else None
        if has_pt and has_ar:
            lp = vwhere(is_area, lp_ar, lp_pt)
        elif has_ar:
            lp = lp_ar
        elif has_pt:
            lp = lp_pt
        else:
            lp = pos + V3(zero, zero, zero)
        ar = jnp.where(is_area, 4.0 * size * size, jnp.pi * size * size)
        nr = vwhere(is_area, ax_z, 0.0)
        litpos = vwhere(sel, lp, litpos)
        nrm = vwhere(sel, nr, nrm)
        area = jnp.where(sel, ar, area)
        color = vwhere(sel, _lt_v3(lt, 3, l), color)
        # logical ops, not where(): selecting between i1 vectors lowers
        # to an i8 select + i8->i1 trunci that Mosaic rejects
        is_area_sel = (sel & is_area) | (~sel & is_area_sel)
    toli = litpos - hitpos
    dis = jnp.maximum(safe_sqrt(vdot(toli, toli)), 1e-12)
    direction = toli * (1.0 / dis)
    pdf = dis * dis / jnp.maximum(area, 1e-12)
    out_color = color * (1.0 / pdf)
    cosine = jnp.maximum(0.0, vdot(nrm, direction))
    out_color = vwhere(is_area_sel, out_color * cosine, out_color)
    empty = jnp.full(n_sh, count) == 0
    return (jnp.where(empty, INF, dis), vwhere(empty, 0.0, direction),
            jnp.where(empty, 0.0, pdf), vwhere(empty, 0.0, out_color))


ONEHOT_FETCH_MIN_MATERIALS = 9  # table size where the MXU form wins


def _fetch_material_k(fac, mtlid, mtl_lanes, tr):
    '''Material-table fetch, strategy picked by TABLE SIZE at trace
    time.  Small tables (the common case) use the unrolled select
    chain on [RG, TR] tiles — ~14 whole-tile selects per material per
    bounce, and no relayouts.  Big tables switch to a ONE-HOT MXU
    matmul ([14, M+1] @ one-hot [M+1, NR]), which is O(1) in M where
    the unrolled chain would cost ~900 vector ops at the reference's
    max_materials=64 (ptina/things.py:15); its price is 14 lane->row
    relayouts, which measurably slowed the M=5 cornell kernel when
    used unconditionally.
    mtlid: [RG, TR] i32 rows; mtl_lanes: the same ids lane-major
    [1, RG*TR] (-1 = defaults row in both).  Returns RAW (basecolor V3
    [RG, TR], 11 scalar [RG, TR] rows); the caller applies texture
    modulation (if any) and disney_derive.'''
    m1 = fac.shape[1]
    if m1 >= ONEHOT_FETCH_MIN_MATERIALS:
        row = jnp.where(mtl_lanes < 0, m1 - 1, mtl_lanes)
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (m1, row.shape[1]), 0)
        oh = (rows_m == row).astype(jnp.float32)
        p14 = jnp.dot(fac, oh, preferred_element_type=jnp.float32)
        r14 = _lanes_to_rows(p14, tr)
        return V3(r14[0], r14[1], r14[2]), r14[3:]
    row = jnp.where(mtlid < 0, m1 - 1, mtlid)
    base = V3(jnp.broadcast_to(fac[0, m1 - 1], row.shape),
              jnp.broadcast_to(fac[1, m1 - 1], row.shape),
              jnp.broadcast_to(fac[2, m1 - 1], row.shape))
    scal = [jnp.broadcast_to(fac[3 + p, m1 - 1], row.shape)
            for p in range(11)]
    for m in range(m1 - 1):
        sel = row == m
        base = vwhere(sel, V3(fac[0, m], fac[1, m], fac[2, m]), base)
        for p in range(11):
            scal[p] = jnp.where(sel, fac[3 + p, m], scal[p])
    return base, scal


def _derive_material_k(base, scal):
    from ptina_tpu.scene import MATERIAL_PARAMS
    params = {'basecolor': base}
    for p, name in enumerate(MATERIAL_PARAMS[1:]):
        params[name] = scal[p]
    return disney_derive(params)


# ---------------------------------------------------------------------------
# in-kernel texture fetch.  A per-lane gather is unavailable on the VPU,
# so the bilinear fetch is re-expressed as dense linear algebra over the
# VMEM-resident atlas (semantics identical to texture.sample_texture,
# reference ptina/image.py:137-148):
#   * the x-axis taps become a WEIGHT MATRIX Wx [H, NR] with (1-fx) at
#     row ix and fx at row ix+1 (wrapped), so ONE MXU matmul
#     [4W, H] @ [H, NR] yields every ray's x-interpolated texel row;
#   * the y-axis taps reduce the channel-major rows against the same
#     trick's Wy [W, NR] on the VPU (a per-lane weighted sum, 2 ops/texel
#     row).
# Cost per (texture, ray tile): ~5 ops * (H + W) rows * NR lanes of VPU
# plus one small matmul — ~5 M ops at 64x64/4096, a few percent of a
# bounce, versus the wavefront path's per-ray HBM gathers.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# in-kernel uniforms.  The integrator's random contract is
# u[d] = mod(sobol_point[d] + rotation(pixel, d), 1)  (sampling/sobol.py):
# the Sobol point is a per-SAMPLE [dims] vector (rides in SMEM) and the
# rotation a wang-hash of (pixel_hash, d).  Generating the rows inside
# the kernel replaces a [32, N] HBM round trip + block relayout
# (~33 MB/sample each way) with ~10 integer ops per row — measured
# ~0.2 ms/sample back at 512x512 (586 -> ~650 sps class).
# ---------------------------------------------------------------------------

_GOLD = 0x9e3779b9


def _wanghash_k(x):
    '''sampling.wanghash on i32 lanes (Mosaic path): u32 wrapping
    add/mul match i32 two's complement; shifts must be LOGICAL.'''
    sr = jax.lax.shift_right_logical
    x = (x ^ 61) ^ sr(x, 16)
    x = x * 9
    x = x ^ sr(x, 4)
    x = x * jnp.int32(0x27d4eb2d)
    x = x ^ sr(x, 15)
    return x


def _u32f(x):
    '''Bit pattern (i32) -> float in [0, 1) as if unsigned / 2^32.'''
    f = x.astype(jnp.float32)
    f = jnp.where(f < 0.0, f + 4294967296.0, f)
    return f * jnp.float32(1.0 / 4294967296.0)


def _urow_k(pt_ref, base, d):
    '''Uniform row d for a [RG, TR] tile of pixel hashes `base`
    (== sampling.wanghash2(i, j) bit pattern).'''
    dg = (d * _GOLD) & 0xFFFFFFFF
    rot = _u32f(_wanghash_k(base + jnp.int32(dg - 0x100000000 if dg >= 0x80000000 else dg)))
    u = pt_ref[0, d] + rot
    return jnp.where(u >= 1.0, u - 1.0, u)


def _atan2_k(y, x):
    '''atan2 for the in-kernel equirect mapping (Mosaic has no atan2
    lowering).  Octant range reduction + the classic 4-term odd
    minimax polynomial on [0, 1] (|err| ~ 1e-4 rad ~ 2e-3 texel at a
    128-wide environment map).'''
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    t = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    t2 = t * t
    r = t * (0.9998660 + t2 * (-0.3302995
                               + t2 * (0.1801410 + t2 * (-0.0851330))))
    r = jnp.where(ay > ax, 1.5707964 - r, r)
    r = jnp.where(x < 0.0, 3.1415927 - r, r)
    return jnp.where(y < 0.0, -r, r)


def _tex_bilinear_k(texp, nx, ny, s, t, W, H, theta):
    '''Bilinear wrap-around fetch of texture `theta` for one lane-major
    ray tile.  texp: [T*4W, H] packed atlas (channel-major over W,
    transposed -- see _pack_textures); nx/ny: live extents (f32 scalars);
    s, t: [1, NR].  Returns [rgba] as four [1, NR] rows.'''
    nr = s.shape[1]
    px = s * (nx - 1.0)
    py = t * (ny - 1.0)
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    fx = px - ix
    fy = py - iy
    # wrap (reference semantics); f32 int arithmetic is exact < 2^24,
    # compares run in i32 (Mosaic's iota is integer-only)
    ix0 = jnp.mod(ix, nx).astype(jnp.int32)
    ix1 = jnp.mod(ix + 1.0, nx).astype(jnp.int32)
    iy0 = jnp.mod(iy, ny).astype(jnp.int32)
    iy1 = jnp.mod(iy + 1.0, ny).astype(jnp.int32)
    rows_h = jax.lax.broadcasted_iota(jnp.int32, (H, nr), 0)
    wx = (jnp.where(rows_h == ix0, 1.0 - fx, 0.0)
          + jnp.where(rows_h == ix1, fx, 0.0))
    tex4wh = texp[theta * 4 * W:(theta + 1) * 4 * W]   # [4W, H] static slice
    rowmix = jnp.dot(tex4wh, wx, preferred_element_type=jnp.float32)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, nr), 0)
    wy = (jnp.where(rows_w == iy0, 1.0 - fy, 0.0)
          + jnp.where(rows_w == iy1, fy, 0.0))
    return [jnp.sum(rowmix[c * W:(c + 1) * W] * wy, axis=0, keepdims=True)
            for c in range(4)]


# ---------------------------------------------------------------------------
# the megakernel
# ---------------------------------------------------------------------------
#
# Ray-block layout: each grid step owns RG x TR rays arranged as an
# [RG, TR] tile (RG = 8 sublanes, TR lanes).  All per-ray math — lights,
# material fetch, the whole Disney BSDF — runs on full (8, 128) VPU
# granules; a [1, TR] row layout would waste 7/8 of every vector
# instruction and drown in issue overhead (measured: the row-shaped
# variant was ~2x slower than the wavefront it meant to beat).  The
# casts need rays on the LANE axis against [F, TR] triangle tiles, so
# they run per sublane group g, and the eight [1, TR] results are
# stacked back into [RG, TR].

RG = 8  # ray sublane-group rows per grid step


def _group_q(ro, rd, g, ones1, zeros1):
    '''Ray feature 14-vector [q, TR] for sublane group g: the 6 Plücker
    coordinates of the homogeneous (o,1)/(d,0) pair in (i<j) order —
    where p_i3 collapses to -d_i — then d and o themselves.'''
    ox, oy, oz = ro.x[g:g + 1], ro.y[g:g + 1], ro.z[g:g + 1]
    dx, dy, dz = rd.x[g:g + 1], rd.y[g:g + 1], rd.z[g:g + 1]
    p01 = ox * dy - oy * dx
    p02 = ox * dz - oz * dx
    p12 = oy * dz - oz * dy
    return jnp.concatenate([p01, p02, -dx, p12, -dy, -dz,
                            dx, dy, dz, zeros1,
                            ox, oy, oz, ones1], axis=0)


# --- per-chunk AABB culling -------------------------------------------------
# The megakernel's casts scan every 64-face chunk for every ray tile —
# O(F) per ray, a 19.6x slowdown from cornell (34 tris) to monkey (978)
# where the reference's BVH costs 2.5x (ptina/tree/lbvh.py:313-347,
# README.md:44,50).  Chunks are spatially coherent (construction order /
# Morton), so each carries an AABB; per bounce the kernel slab-tests
# every live ray against every chunk box (~22 VPU ops/ray/chunk, <1 us
# a tile) and reduces each chunk's mask to ONE SCALAR.  Chunks no ray
# can touch are skipped with @pl.when — measured ~0.08 us per
# conditional vs ~2 us per chunk visit, and the winner-extraction pass
# gets the same treatment keyed on which chunks actually WON a ray.
# The test is conservative (superset of chunks with reachable faces, on
# an epsilon-inflated box), so radiance is bit-identical to the
# unculled scan; tests/test_fused.py's parity suite covers it.

def _chunk_conds(aabb_ref, nc, ro, rd, mask, tmax=None, interp=False):
    '''Per-chunk scalar "any live ray can enter this box" predicates.
    ro, rd: V3 [RG, TR] tiles; mask: [RG, TR] bool (alive / live);
    tmax: optional [RG, TR] upper bound on useful t (NEE light
    distance).  Chunk boxes come from SMEM rows (lo3, hi3) built by
    _pack_chunk_aabbs; all-padding chunks carry an inverted box, so
    their slab test fails for every ray.'''
    dx = jnp.where(jnp.abs(rd.x) < 1e-12, 1e-12, rd.x)
    dy = jnp.where(jnp.abs(rd.y) < 1e-12, 1e-12, rd.y)
    dz = jnp.where(jnp.abs(rd.z) < 1e-12, 1e-12, rd.z)
    ix = recip(dx, interp)
    iy = recip(dy, interp)
    iz = recip(dz, interp)
    conds = []
    for c in range(nc):
        t1x = (aabb_ref[c, 0] - ro.x) * ix
        t2x = (aabb_ref[c, 3] - ro.x) * ix
        t1y = (aabb_ref[c, 1] - ro.y) * iy
        t2y = (aabb_ref[c, 4] - ro.y) * iy
        t1z = (aabb_ref[c, 2] - ro.z) * iz
        t2z = (aabb_ref[c, 5] - ro.z) * iz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                      jnp.maximum(t1y, t2y)),
                          jnp.maximum(t1z, t2z))
        m = mask & (near <= far) & (far > 0.0)
        if tmax is not None:
            m = m & (near < tmax)
        conds.append(jnp.sum(m.astype(jnp.int32)) > 0)
    return conds


def _pack_chunk_aabbs(tri_pos, nfaces, fc=FACE_CHUNK):
    '''[nc, 8] f32 chunk-AABB table for SMEM: (lo.xyz, hi.xyz, 0, 0)
    over each FACE_CHUNK of LIVE faces (padding faces are degenerate
    all-zero triangles that never hit, so excluding them keeps the box
    conservative); inflated by a relative epsilon so f32 rounding in the
    kernel's slab test can never drop a true hit.  All-padding chunks
    get an inverted box (every slab test fails).'''
    f = tri_pos.shape[0]
    nc = -(-f // fc)
    big = jnp.float32(3.4e38)
    live = (jnp.arange(f) < nfaces)[:, None, None]
    vmin = jnp.min(jnp.where(live, tri_pos, big), axis=1)    # [F, 3]
    vmax = jnp.max(jnp.where(live, tri_pos, -big), axis=1)
    pad = nc * fc - f
    if pad:
        vmin = jnp.concatenate([vmin, jnp.full((pad, 3), big)])
        vmax = jnp.concatenate([vmax, jnp.full((pad, 3), -big)])
    lo = vmin.reshape(nc, fc, 3).min(axis=1)
    hi = vmax.reshape(nc, fc, 3).max(axis=1)
    eps = 1e-5 * (jnp.abs(lo) + jnp.abs(hi) + 1.0)
    inverted = lo[:, 0] > hi[:, 0]
    lo = jnp.where(inverted[:, None], lo, lo - eps)
    hi = jnp.where(inverted[:, None], hi, hi + eps)
    return jnp.concatenate([lo, hi, jnp.zeros((nc, 2))], axis=1)


# --- batched whole-tile casts -----------------------------------------------
# The per-group casts above issue 8 small [5F, 14] @ [14, TR] matmuls per
# bounce.  The batched forms below lay the 8 sublane groups side by side
# on the LANE axis instead — one [5F, 14] @ [14, RG*TR] matmul per cast —
# and re-slice the [*, RG*TR] results back into [RG, TR] tiles.  The
# result slices land on TR (>= 128-lane = whole-vreg) boundaries, so
# they relayout cheaply; the matmul count per bounce drops 8x.
#
# The lane-major inputs come for free: the ray feature matrix is built
# per sublane group exactly as before (concat along lanes), and `avoid`
# is threaded through the bounce loop in LANE-MAJOR form (it is produced
# lane-major by the previous cast) — Mosaic cannot cheaply concatenate
# sublane-offset rows onto the lane axis, so no [RG, TR] value is ever
# converted in that direction.

def _lanes_to_rows(x, tr):
    '''[C, RG*TR] -> list of C [RG, TR] tiles (lane slices at vreg-
    aligned offsets, concatenated across sublanes).'''
    outs = []
    for c in range(x.shape[0]):
        row = x[c:c + 1]
        outs.append(jnp.concatenate(
            [row[:, g * tr:(g + 1) * tr] for g in range(RG)], axis=0))
    return outs


def _tile_q(ro, rd, ones1, zeros1):
    '''Ray feature matrix [14, RG*TR] for a whole [RG, TR] tile.'''
    qs = [_group_q(ro, rd, g, ones1, zeros1) for g in range(RG)]
    return jnp.concatenate(qs, axis=1)


def _culled_closest(t5, ext, q, avoid, interp, fid_mask, conds,
                    key_ref, ext_ref, n_attr=6):
    '''cast_closest_chunks with per-chunk @pl.when skipping: pass 1
    accumulates the packed-key minimum in key_ref [1, NR] i32 under
    `conds`; pass 2 accumulates winner extraction in ext_ref under
    "any ray's winner fid lies in this chunk".  Same math as the
    shared core (intersect/plucker.py) — the culling only removes
    chunks whose faces no ray can reach, so results are identical.'''
    f = t5.shape[0] // 5
    nc = -(-f // FACE_CHUNK)
    nr = q.shape[1]
    key_ref[:] = jnp.full((1, nr), KEY_MISS, jnp.int32)
    for ci in range(nc):
        @pl.when(conds[ci])
        def _(ci=ci):
            fc = min(FACE_CHUNK, f - ci * FACE_CHUNK)
            t5c = t5[5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta(t5c, q)
            valid, fids = chunk_valid(U, V, W, B, An, ci * FACE_CHUNK,
                                      avoid)
            r = recip(B, interp, approx=True)
            ts = An * r
            key = jnp.where(
                valid & (ts < INF),
                (jax.lax.bitcast_convert_type(ts, jnp.int32)
                 & ~jnp.int32(fid_mask)) | fids,
                KEY_MISS)
            key_ref[:] = jnp.minimum(key_ref[:],
                                     jnp.min(key, axis=0, keepdims=True))
    best_key = key_ref[:]

    wfid = best_key & fid_mask
    ext_ref[:] = jnp.zeros(ext_ref.shape)
    for ci in range(nc):
        fc = min(FACE_CHUNK, f - ci * FACE_CHUNK)

        # winner extraction keyed on the SLAB conds (a chunk can only
        # win if it was visited) — an exact "did chunk ci win any ray"
        # reduce on wfid was measured SLOWER: its vector->scalar sync
        # against the just-computed key minimum drains the pipeline
        # (~1.6 sps on cornell_monkey), while the slab conds were
        # computed up front and are long ready
        @pl.when(conds[ci])
        def _(ci=ci, fc=fc):
            fids = ci * FACE_CHUNK + jax.lax.broadcasted_iota(
                jnp.int32, (fc, nr), 0)
            ffc = (fids == wfid).astype(jnp.float32)
            extc = ext[:, ci * FACE_CHUNK:ci * FACE_CHUNK + fc]
            ext_ref[:] = ext_ref[:] + jnp.dot(
                extc, ffc, preferred_element_type=jnp.float32)
    corners = ext_ref[:]
    coefw = corners[3 * n_attr:]
    uw_num = sum(coefw[k:k + 1] * q[k:k + 1] for k in range(6))
    vw_num = sum(coefw[6 + k:7 + k] * q[k:k + 1] for k in range(6))
    bw = sum(coefw[12 + k:13 + k] * q[6 + k:7 + k] for k in range(3))
    rb = jnp.minimum(recip(bw, interp, approx=True), 1e18)
    u = uw_num * rb
    v = vw_num * rb
    att = (corners[0:n_attr] * (1.0 - u - v)
           + corners[n_attr:2 * n_attr] * u
           + corners[2 * n_attr:3 * n_attr] * v)
    return best_key, u, v, att


def _tile_cast_closest(t5, attrs, ro, rd, avoid_lanes, ones1, zeros1,
                       interp, conds=None, key_ref=None, ext_ref=None):
    '''Closest cast of all RG*TR rays of a tile in ONE matmul.
    avoid_lanes: [1, RG*TR] i32.  conds/key_ref/ext_ref: per-chunk cull
    predicates + scratch accumulators (None = unconditional scan).
    Returns (t [RG, TR], index [RG, TR] i32, index_lanes [1, RG*TR]
    i32, attrs 6 x [RG, TR], attrs_lanes [6, RG*TR] — the same
    attributes pre-relayout, for consumers that need lane-major rows
    like the texture fetch).'''
    tr = ro.x.shape[1]
    # tables above 2048 faces need wider fid bits or hits on faces
    # >= 2048 alias down by the mask (advisor round 4: matball's 2216
    # faces fetched face f-2048's attributes)
    fid_mask = key_mask_for(t5.shape[0] // 5)
    q = _tile_q(ro, rd, ones1, zeros1)
    if conds is None:
        key, _, _, out = cast_closest_chunks(t5, attrs, q, avoid_lanes,
                                             interp, fid_mask=fid_mask,
                                             n_attr=6)
    else:
        key, _, _, out = _culled_closest(t5, attrs, q, avoid_lanes,
                                         interp, fid_mask, conds,
                                         key_ref, ext_ref)
    hitm = key != KEY_MISS
    tmin = jnp.where(hitm, key_decode_t(key, fid_mask), INF)
    idx = jnp.where(hitm, key & fid_mask, -1)
    out = jnp.where(hitm, out, 0.0)
    t = _lanes_to_rows(tmin, tr)[0]
    index = _lanes_to_rows(idx, tr)[0]
    a6 = _lanes_to_rows(out, tr)
    return t, index, idx, a6, out


def _tile_cast_mint(t5, ro, rd, avoid_lanes, ones1, zeros1, interp,
                    conds=None, t_ref=None):
    '''Nearest-valid-t cast of a whole tile in one matmul, [RG, TR] f32
    (INF = clear).  Shadow test: occluded iff result < light distance.
    conds/t_ref: per-chunk cull predicates + scratch (None = scan).'''
    tr = ro.x.shape[1]
    q = _tile_q(ro, rd, ones1, zeros1)
    if conds is None:
        # farclip=False: the caller compares against finite light
        # distances
        tmin = cast_mint_chunks(t5, q, avoid_lanes, interp, farclip=False)
        return _lanes_to_rows(tmin, tr)[0]
    f = t5.shape[0] // 5
    nc = -(-f // FACE_CHUNK)
    t_ref[:] = jnp.full(t_ref.shape, INF)
    for ci in range(nc):
        @pl.when(conds[ci])
        def _(ci=ci):
            fc = min(FACE_CHUNK, f - ci * FACE_CHUNK)
            t5c = t5[5 * ci * FACE_CHUNK:5 * ci * FACE_CHUNK + 5 * fc]
            U, V, W, B, An = chunk_uvwta(t5c, q)
            valid, _ = chunk_valid(U, V, W, B, An, ci * FACE_CHUNK,
                                   avoid_lanes)
            r = recip(B, interp, approx=True)
            ts = jnp.where(valid, An * r, INF)
            t_ref[:] = jnp.minimum(t_ref[:],
                                   jnp.min(ts, axis=0, keepdims=True))
    return _lanes_to_rows(t_ref[:], tr)[0]


def _cam_rays_k(cam_ref, x, y):
    '''camera.camera_rays (unproject-two-points) on [RG, TR] NDC tiles
    with the view->world 4x4 read from SMEM as a row-major [1, 16].'''
    def m(i, j):
        return cam_ref[0, 4 * i + j]

    def unproject(z):
        px = m(0, 0) * x + m(0, 1) * y + m(0, 2) * z + m(0, 3)
        py = m(1, 0) * x + m(1, 1) * y + m(1, 2) * z + m(1, 3)
        pz = m(2, 0) * x + m(2, 1) * y + m(2, 2) * z + m(2, 3)
        pw = m(3, 0) * x + m(3, 1) * y + m(3, 2) * z + m(3, 3)
        inv = 1.0 / pw
        return V3(px * inv, py * inv, pz * inv)

    ro = unproject(-1.0)
    ro1 = unproject(1.0)
    return ro, vnormalize(ro1 - ro)


def _path_kernel(rays_ref, *refs,
                 interp=False, zero=(), textured=(), tex_hw=(1, 1),
                 env_tex=-1, lkinds=('point', 'area'), cull=False,
                 explicit_u=False, primary=None):
    # positional ref tail: [base, pt (in-kernel RNG) | u (explicit
    # uniforms, MLT replay) | pt (primary mode: rays_ref IS the SMEM
    # camera matrix)], the scene tables, [texp, texdim (texture-using
    # scenes only)], [aabb (multi-chunk scenes only)], cnt, wf inputs,
    # the r/g/b outputs, then [key/ext/t scratch (multi-chunk only)]
    refs = list(refs)
    if primary is not None:
        cam_ref = rays_ref
        off_ref = refs.pop(0)
        pt_ref = refs.pop(0)
        base_ref = u_ref = None
    elif explicit_u:
        u_ref = refs.pop(0)
        base_ref = pt_ref = None
    else:
        base_ref = refs.pop(0)
        pt_ref = refs.pop(0)
        u_ref = None
    m_all_ref = refs.pop(0)
    attr_ref = refs.pop(0)
    fac_ref = refs.pop(0)
    lt_ref = refs.pop(0)
    if cull:
        t_scr = refs.pop()
        ext_scr = refs.pop()
        key_scr = refs.pop()
    else:
        key_scr = ext_scr = t_scr = None
    if textured or env_tex >= 0:
        texp_ref, texdim_ref = refs[0], refs[1]
        refs = refs[2:]
    else:
        texp_ref = texdim_ref = None
    aabb_ref = refs.pop(0) if cull else None
    cnt_ref, wf_ref, r_ref, g_ref, b_ref = refs
    if primary is not None:
        # PRIMARY mode: generate the camera rays in-kernel from the
        # global ray index — no [6, N] ray block ever touches HBM, and
        # the per-dispatch XLA prologue (lens rotation, camera matmul,
        # ray packing) disappears.  Pixel ids come from an exact
        # float-reciprocal division by the static row length (p < 2^24;
        # one-step correction makes the quotient exact).
        nx_, ny_, fnx_, fny_, tr = primary
        x0_ = off_ref[0, 0]
        y0_ = off_ref[0, 1]
        gi = pl.program_id(0)
        p = (gi * (RG * tr)
             + jax.lax.broadcasted_iota(jnp.int32, (RG, tr), 0) * tr
             + jax.lax.broadcasted_iota(jnp.int32, (RG, tr), 1))
        fp = p.astype(jnp.float32)
        iia = jnp.floor(fp * jnp.float32(1.0 / ny_)).astype(jnp.int32)
        rem = p - iia * ny_
        iia = iia + (rem >= ny_).astype(jnp.int32) \
            - (rem < 0).astype(jnp.int32)
        jja = p - iia * ny_
        ii = x0_ + iia
        jj = y0_ + jja
        # sampling.wanghash2 on i32 bit patterns (== its u32 math)
        pbase = _wanghash_k(_wanghash_k(ii) + jj)
        dims = pt_ref.shape[1]
        depth = (dims - 2) // 6
        u0 = _urow_k(pt_ref, pbase, 0)
        u1 = _urow_k(pt_ref, pbase, 1)
        x = (ii.astype(jnp.float32) + u0) / fnx_ * 2.0 - 1.0
        y = (jj.astype(jnp.float32) + u1) / fny_ * 2.0 - 1.0
        ro, rd = _cam_rays_k(cam_ref, x, y)
        urows = None
    else:
        tr = rays_ref.shape[1]
        rr = rays_ref[:].reshape(6, RG, tr)
        ro = V3(rr[0], rr[1], rr[2])
        rd = V3(rr[3], rr[4], rr[5])
        if explicit_u:
            urows = u_ref[:].reshape(-1, RG, tr)  # [6 * depth, RG, tr]
            depth = urows.shape[0] // 6
            pbase = None
        else:
            pbase = base_ref[:]  # per-pixel rotation hash rows
            dims = pt_ref.shape[1]
            depth = (dims - 2) // 6  # bounce cap in the Sobol rows
            urows = None
    t5 = m_all_ref[:]
    attrs = attr_ref[:]
    fac = fac_ref[:]
    lt = lt_ref[:]
    count = cnt_ref[0, 0]
    world = V3(wf_ref[0, 0], wf_ref[0, 1], wf_ref[0, 2])
    texp = texp_ref[:] if (textured or env_tex >= 0) else None

    n_sh = ro.x.shape
    zero = jnp.zeros(n_sh)
    one = jnp.ones(n_sh)
    ones1 = jnp.ones((1, tr))
    zeros1 = jnp.zeros((1, tr))
    result = V3(zero, zero, zero)
    throughput = V3(one, one, one)
    # INF init = full first-hit emitter weight (see engine/path.py)
    last_brdf_pdf = jnp.full(n_sh, INF)
    # self-hit exclusion, threaded in LANE-MAJOR [1, RG*TR] form (the
    # layout the casts consume and produce; see _tile_cast_closest).
    # Unlike the wavefront path it updates on every hit regardless of
    # the alive mask — dead lanes' contributions are masked out, so the
    # radiance is identical and the relayout of `live` is saved.
    avoid_lanes = jnp.full((1, RG * tr), -1, jnp.int32)
    alive = jnp.ones(n_sh, bool)

    nchunk = -(-(t5.shape[0] // 5) // FACE_CHUNK)
    for b in range(depth):
        u = [urows[6 * b + r] for r in range(6)] if explicit_u else \
            [_urow_k(pt_ref, pbase, 2 + 6 * b + r) for r in range(6)]
        rd = vnormalize(rd)

        # bounce 0 only: primary rays are pixel-coherent, so whole-tile
        # culling removes ~77% of chunk visits; from bounce 1 on the
        # tile's 4096 scattered directions touch every chunk (measured
        # saturation 1.0) and the predicates would be pure overhead
        conds = _chunk_conds(aabb_ref, nchunk, ro, rd, alive,
                             interp=interp) if cull and b == 0 else None
        t, index, idx_lanes, a6, a6_lanes = _tile_cast_closest(
            t5, attrs, ro, rd, avoid_lanes, ones1, zeros1, interp,
            conds=conds, key_ref=key_scr, ext_ref=ext_scr)
        hit = index >= 0
        normal = vnormalize(V3(a6[0], a6[1], a6[2]))
        mtlid = jnp.where(hit, jnp.round(a6[5]).astype(jnp.int32), -1)
        hitpos = ro + rd * t
        sign = -vdot(rd, normal)
        normal = vwhere(sign < 0, -normal, normal)
        mtl_l = jnp.where(idx_lanes >= 0,
                          jnp.round(a6_lanes[5:6]).astype(jnp.int32), -1)
        base, scal = _fetch_material_k(fac, mtlid, mtl_l, tr)

        # texture-modulated parameters: one in-VMEM bilinear fetch per
        # DISTINCT texture (lane-major), applied to every bound
        # (material, param) triple (mtllib.fetch_material semantics,
        # reference ParameterPair ptina/mtllib.py:30-38)
        if textured:
            H, W = tex_hw
            s_l = a6_lanes[3:4]
            t_l = a6_lanes[4:5]
            texv = {}
            for _, _, th in textured:
                if th not in texv:
                    nx = texdim_ref[0, 2 * th]
                    ny = texdim_ref[0, 2 * th + 1]
                    chans = _tex_bilinear_k(texp, nx, ny, s_l, t_l, W, H, th)
                    texv[th] = [_lanes_to_rows(c, tr)[0] for c in chans]
            for m, p, th in textured:
                selm = mtlid == m
                c = texv[th]
                if p == 0:
                    base = vwhere(selm, base * V3(c[0], c[1], c[2]), base)
                else:
                    scal[p - 1] = jnp.where(selm, scal[p - 1] * c[0],
                                            scal[p - 1])
        material = _derive_material_k(base, scal)

        # direct light hit with MIS (reference path.py:31-35)
        lhit, ldis, lpdf, lcolor = _lights_hit_k(lt, count, ro, rd,
                                                  kinds=lkinds)
        lit_vis = lhit & (~hit | (ldis < t))
        mis = power_heuristic(last_brdf_pdf, lpdf)
        result = result + vwhere(alive & lit_vis,
                                 throughput * lcolor * mis, 0.0)

        # environment on miss: constant world, or the equirect texture
        # fetched in-VMEM per sublane group (rows ARE lane-major [1, TR]
        # per group; same weight-matmul fetch as materials; reference
        # WorldLight.at semantics incl. the blender swizzle,
        # ptina/light/world.py:22-29)
        miss = ~hit
        if env_tex >= 0:
            H, W = tex_hw
            nxw = texdim_ref[0, 2 * env_tex]
            nyw = texdim_ref[0, 2 * env_tex + 1]
            chans = [[], [], []]
            for g in range(RG):
                ex, ey, ez = rd.x[g:g + 1], rd.z[g:g + 1], -rd.y[g:g + 1]
                s = _atan2_k(ez, ex) / jnp.pi * 0.5 + 0.5
                tt = _atan2_k(ey, safe_sqrt(ex * ex + ez * ez)) \
                    / jnp.pi + 0.5
                ch = _tex_bilinear_k(texp, nxw, nyw, s, tt, W, H, env_tex)
                for c in range(3):
                    chans[c].append(ch[c])
            wv = V3(world.x * jnp.concatenate(chans[0], axis=0),
                    world.y * jnp.concatenate(chans[1], axis=0),
                    world.z * jnp.concatenate(chans[2], axis=0))
            result = result + vwhere(alive & miss, throughput * wv, 0.0)
        else:
            result = result + vwhere(alive & miss, throughput * world, 0.0)
        live = alive & ~miss

        # next-event estimation (reference path.py:48-56)
        li_dis, li_dir, li_pdf, li_color = _lights_sample_k(
            lt, count, hitpos, u[0], u[1], u[2], kinds=lkinds)
        sconds = _chunk_conds(aabb_ref, nchunk, hitpos, li_dir, live,
                              tmax=li_dis, interp=interp) \
            if cull and b == 0 else None
        occ = _tile_cast_mint(t5, hitpos, li_dir, idx_lanes,
                              ones1, zeros1, interp,
                              conds=sconds, t_ref=t_scr) < li_dis
        brdf_clr = disney_eval(material, normal, sign, -1.0 * rd, li_dir,
                               zero)
        brdf_pdf = vavg3(brdf_clr)
        mis2 = power_heuristic(li_pdf, brdf_pdf)
        nee = li_color * brdf_clr * (mis2 * vdot_or_zero(normal, li_dir))
        nee_ok = live & ~occ & ((li_color.x > 0.0) | (li_color.y > 0.0)
                                | (li_color.z > 0.0))
        result = result + vwhere(nee_ok, throughput * nee, 0.0)

        # BSDF bounce (reference path.py:58-62) — skipped on the final
        # bounce: its outdir/throughput update feeds nothing (the
        # reference runs it and discards the result)
        if b == depth - 1:
            break
        outdir, pdf, color = disney_sample(material, normal, sign,
                                           -1.0 * rd, u[3], u[4], u[5],
                                           zero)
        throughput = vwhere(live, throughput * color, throughput)
        ro = vwhere(live, hitpos, ro)
        rd = vwhere(live, outdir, rd)
        avoid_lanes = jnp.where(idx_lanes >= 0, idx_lanes, avoid_lanes)
        last_brdf_pdf = jnp.where(live, pdf, last_brdf_pdf)
        alive = live \
            & ((throughput.x > 0.0) | (throughput.y > 0.0)
               | (throughput.z > 0.0)) \
            & ((rd.x != 0.0) | (rd.y != 0.0) | (rd.z != 0.0))

    r_ref[:] = result.x
    g_ref[:] = result.y
    b_ref[:] = result.z


def _pack_lights(lights):
    '''[18, L] f32 light table for the kernel (see _lights_hit_k).'''
    return jnp.concatenate([
        lights.pos.T, lights.color.T,
        lights.axes[:, :, 0].T, lights.axes[:, :, 1].T,
        lights.axes[:, :, 2].T,
        lights.size[None, :], lights.type.astype(jnp.float32)[None, :],
        jnp.zeros((1, lights.size.shape[0]), jnp.float32),
    ], axis=0)


def _pack_materials(mats):
    '''[14, M+1] f32: basecolor rgb + the 11 scalar params.'''
    f = mats.fac
    return jnp.concatenate([f[:, 0, 0:3].T, f[:, 1:12, 0].T], axis=0)


def _pack_textures(atlas):
    '''Kernel-side atlas layout: [T*4W, H] — per texture, channel-major
    rows over the y (W) axis, TRANSPOSED so _tex_bilinear_k's x-axis
    weight matmul is [4W, H] @ [H, NR] with no in-kernel relayout.
    Plus the [1, 2T] (nx, ny) extent table for SMEM.'''
    data = atlas.data  # [T, H, W, 4]
    t, h, w, _ = data.shape
    texp = data.transpose(0, 3, 2, 1).reshape(t * 4 * w, h)
    dims = jnp.stack([atlas.nx.astype(jnp.float32),
                      atlas.ny.astype(jnp.float32)], axis=1).reshape(1, 2 * t)
    return texp, dims


def _fused_call(scene, tr, nb, head_in, head_specs, interpret,
                **kernel_kwargs):
    '''Shared tail of every megakernel entry: pack the scene tables,
    wire the texture / chunk-AABB extras, and launch _path_kernel over
    an nb-block grid.  head_in/head_specs are the entry-specific
    leading operands — (rays, pixel hashes, Sobol point) for
    fused_trace, (rays, uniform rows) for fused_trace_uniforms,
    (camera, offsets, Sobol point) for fused_trace_primary — in the
    exact order _path_kernel parses them.  Returns the raw r/g/b
    [nb * RG, tr] blocks.'''
    f = scene.tri_w2b.shape[0]
    block = RG * tr

    t5 = pack_plucker(scene.tri_w2b)
    attrs = pack_extract(scene.tri_w2b, scene.tri_attrs)
    fac = _pack_materials(scene.materials)
    lt = _pack_lights(scene.lights)
    cnt = scene.lights.count.reshape(1, 1)
    wf = scene.world_fac.reshape(1, 4)

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    blk = lambda rows: pl.BlockSpec((rows, tr), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)

    textured = scene.materials.textured
    env_tex = scene.world_tex_id
    t_, h_, w_, _ = scene.textures.data.shape
    tex_in = []
    tex_specs = []
    if textured or env_tex >= 0:
        texp, texdim = _pack_textures(scene.textures)
        tex_in = [texp, texdim]
        tex_specs = [full(texp.shape), smem(texdim.shape)]

    # multi-chunk scenes cull chunks per bounce against per-chunk AABBs
    # (see _chunk_conds); single-chunk scenes skip the machinery
    cull = f > FACE_CHUNK
    aabb_in = []
    aabb_specs = []
    scratch = []
    if cull:
        aabb = _pack_chunk_aabbs(scene.tri_pos, scene.nfaces)
        aabb_in = [aabb]
        aabb_specs = [smem(aabb.shape)]
        scratch = [pltpu.VMEM((1, block), jnp.int32),
                   pltpu.VMEM((attrs.shape[0], block), jnp.float32),
                   pltpu.VMEM((1, block), jnp.float32)]

    out_sh = jax.ShapeDtypeStruct((nb * RG, tr), jnp.float32)
    return pl.pallas_call(
        functools.partial(_path_kernel, interp=interpret,
                          zero=scene.materials.zero,
                          textured=textured, tex_hw=(h_, w_),
                          env_tex=env_tex, lkinds=scene.lights.kinds,
                          cull=cull, **kernel_kwargs),
        grid=(nb,),
        in_specs=head_specs
                 + [full((5 * f, 14)), full(attrs.shape), full(fac.shape),
                    full(lt.shape)] + tex_specs + aabb_specs
                 + [smem((1, 1)), smem((1, 4))],
        out_specs=[blk(RG)] * 3,
        out_shape=[out_sh, out_sh, out_sh],
        scratch_shapes=scratch,
        interpret=interpret,
        # the unrolled chunk loop's overlapping matmul outputs push the
        # scoped-VMEM stack past Mosaic's 16 MB default on big face
        # tables; the scene tables themselves are small, so most of the
        # 128 MB VMEM is available as scratch
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*head_in, t5, attrs, fac, lt, *tex_in, *aabb_in, cnt, wf)


def _block_rows(x, nb, rows, tr):
    '''[C, N] -> per-block row-major [nb * C * RG, tr] kernel layout
    (block i's rows are its C channels x RG sublane groups).'''
    return x.reshape(rows, nb, RG, tr).transpose(1, 0, 2, 3) \
            .reshape(nb * rows * RG, tr)


def _blk_spec(rows, tr):
    return pl.BlockSpec((rows, tr), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _smem_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_trace(scene, ro, rd, pt, base, interpret=False):
    '''Trace [N] primary rays through the full path in one Pallas kernel.
    ro/rd: V3 rows.  The random stream is GENERATED IN-KERNEL from the
    per-sample Sobol point `pt` [2 + 6 * depth] (its row count sets the
    bounce cap) and the per-pixel rotation hash `base` [N] i32
    (sampling.wanghash2 bit pattern) — see _urow_k; this replaces a
    [dims, N] uniforms round trip through HBM.  Radiance parity with
    path_trace(uniforms=sample_dims(...)) holds to f32 rounding of the
    rotation (tests/test_fused.py).'''
    f = scene.tri_w2b.shape[0]
    assert f <= MAX_FUSED_FACES
    dims = pt.shape[0]
    tr = _tr_for(f)
    n = ro.x.shape[0]
    npad = -n % (RG * tr)
    rays = jnp.stack([ro.x, ro.y, ro.z, rd.x, rd.y, rd.z])  # [6, N]
    baser = base.astype(jnp.int32)[None, :]
    if npad:
        rays = jnp.pad(rays, ((0, 0), (0, npad)))
        baser = jnp.pad(baser, ((0, 0), (0, npad)))
    nb = (n + npad) // (RG * tr)
    rx, gx, bx = _fused_call(
        scene, tr, nb,
        [_block_rows(rays, nb, 6, tr), _block_rows(baser, nb, 1, tr),
         pt.reshape(1, dims)],
        [_blk_spec(6 * RG, tr), _blk_spec(RG, tr), _smem_spec((1, dims))],
        interpret)
    return V3(rx.reshape(-1)[:n], gx.reshape(-1)[:n], bx.reshape(-1)[:n])


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_trace_uniforms(scene, ro, rd, uniforms, interpret=False):
    '''fused_trace with an EXPLICIT random stream: uniforms [2 + 6 *
    depth, N] exactly as path_trace consumes them (rows 0-1 are the
    caller's lens jitter, ignored here).  This is the megakernel entry
    for MLT chain replay (engine/mlt._replay): the chain state IS the
    uniform block, so the in-kernel Sobol generator cannot serve it —
    the rows ride a [6 * depth * RG, TR] VMEM block per ray tile
    instead (reference MLTPathEngine runs the same megakernel as its
    path engine with an RNGProxy stream, ptina/engine/mltpath.py:54-83,
    ptina/sampling/__init__.py:53-64).'''
    f = scene.tri_w2b.shape[0]
    assert f <= MAX_FUSED_FACES
    u6 = uniforms[2:]
    d6 = u6.shape[0]
    tr = _tr_for(f)
    n = ro.x.shape[0]
    npad = -n % (RG * tr)
    rays = jnp.stack([ro.x, ro.y, ro.z, rd.x, rd.y, rd.z])  # [6, N]
    if npad:
        rays = jnp.pad(rays, ((0, 0), (0, npad)))
        u6 = jnp.pad(u6, ((0, 0), (0, npad)))
    nb = (n + npad) // (RG * tr)
    rx, gx, bx = _fused_call(
        scene, tr, nb,
        [_block_rows(rays, nb, 6, tr), _block_rows(u6, nb, d6, tr)],
        [_blk_spec(6 * RG, tr), _blk_spec(d6 * RG, tr)],
        interpret, explicit_u=True)
    return V3(rx.reshape(-1)[:n], gx.reshape(-1)[:n], bx.reshape(-1)[:n])


@functools.partial(jax.jit, static_argnames=('nx', 'ny', 'fnx', 'fny',
                                             'interpret'))
def fused_trace_primary(scene, pt, nx, ny, x0=0, y0=0, fnx=None, fny=None,
                        interpret=False):
    '''One whole progressive sample in ONE kernel: the camera rays for
    the (nx, ny) film tile at offset (x0, y0) are generated IN-KERNEL
    (pixel ids -> wanghash rotation -> lens-jittered NDC -> unproject,
    _cam_rays_k), so the only HBM traffic is the radiance out.  This is
    the production forward entry for eligible scenes
    (engine/path.render_sample); fused_trace keeps the explicit-ray
    form for callers that build their own rays.  The offsets are
    TRACED (SMEM): the sharded render passes x0 = axis_index * band.'''
    f = scene.tri_w2b.shape[0]
    assert f <= MAX_FUSED_FACES
    fnx = fnx if fnx is not None else nx
    fny = fny if fny is not None else ny
    dims = pt.shape[0]
    tr = _tr_for(f)
    n = nx * ny
    nb = (n + (-n % (RG * tr))) // (RG * tr)
    cam = scene.cam_v2w.reshape(1, 16)
    off = jnp.stack([jnp.asarray(x0, jnp.int32),
                     jnp.asarray(y0, jnp.int32)]).reshape(1, 2)
    rx, gx, bx = _fused_call(
        scene, tr, nb,
        [cam, off, pt.reshape(1, dims)],
        [_smem_spec((1, 16)), _smem_spec((1, 2)), _smem_spec((1, dims))],
        interpret, primary=(nx, ny, fnx, fny, tr))
    return V3(rx.reshape(-1)[:n], gx.reshape(-1)[:n], bx.reshape(-1)[:n])



# ---------------------------------------------------------------------------
# differentiable entry: megakernel forward, wavefront-recompute backward.
# No autodiff exists THROUGH a Pallas kernel, so differentiable renders
# used to force the whole forward pass onto the wavefront integrator —
# ~20x slower where the megakernel is eligible.  The standard JAX idiom
# for exactly this split is jax.custom_vjp: the primal value comes from
# the megakernel; the backward pass re-traces the SAME path through the
# wavefront integrator (engine/path.path_trace — pure jnp, fully
# differentiable) and pulls the cotangent through that recomputation.
# The two forwards agree to cast rounding (tests/test_fused.py parity),
# and the gradients are BY CONSTRUCTION the wavefront gradients the FD
# tests already validate (tests/test_grad.py).  Uniform rows get zero
# cotangents (discrete sampling decisions; matches the detached-hit
# estimator design, engine/path._cast_and_shade).
# ---------------------------------------------------------------------------

def _make_fused_trace_diff(interpret):
    @jax.custom_vjp
    def f(scene, ro, rd, uniforms):
        return fused_trace_uniforms(scene, ro, rd, uniforms,
                                    interpret=interpret)

    def fwd(scene, ro, rd, uniforms):
        return f(scene, ro, rd, uniforms), (scene, ro, rd, uniforms)

    def bwd(res, g):
        from ptina_tpu.engine.path import path_trace
        scene, ro, rd, uniforms = res
        _, vjp = jax.vjp(
            lambda sc, o, d: path_trace(sc, o, d, uniforms),
            scene, ro, rd)
        dscene, dro, drd = vjp(g)
        return dscene, dro, drd, jnp.zeros_like(uniforms)

    f.defvjp(fwd, bwd)
    return f


fused_trace_diff = _make_fused_trace_diff(False)
# interpreter-mode twin so the vjp pairing is testable off-TPU
fused_trace_diff_interp = _make_fused_trace_diff(True)
