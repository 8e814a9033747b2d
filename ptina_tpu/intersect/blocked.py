'''
Two-level blocked ray cast for big scenes (the TPU-native counterpart of
the reference's BVH traversal, ptina/tree/lbvh.py:313-347).

A per-lane stack traversal is hostile to TPU (divergent control flow,
per-lane gathers).  This module keeps the dense-matmul narrow phase of
intersect/pallas_cast.py but adds a broad phase over face BLOCKS:

  * Scene build (scene.make_scene): faces are Morton-ordered and
    partitioned into BLOCK_FACES-sized spatially-coherent blocks with
    per-block AABBs (scene.compute_block_bounds) — the "leaves" of a
    fixed-depth, implicit two-level tree.
  * Ray sort (XLA, per cast): rays are permuted into coherent tiles by
    a stable sort on (direction octant, origin Morton cell)
    (_coherence_order), fixing each tile's direction signs and packing
    same-cell origins together.
  * Broad phase (XLA, per cast): each TR-ray tile gets a conservative
    interval slab test against every block AABB — O(ntiles * nblocks)
    scalar work, no per-ray cost — and a compacted CANDIDATE block list
    sorted by a conservative entry-t lower bound.
  * Narrow phase (Pallas): ONE grid step per ray tile; candidates
    advance in rounds of EXIT_ROUND visits under a while_loop that
    stops once no ray's running minimum can improve on the next
    round's entry bound (_traverse) — the TPU counterpart of BVH
    traversal's node-beyond-closest-hit pruning.  Each visited block
    runs the shared Plücker cast core (intersect/plucker.py: chunked
    matmul + division-free packed-key tail) on the VMEM-resident block
    tables by dynamic index.  (Two rejected designs, both measured
    slower: a (tile, slot) grid pays ~1.3 us per SKIPPED Mosaic grid
    step — 137 ms/cast of pure overhead; a PER-VISIT early-out sync
    costs as much as the visits it saves, hence the 8-visit rounds.)

Correctness does not depend on the culling quality: the candidate test
is conservative (superset), and a degenerate block simply wastes one
step.  Hit semantics match intersect/brute.py (reference
Face.intersect + nearest-hit loop, ptina/geometries.py:117-148,
lbvh.py:313-347) with the core's ordering-grade t (2^-12) and the
near-parallel-ray edge case documented at plucker.chunk_valid.
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptina_tpu.utils.mathutils import INF
from ptina_tpu.utils.vec import V3
from ptina_tpu.intersect.brute import Hit
from ptina_tpu.intersect.pallas_cast import _prep
from ptina_tpu.intersect.plucker import (
    pack_plucker, pack_extract, ray_features, cast_closest_chunks,
    cast_keys_chunks, cast_mint_chunks, finish_extraction, key_decode_t,
    FACE_CHUNK, KEY_FID_MASK, KEY_MISS, N_COEF)

__all__ = ['blocked_cast_closest', 'blocked_cast_shade',
           'blocked_cast_any', 'blocked_tables', 'BLOCKED_TR']

BLOCKED_TR = 512   # rays per tile (lane axis).  Swept on the 102k-face
# scene in round 5 WITH the entry-bound early exit + origin-cell sort:
# TR=512 octant-major 0.83 sps, TR=256 0.66, TR=128 0.64, and
# origin-major keys lose at every TR (0.55-0.66) — wide tiles win
# because the per-visit loop overhead outweighs the tighter frusta.

CAND_BITS = 12     # low bits of a packed candidate word = block id
CAND_MASK = (1 << CAND_BITS) - 1  # caps scenes at 4096 blocks = 2^21
# faces at BLOCK_FACES=512 (the reference LBVH's capacity, things.py:13)

# VMEM-residency threshold for the whole block-table working set
# (~480 B/face packed: 320 t5 + 160 attrs).  131072 faces ~ 63 MB,
# inside the 100 MB scoped budget.  Scenes beyond it switch to the
# STREAMED traversal (block tables stay in HBM; visited blocks DMA
# through an EXIT_ROUND-slot VMEM ring — see _traverse), which lifts
# capacity to CAND_BITS' 2^21 faces, the reference LBVH's cap
# (ptina/things.py:13).
MAX_BLOCKED_VMEM_FACES = 131072


T5_ROWS = 16  # coefficient rows (14) padded to a sublane multiple


def blocked_tables(tri_w2b, tri_attrs, block_faces):
    '''Re-pack the flat triangle tables into per-block TRANSPOSED form:
    t5 [nb, 16, 5B] (intersect/plucker.pack_plucker per block, rows and
    lanes swapped, coefficient rows zero-padded 14 -> 16) and attrs
    [nb, R8, B] (extraction rows zero-padded to a multiple of 8).  The
    transposition/padding makes every manually-DMAed slice tile-aligned
    — Mosaic requires minor dims in 128s and sublane dims in 8s for
    HBM->VMEM slice copies; the cast core consumes this layout via its
    transposed=True path (plucker.chunk_uvwta_T).
    tri_w2b must be padded to a block_faces multiple (make_scene pads
    big scenes this way).'''
    f = tri_w2b.shape[0]
    assert f % block_faces == 0, 'pad faces to a BLOCK_FACES multiple'
    assert block_faces <= KEY_FID_MASK + 1  # block-local fid fits the key
    # the [nb, 5*block_faces, 14] reshape below is only a per-block
    # re-grouping when pack_plucker's chunk-major layout tiles evenly
    assert block_faces % FACE_CHUNK == 0
    assert (5 * block_faces) % 128 == 0
    nb = f // block_faces
    t5 = pack_plucker(tri_w2b)  # chunk-major; block_faces % chunk == 0
    t5b = t5.reshape(nb, 5 * block_faces, 14).transpose(0, 2, 1)
    t5b = jnp.pad(t5b, ((0, 0), (0, T5_ROWS - 14), (0, 0)))
    ext = pack_extract(tri_w2b, tri_attrs)  # [3C + 15, F]
    c3e = ext.shape[0]
    extb = ext.reshape(c3e, nb, block_faces).transpose(1, 0, 2)
    extb = jnp.pad(extb, ((0, 0), (0, -c3e % 8), (0, 0)))
    return t5b, extb


def _coherence_order(ro, rd, block_bounds):
    '''Permutation packing SECONDARY rays into coherent tiles: a stable
    sort on (direction octant, origin Morton cell).  After one bounce a
    wavefront's rays point everywhere, so an unsorted tile's direction
    interval straddles 0 on every axis and the broad phase can cull
    nothing (round-3 verdict).  Octant bits (high) fix each tile's
    direction signs; the 9-bit origin-cell Morton code (8x8x8 grid over
    the scene box) packs rays whose ORIGINS share a small cell into the
    same tile — without it, a deep-bounce tile's 512 rays originate all
    over the scene, its origin interval spans the world, and the broad
    phase saturates at ~180 candidate blocks per tile where the per-RAY
    mean is 6.2 (round-4 builder measurement, the named fix).

    Implemented as ONE jnp.sort of (key << 18 | ray index) packed i32
    (index bits double as the stability tiebreak, preserving image
    order inside each bucket) + one scatter for the inverse — a 262k
    i32 sort measures ~1-3 ms on this chip, in the same band as the
    old 8-bucket cumsum ranking it replaces.  Returns (order, inv):
    order gathers inputs into sorted form, inv gathers results back
    (inv[i] = sorted slot of ray i).'''
    n = rd.x.shape[0]
    octant = ((rd.x < 0).astype(jnp.int32) * 4
              + (rd.y < 0).astype(jnp.int32) * 2
              + (rd.z < 0).astype(jnp.int32))
    # scene box from the (finite) block AABBs; padding blocks are
    # inverted so lo rows are +big — mask them by lo <= hi
    valid = jnp.all(block_bounds[:, 0:3] <= block_bounds[:, 3:6], axis=1)
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid[:, None], block_bounds[:, 0:3], big),
                 axis=0)
    hi = jnp.max(jnp.where(valid[:, None], block_bounds[:, 3:6], -big),
                 axis=0)
    inv_ext = 1.0 / jnp.maximum(hi - lo, 1e-12)

    def cell(x, l, ie):
        return jnp.clip((x - l) * ie * 8.0, 0.0, 7.0).astype(jnp.int32)
    cx = cell(ro.x, lo[0], inv_ext[0])
    cy = cell(ro.y, lo[1], inv_ext[1])
    cz = cell(ro.z, lo[2], inv_ext[2])
    # 3-bit-per-axis Morton interleave (x2 y2 z2 x1 y1 z1 x0 y0 z0)
    def spread(v):
        return ((v & 4) << 4) | ((v & 2) << 2) | (v & 1)
    morton = (spread(cx) << 2) | (spread(cy) << 1) | spread(cz)
    # pack (octant | morton | ray index) into 31 bits; huge wavefronts
    # shed low Morton bits to keep the index tiebreak exact
    ibits = max(1, (n - 1).bit_length())
    mbits = min(9, max(0, 28 - 3 - ibits))
    assert mbits > 0, 'wavefront too large for the packed sort key'
    key = (octant << (mbits + ibits)) \
        | ((morton >> (9 - mbits)) << ibits) \
        | jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    order = jnp.sort(key) & ((1 << ibits) - 1)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, inv


def _i32v(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _gather_rays(order, ro, rd, avoid):
    '''Apply the coherence permutation to the cast inputs — ONE batched
    row-matrix gather (seven separate [N] gathers cost ~5 ms EACH on
    XLA:TPU; one [7, N] take amortizes the random access).'''
    m = jnp.stack([ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
                   avoid.astype(jnp.float32)])[:, order]
    return (V3(m[0], m[1], m[2]), V3(m[3], m[4], m[5]),
            m[6].astype(jnp.int32))


def _unsort_shade(inv, hit, attrs):
    '''Gather sorted-order shade results back to caller order
    (inv[i] = sorted slot of ray i) — one batched gather.'''
    m = jnp.concatenate([
        jnp.stack([hit.t, hit.index.astype(jnp.float32), hit.u, hit.v]),
        attrs])[:, inv]
    index = m[1].astype(jnp.int32)
    hit = Hit(hit=index >= 0, t=m[0], index=index, u=m[2], v=m[3])
    return hit, m[4:]


TILES_PER_CALL = 512  # upper bound on tiles per pallas_call; the real
# cap adapts to the block count (see _tile_spans)
SMEM_CAND_BUDGET = 800 * 1024  # bytes of SMEM the [tiles, nb]
# packed-candidate prefetch table may use (SMEM is 1 MB; leave room
# for the cnt row and control state).  Exceeding SMEM does NOT fail
# loudly: a 306k-face scene (598 blocks) at 512 tiles/call silently
# returned wrong candidates (round 5) — hence the hard adaptation.


def _tile_spans(nt, nb):
    per = max(1, min(TILES_PER_CALL, SMEM_CAND_BUDGET // (4 * max(nb, 1))))
    return [(s, min(s + per, nt)) for s in range(0, nt, per)]


def _tile_ray_bounds(o4, d4, tr):
    '''Per-tile componentwise intervals of ray origins and directions.
    o4, d4: [4, Npad] homogeneous rays (Npad a tr multiple).
    Returns (olo, ohi, dlo, dhi) [ntiles, 3].'''
    nt = o4.shape[1] // tr
    o = o4[:3].reshape(3, nt, tr)
    d = d4[:3].reshape(3, nt, tr)
    return (o.min(-1).T, o.max(-1).T, d.min(-1).T, d.max(-1).T)


def _candidate_blocks(block_bounds, olo, ohi, dlo, dhi):
    '''Conservative tile-vs-block visibility: a block is a candidate for
    a ray tile unless, on some axis, the box is strictly outside the
    tile's origin interval with no ray direction pointing toward it.
    (Interval arithmetic over the slab test: ignores cross-axis t
    coupling, so it only over-approximates.)

    Each candidate also gets a conservative LOWER BOUND on any tile
    ray's entry t into the block (0 when the tile's direction interval
    straddles 0 on every separating axis), and candidates are ordered
    by it — nearest block first.  The cast kernels compare the running
    per-ray minimum against the next candidate's bound and skip blocks
    no ray can improve on (the TPU counterpart of BVH traversal's
    node-beyond-closest-hit pruning, reference ptina/tree/lbvh.py:330).

    Returns (cand [nt, nb] i32 candidate block ids — real candidates
    first, then the last real one repeated so the pipeline never
    refetches — entry [nt, nb] f32 bounds in slot order, and cnt [nt]
    i32.'''
    # INTERVAL SLAB TEST with cross-axis t coupling: per axis compute a
    # conservative [near_a, far_a] bound on every tile ray's slab
    # interval, intersect across axes, and require a non-empty forward
    # window.  The previous axis-separable test ("overlaps the origin
    # interval OR some ray points toward it") admitted blocks whose
    # per-axis windows can never overlap — e.g. a box far right AND far
    # up when every ray entering it on x has long exited it on y.
    # Octant-sorted tiles have sign-pure directions, so the interval
    # division is well defined; the rare mixed tile (octant boundary,
    # zero-padded rays) degrades gracefully to the loose bounds.
    #
    # The axes iterate in PYTHON over [nt, nb] arrays: a vectorized
    # [nt, nb, 3] form pads the minor 3-axis to 128 TPU lanes and was
    # measured ~100 ms per cast of pure padding traffic (see
    # utils/vec.py for the general rule).
    inf = jnp.float32(jnp.inf)
    near_lo = None
    far_hi = None
    valid = None
    for a in range(3):
        lo = block_bounds[None, :, a]        # [1, nb]
        hi = block_bounds[None, :, 3 + a]
        ol = olo[:, a:a + 1]                 # [nt, 1]
        oh = ohi[:, a:a + 1]
        dl = dlo[:, a:a + 1]
        dh = dhi[:, a:a + 1]
        pos = dl > 0.0
        neg = dh < 0.0
        near_p = jnp.maximum(lo - oh, 0.0) / jnp.where(pos, dh, 1.0)
        far_p = (hi - ol) / jnp.where(pos, dl, 1.0)
        near_n = jnp.maximum(ol - hi, 0.0) / jnp.where(neg, -dl, 1.0)
        far_n = (oh - lo) / jnp.where(neg, -dh, 1.0)
        ov = (ol <= hi) & (oh >= lo)
        m_near = jnp.where(
            ov, 0.0,
            jnp.where(lo > oh,
                      jnp.where(dh > 0.0,
                                jnp.maximum(lo - oh, 0.0)
                                / jnp.where(dh > 0.0, dh, 1.0), inf),
                      jnp.where(dl < 0.0,
                                jnp.maximum(ol - hi, 0.0)
                                / jnp.where(dl < 0.0, -dl, 1.0), inf)))
        m_far = jnp.where(jnp.isfinite(m_near), inf, -inf)
        near_a = jnp.where(pos, near_p, jnp.where(neg, near_n, m_near))
        far_a = jnp.where(pos, far_p, jnp.where(neg, far_n, m_far))
        va = lo <= hi                        # padding blocks inverted
        near_lo = near_a if near_lo is None else jnp.maximum(near_lo,
                                                             near_a)
        far_hi = far_a if far_hi is None else jnp.minimum(far_hi, far_a)
        valid = va if valid is None else (valid & va)
    # 1-ulp-safe margins so f32 division rounding cannot drop a hit
    # whose t sits exactly on a bound
    near_lo = near_lo * (1.0 - 1e-6)
    far_hi = far_hi * (1.0 + 1e-6)
    feas = valid & (far_hi > 0.0) & (near_lo <= far_hi) \
        & jnp.isfinite(near_lo)
    # entry = the intersected lower bound — tighter than (or equal to)
    # the old per-axis gap/speed maximum, which sharpens the kernels'
    # entry-ordered early exit too
    entry = jnp.where(feas, jnp.maximum(near_lo, 0.0), 0.0)

    cnt = jnp.sum(feas, axis=-1).astype(jnp.int32)
    # sort by (infeasible, entry): feasible blocks first, nearest first
    key = jnp.where(feas, entry, jnp.inf)
    order = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)
    ent_sorted = jnp.take_along_axis(key, order, axis=-1)
    ent_sorted = jnp.where(jnp.isfinite(ent_sorted), ent_sorted, 0.0)
    last = jnp.take_along_axis(order, jnp.maximum(cnt - 1, 0)[:, None], 1)
    slot = jnp.arange(order.shape[1], dtype=jnp.int32)[None, :]
    cand = jnp.where(slot < cnt[:, None], order, last)

    # pack (entry, block id) into ONE i32 per slot: the [nt, nb] scalar-
    # prefetch tables live in 1 MB of SMEM, and a second f32 entry table
    # blew it on 200-block scenes.  Entries are >= 0, so their f32 bit
    # pattern orders like the float; flooring the low CAND_BITS away is
    # CONSERVATIVE (a lower bound stays a lower bound — worst case one
    # extra visit).  Block ids ride in those low bits.
    assert block_bounds.shape[0] <= CAND_MASK + 1, 'raise CAND_BITS'
    ent_bits = jax.lax.bitcast_convert_type(ent_sorted, jnp.int32)
    candent = (ent_bits & ~jnp.int32(CAND_MASK)) | cand
    return candent, cnt


# ---------------------------------------------------------------------------
# Traversal kernels: ONE grid step per ray tile; candidates advance in an
# in-kernel while_loop with manual double-buffered DMA from HBM.
#
# The previous design made candidates a second GRID dimension (nt, nb)
# and skipped non-candidates with pl.when — but a skipped Mosaic grid
# step still costs ~1.3 us of loop/bookkeeping overhead, and at 512
# tiles x 199 blocks that was ~137 ms per cast of pure overhead, 10x
# the narrow-phase work after culling (measured round 4).  The dynamic
# loop pays only for blocks actually visited, and exits OUTRIGHT at the
# first candidate whose entry bound no ray can improve on (candidates
# are entry-sorted) — true BVH-style pruning, not just skipping.
# ---------------------------------------------------------------------------


EXIT_ROUND = 8  # visits per early-exit check: a vector->scalar sync
# every visit cost as much as the visits it saved (measured round 4 —
# zero net speedup), but candidates are ENTRY-SORTED, most rays resolve
# within the first few blocks, and one sync per 8 visits amortizes the
# pipeline drain 8x.  Measured on the 102k-face scene: mean visits per
# tile drop from ~100 (saturated broad phase) to the per-ray-resolution
# floor, the single biggest blocked-cast win of round 5.


def _traverse(ce_ref, i, cnt, gate, visit, prefetch=None):
    '''Candidate traversal: rounds of EXIT_ROUND visits under a
    while_loop whose condition asks `gate(entry_bits)` — "can any ray
    still improve on a block whose conservative entry bound is this
    round's FIRST candidate's?".  Entries ride in the high bits of the
    packed candidate words, non-decreasing in slot order and FLOORED at
    pack time, so (all rays' t <= stored entry) really does imply no
    later block can strictly improve any ray — skipped visits change
    nothing (cross-block exact-t ties keep the earlier block either
    way).

    VMEM-resident tables (<= MAX_BLOCKED_VMEM_FACES): visit(j, slot)
    reads its block by dynamic index, no DMA in the loop.  STREAMED
    tables (prefetch given): each round first STARTS the DMAs for all
    its visits' blocks into an EXIT_ROUND-slot VMEM ring, then each
    visit waits on its own slot — every started copy is waited exactly
    once inside the same round (no DMA state crosses while_loop
    iterations, which is what deadlocked an earlier double-buffered
    design), and the round's later copies overlap its earlier visits'
    compute.'''
    nbslots = ce_ref.shape[1]

    def cond(r):
        base = r * EXIT_ROUND
        ent = ce_ref[i, jnp.minimum(base, nbslots - 1)] \
            & ~jnp.int32(CAND_MASK)
        return (base < cnt) & gate(ent)

    def body(r):
        base = r * EXIT_ROUND
        if prefetch is not None:
            for j in range(EXIT_ROUND):
                @pl.when(base + j < cnt)
                def _(j=j):
                    prefetch(base + j, j)
        for j in range(EXIT_ROUND):
            @pl.when(base + j < cnt)
            def _(j=j):
                visit(base + j, j)
        return r + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


def _blocked_shade_kernel(ce_ref, cnt_ref, q_ref, avoid_ref,
                          t5_ref,
                          t_ref, idx_ref, blk_scr, *scratch,
                          interp=False, stream=False):
    '''Closest hit, KEY-ONLY: the entry-ordered traversal tracks just
    (packed key, winning block id) per ray — ~1/4 the per-visit cost of
    extracting attributes alongside, which measured as ~3/4 of the
    102k-face sample.  Winner ATTRIBUTES are not touched here at all:
    blocked_cast_shade gathers the single winning face's extraction
    column per ray on the XLA side afterwards (one [3C+15, N] take) and
    finishes u/v/attrs there — in-kernel alternatives (per-visit one-hot
    matmuls; a distinct-winner-block loop) both measured slower because
    a tile's 512 rays win across ~30-50 distinct blocks.

    Cross-block ties on the 2^-12 key grid resolve toward the smaller
    (t-bits | block-local fid) word rather than the earliest visited
    block — a measure-zero-adjacent rule in the same family as the
    reference BVH's traversal-order ties.'''
    i = pl.program_id(0)
    b = t5_ref.shape[2] // 5
    prec = jax.lax.Precision.HIGHEST if stream else None

    if stream:
        t5_s, sem_t = scratch

        def t5copy(j, slot):
            blk = ce_ref[i, j] & CAND_MASK
            return pltpu.make_async_copy(t5_ref.at[blk], t5_s.at[slot],
                                         sem_t.at[slot])

        prefetch_t5 = lambda j, slot: t5copy(j, slot).start()

        def t5_table(j, slot):
            t5copy(j, slot).wait()
            return t5_s[slot]
    else:
        prefetch_t5 = None

        def t5_table(j, slot):
            return t5_ref[ce_ref[i, j] & CAND_MASK]

    # the key accumulator rides in idx_ref (rewritten with the final
    # global face id below); blk_scr holds each ray's winning block
    idx_ref[:] = jnp.full(idx_ref.shape, KEY_MISS, jnp.int32)
    blk_scr[:] = jnp.full(blk_scr.shape, -1, jnp.int32)

    def visit(j, slot):
        blk = ce_ref[i, j] & CAND_MASK
        # global `avoid` localized to this block ONCE per ray; the
        # shared core then works entirely in block-local face ids
        key = cast_keys_chunks(t5_table(j, slot), q_ref[:],
                               avoid_ref[:] - blk * b, interp,
                               transposed=True, precision=prec)
        better = key < idx_ref[:]
        idx_ref[:] = jnp.where(better, key, idx_ref[:])
        blk_scr[:] = jnp.where(better, blk, blk_scr[:])

    def gate(ent):
        # any ray whose best t-bits still exceed the round's entry
        # bound?  (keys are positive, so masking the fid bits leaves an
        # i32 pattern that orders like the decoded float; KEY_MISS
        # masks to a huge pattern and keeps its ray in play)
        tb = idx_ref[:] & ~jnp.int32(KEY_FID_MASK)
        return jnp.sum((tb > ent).astype(jnp.int32)) > 0

    _traverse(ce_ref, i, cnt_ref[i], gate, visit, prefetch_t5)

    wkey = idx_ref[:]
    wfid = wkey & KEY_FID_MASK
    hitm = wkey != KEY_MISS
    t_ref[:] = jnp.where(hitm, key_decode_t(wkey), INF)
    idx_ref[:] = jnp.where(hitm, blk_scr[:] * b + wfid, -1)


def _blocked_mint_kernel(ce_ref, cnt_ref, q_ref, avoid_ref,
                         tmax_ref, t5_ref, t_ref,
                         *scratch, interp=False, stream=False):
    i = pl.program_id(0)
    t_ref[:] = jnp.full(t_ref.shape, INF)
    b = t5_ref.shape[2] // 5

    if stream:
        t5_s, sem_t = scratch

        def copy(j, slot):
            blk = ce_ref[i, j] & CAND_MASK
            return pltpu.make_async_copy(t5_ref.at[blk], t5_s.at[slot],
                                         sem_t.at[slot])

        def prefetch(j, slot):
            copy(j, slot).start()

        def table(j, slot):
            copy(j, slot).wait()
            return t5_s[slot]
    else:
        prefetch = None

        def table(j, slot):
            return t5_ref[ce_ref[i, j] & CAND_MASK]

    def visit(j, slot):
        blk = ce_ref[i, j] & CAND_MASK
        tm = cast_mint_chunks(table(j, slot), q_ref[:],
                              avoid_ref[:] - blk * b, interp,
                              transposed=True,
                              precision=jax.lax.Precision.HIGHEST
                              if stream else None)
        t_ref[:] = jnp.minimum(t_ref[:], tm)

    def gate(ent):
        # a visit still matters only for rays not yet occluded
        # (t >= tmax) by blocks entered before their light (entry <
        # tmax); tmax >= 0 so its bit pattern orders like the float
        live = (t_ref[:] >= tmax_ref[:]) & (_i32v(tmax_ref[:]) > ent)
        return jnp.sum(live.astype(jnp.int32)) > 0

    _traverse(ce_ref, i, cnt_ref[i], gate, visit, prefetch)


@functools.partial(jax.jit, static_argnames=('interpret', 'sort', 'n_attr',
                                             'stream'))
def blocked_cast_shade(ro, rd, t5b, attrsb, block_bounds, avoid,
                       interpret=False, sort=True, n_attr=6, stream=None):
    '''Closest hit + interpolated attributes through the two-level cast.
    t5b/attrsb from blocked_tables.  Returns (Hit, attrs [C, N]).
    sort: pack rays into coherent tiles first (_coherence_order) —
    results are scattered back to the caller's order, so the only
    visible effect is which block shades a cross-block EXACT t tie
    (measure-zero; the reference's BVH visit order is traversal-
    dependent there too).
    n_attr: corner attribute channels in attrsb (6 = nrm3+uv2+mtl).
    stream: None = auto (scenes past MAX_BLOCKED_VMEM_FACES keep the
    block tables in HBM and DMA visited blocks through a VMEM slot
    ring — see _traverse); True/False forces the mode.  This lifts
    capacity to the reference LBVH's 2^21 faces (ptina/things.py:13),
    bounded by CAND_BITS rather than VMEM.'''
    nb, rows_t5, b5 = t5b.shape
    rows_at = attrsb.shape[1]
    c3 = 3 * n_attr
    b = b5 // 5
    if stream is None:
        stream = nb * b > MAX_BLOCKED_VMEM_FACES
    tr = BLOCKED_TR
    if sort:
        order, inv = _coherence_order(ro, rd, block_bounds)
        ro, rd, avoid = _gather_rays(order, ro, rd, avoid)
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, tr)
    q = jnp.pad(ray_features(o4t, d4t), ((0, T5_ROWS - 14), (0, 0)))
    nt = ntotal // tr
    olo, ohi, dlo, dhi = _tile_ray_bounds(o4t, d4t, tr)
    ce, cnt = _candidate_blocks(block_bounds, olo, ohi, dlo, dhi)

    lane = lambda rows: pl.BlockSpec((rows, tr), lambda i, *_: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0, 0, 0),
                                      memory_space=pltpu.VMEM)

    if stream:
        table_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        ring = [pltpu.VMEM((EXIT_ROUND, T5_ROWS, b5), jnp.float32),
                pltpu.SemaphoreType.DMA((EXIT_ROUND,))]
    else:
        table_specs = [full(t5b.shape)]
        ring = []
    # winning-block accumulator (see kernel)
    scratch = [pltpu.VMEM((1, tr), jnp.int32)] + ring
    outs = []
    for s, e in _tile_spans(nt, ce.shape[1]):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(e - s,),
            in_specs=[lane(T5_ROWS), lane(1)] + table_specs,
            out_specs=[lane(1), lane(1)],
            scratch_shapes=scratch,
        )
        span = (e - s) * tr
        outs.append(pl.pallas_call(
            functools.partial(_blocked_shade_kernel, interp=interpret,
                              stream=stream),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, span), jnp.float32),
                jax.ShapeDtypeStruct((1, span), jnp.int32),
            ],
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('arbitrary',),
                    vmem_limit_bytes=100 * 1024 * 1024))),
        )(ce[s:e], cnt[s:e], q[:, s * tr:e * tr],
          avoid2[:, s * tr:e * tr], t5b))
    t, idx = (jnp.concatenate(xs, axis=1) for xs in zip(*outs))
    index_all = idx[0]  # [ntotal], sorted order; -1 = miss

    # winner attribute extraction on the XLA side: ONE batched take of
    # each ray's winning face column from the flat [3C+15, F] extraction
    # table, then the same u/v/attr reconstruction the dense kernels
    # use.  MUST be jnp.take — fancy indexing (`ext[:, idx]` or row-
    # major `ext.T[idx]`) lowers to a gather form measured 100-150x
    # slower on this chip (938/635 ms vs 6.3 ms for the same 33 x 262k
    # fetch); in-kernel extraction alternatives (per-visit one-hot
    # matmuls, a distinct-winner-block loop) also measured far slower
    # because a tile's rays win across ~30-50 distinct blocks.
    ext_flat = attrsb.transpose(1, 0, 2).reshape(rows_at, nb * b)
    cols = jnp.take(ext_flat[:c3 + N_COEF], jnp.maximum(index_all, 0),
                    axis=1)
    u, v, att = finish_extraction(cols, q, interp=True, n_attr=n_attr)

    index = index_all[:n]
    hitm = index >= 0
    hit = Hit(hit=hitm, t=t[0, :n], index=index,
              u=jnp.where(hitm, u[0, :n], 0.0),
              v=jnp.where(hitm, v[0, :n], 0.0))
    attrs = jnp.where(hitm[None, :], att[:, :n], 0.0)
    if sort:
        hit, attrs = _unsort_shade(inv, hit, attrs)
    return hit, attrs


@functools.partial(jax.jit, static_argnames=('interpret',))
def blocked_cast_closest(ro, rd, t5b, attrsb, block_bounds, avoid,
                         interpret=False):
    '''Hit-only view of blocked_cast_shade (same kernel pass).'''
    hit, _ = blocked_cast_shade(ro, rd, t5b, attrsb, block_bounds,
                                avoid, interpret=interpret)
    return hit


@functools.partial(jax.jit, static_argnames=('interpret', 'sort', 'stream'))
def blocked_cast_any(ro, rd, t5b, block_bounds, avoid, tmax,
                     interpret=False, sort=True, stream=None):
    '''Occlusion cast: True where any face (except avoid) is hit at
    0 < t < tmax.  sort/stream: see blocked_cast_shade.'''
    nb, rows_t5, b5 = t5b.shape
    if stream is None:
        stream = nb * (b5 // 5) > MAX_BLOCKED_VMEM_FACES
    tr = BLOCKED_TR
    if sort:
        order, inv = _coherence_order(ro, rd, block_bounds)
        ro, rd, avoid = _gather_rays(order, ro, rd, avoid)
        tmax = tmax[order]
    o4t, d4t, avoid2, n, ntotal = _prep(ro, rd, avoid, tr)
    q = jnp.pad(ray_features(o4t, d4t), ((0, T5_ROWS - 14), (0, 0)))
    nt = ntotal // tr
    npad = ntotal - n
    tmax2 = (jnp.pad(tmax, (0, npad)) if npad else tmax)[None, :]
    olo, ohi, dlo, dhi = _tile_ray_bounds(o4t, d4t, tr)
    ce, cnt = _candidate_blocks(block_bounds, olo, ohi, dlo, dhi)

    lane = lambda rows: pl.BlockSpec((rows, tr), lambda i, *_: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0, 0, 0),
                                      memory_space=pltpu.VMEM)
    if stream:
        table_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch = [pltpu.VMEM((EXIT_ROUND, T5_ROWS, b5), jnp.float32),
                   pltpu.SemaphoreType.DMA((EXIT_ROUND,))]
    else:
        table_specs = [full(t5b.shape)]
        scratch = []
    outs = []
    for s, e in _tile_spans(nt, ce.shape[1]):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(e - s,),
            in_specs=[lane(T5_ROWS), lane(1), lane(1)] + table_specs,
            out_specs=[lane(1)],
            scratch_shapes=scratch,
        )
        outs.append(pl.pallas_call(
            functools.partial(_blocked_mint_kernel, interp=interpret,
                              stream=stream),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((1, (e - s) * tr), jnp.float32)],
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('arbitrary',),
                    vmem_limit_bytes=100 * 1024 * 1024))),
        )(ce[s:e], cnt[s:e], q[:, s * tr:e * tr],
          avoid2[:, s * tr:e * tr], tmax2[:, s * tr:e * tr], t5b)[0])
    t = jnp.concatenate(outs, axis=1)
    # miss = INF must not occlude even for tmax beyond the far clip
    occ = t[0, :n] < jnp.minimum(tmax2[0, :n], INF)
    if sort:
        occ = occ[inv]
    return occ
