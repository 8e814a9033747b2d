'''
Two-level blocked cast (intersect/blocked.py) vs the dense XLA oracle.

Runs the Pallas kernels in interpret mode on CPU; semantics must match
intersect/brute.py exactly on scenes spanning several face blocks
(reference traversal semantics: ptina/tree/lbvh.py:313-347).
'''

import numpy as np
import jax.numpy as jnp

from ptina_tpu.scene import (make_scene, compute_block_bounds,
                             morton_face_order, BLOCK_FACES)
from ptina_tpu.intersect import brute
from ptina_tpu.intersect.blocked import (
    blocked_tables, blocked_cast_shade, blocked_cast_any,
    _tile_ray_bounds, _candidate_blocks, BLOCKED_TR, CAND_MASK)
from ptina_tpu.intersect.pallas_cast import _prep
from ptina_tpu.utils.vec import V3


def _cluster_scene(nfaces=700, seed=0):
    '''Random triangle clusters far apart (so block culling has real
    work to do), padded by make_scene to whole blocks.'''
    rng = np.random.default_rng(seed)
    ncl = 7
    centers = rng.uniform(-20, 20, (ncl, 3)).astype(np.float32)
    v0 = centers[rng.integers(0, ncl, nfaces)] + rng.normal(
        0, 0.8, (nfaces, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.5, (nfaces, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (nfaces, 3)).astype(np.float32)
    tri = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # [F, 3, 3]
    verts = np.zeros((nfaces * 3, 8), np.float32)
    verts[:, 0:3] = tri.reshape(-1, 3)
    verts[:, 3:6] = (0.0, 0.0, 1.0)
    return make_scene(verts, accel='blocked')


def _rays(n=96, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return (V3.from_array(jnp.asarray(ro)), V3.from_array(jnp.asarray(rd)))


def test_blocked_scene_build():
    scene = _cluster_scene()
    f = scene.tri_w2b.shape[0]
    assert f % BLOCK_FACES == 0
    assert scene.block_bounds.shape == (f // BLOCK_FACES, 8)
    bb = np.asarray(scene.block_bounds)
    live_blocks = int(np.ceil(700 / BLOCK_FACES))
    assert (bb[:live_blocks, 0:3] <= bb[:live_blocks, 3:6]).all()
    # pure-padding blocks carry inverted boxes
    assert (bb[live_blocks:, 0:3] > bb[live_blocks:, 3:6]).all()


def test_morton_order_is_permutation():
    rng = np.random.default_rng(3)
    tri = rng.normal(0, 5, (333, 3, 3)).astype(np.float32)
    perm = morton_face_order(tri)
    assert sorted(perm.tolist()) == list(range(333))


def test_candidates_are_conservative():
    scene = _cluster_scene()
    ro, rd = _rays()
    o4, d4, _, n, ntotal = _prep(ro, rd, jnp.full(96, -1, jnp.int32),
                                 BLOCKED_TR)
    olo, ohi, dlo, dhi = _tile_ray_bounds(o4, d4, BLOCKED_TR)
    ce, cnt = _candidate_blocks(scene.block_bounds, olo, ohi, dlo, dhi)
    # packed word: entry f32 bits (non-negative) over the block id
    cand = np.asarray(ce) & CAND_MASK
    assert (np.asarray(ce) >= 0).all()
    # the oracle hit's winning face must live in a candidate block
    hit = brute.cast_closest(ro, rd, scene.tri_w2b,
                             jnp.full(96, -1, jnp.int32))
    idx = np.asarray(hit.index)
    cnt = np.asarray(cnt)
    for r in np.nonzero(idx >= 0)[0]:
        tile = r // BLOCKED_TR
        blk = idx[r] // BLOCK_FACES
        assert blk in cand[tile, :cnt[tile]], (r, blk)


def test_blocked_closest_matches_brute():
    scene = _cluster_scene()
    ro, rd = _rays()
    avoid = jnp.full(96, -1, jnp.int32)
    t5b, attrsb = blocked_tables(scene.tri_w2b, scene.tri_attrs,
                                 BLOCK_FACES)
    hit, attrs = blocked_cast_shade(ro, rd, t5b, attrsb,
                                    scene.block_bounds, avoid,
                                    interpret=True)
    ref = brute.cast_closest(ro, rd, scene.tri_w2b, avoid)
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(hit.index),
                                  np.asarray(ref.index))
    m = np.asarray(ref.hit)
    # winner t decodes from the packed key: 2^-12-relative grid
    np.testing.assert_allclose(np.asarray(hit.t)[m], np.asarray(ref.t)[m],
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.u)[m], np.asarray(ref.u)[m],
                               rtol=1e-4, atol=1e-5)
    # interpolated mtlid channel decodes to the face's material (-1 here)
    mtl = np.rint(np.asarray(attrs[5]))[m]
    assert (mtl == -1).all()


def test_blocked_avoid_excludes_self():
    scene = _cluster_scene()
    ro, rd = _rays()
    avoid0 = jnp.full(96, -1, jnp.int32)
    t5b, attrsb = blocked_tables(scene.tri_w2b, scene.tri_attrs,
                                 BLOCK_FACES)
    hit, _ = blocked_cast_shade(ro, rd, t5b, attrsb,
                                scene.block_bounds, avoid0, interpret=True)
    hit2, _ = blocked_cast_shade(ro, rd, t5b, attrsb,
                                 scene.block_bounds, hit.index,
                                 interpret=True)
    both = np.asarray(hit.hit) & np.asarray(hit2.hit)
    assert (np.asarray(hit.index)[both] != np.asarray(hit2.index)[both]).all()


def test_blocked_any_matches_brute():
    scene = _cluster_scene()
    ro, rd = _rays(seed=5)
    avoid = jnp.full(96, -1, jnp.int32)
    tmax = jnp.full(96, 25.0)
    t5b, _ = blocked_tables(scene.tri_w2b, scene.tri_attrs,
                            BLOCK_FACES)
    occ = blocked_cast_any(ro, rd, t5b, scene.block_bounds,
                           avoid, tmax, interpret=True)
    ref = brute.cast_any(ro, rd, scene.tri_w2b, avoid, tmax)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_blocked_streamed_matches_resident():
    '''The STREAMED traversal (block tables in HBM, visited blocks
    DMA'd through the VMEM slot ring — the >131k-face capacity path)
    must agree with the VMEM-resident traversal exactly.  Forced on a
    small scene via stream=True; interpret mode executes the DMAs as
    copies.'''
    scene = _cluster_scene()
    ro, rd = _rays(seed=7)
    avoid = jnp.full(96, -1, jnp.int32)
    t5b, attrsb = blocked_tables(scene.tri_w2b, scene.tri_attrs,
                                 BLOCK_FACES)
    hit_r, at_r = blocked_cast_shade(ro, rd, t5b, attrsb,
                                     scene.block_bounds, avoid,
                                     interpret=True, stream=False)
    hit_s, at_s = blocked_cast_shade(ro, rd, t5b, attrsb,
                                     scene.block_bounds, avoid,
                                     interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(hit_r.index),
                                  np.asarray(hit_s.index))
    np.testing.assert_array_equal(np.asarray(hit_r.t), np.asarray(hit_s.t))
    np.testing.assert_array_equal(np.asarray(at_r), np.asarray(at_s))

    tmax = jnp.full(96, 25.0)
    occ_r = blocked_cast_any(ro, rd, t5b, scene.block_bounds, avoid,
                             tmax, interpret=True, stream=False)
    occ_s = blocked_cast_any(ro, rd, t5b, scene.block_bounds, avoid,
                             tmax, interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_s))


def test_tile_spans_respect_smem_budget():
    '''The scalar-prefetch candidate table must never exceed the SMEM
    budget: at 598 blocks a 512-tile span overflowed 1 MB SILENTLY and
    returned wrong candidates (round 5).'''
    from ptina_tpu.intersect.blocked import (_tile_spans, TILES_PER_CALL,
                                             SMEM_CAND_BUDGET)
    for nt, nb in ((512, 199), (2048, 598), (100, 4096), (7, 1)):
        spans = _tile_spans(nt, nb)
        assert spans[0][0] == 0 and spans[-1][1] == nt
        for (s, e), (s2, e2) in zip(spans, spans[1:]):
            assert e == s2  # contiguous, no overlap
        for s, e in spans:
            assert (e - s) * nb * 4 <= SMEM_CAND_BUDGET
            assert e - s <= TILES_PER_CALL


def test_coherence_order_is_octant_sorted_permutation():
    '''_coherence_order must return a permutation whose gathered rays
    are direction-octant sorted (the broad phase's sign-purity
    contract) with image order preserved inside equal keys.'''
    import jax.numpy as jnp
    from ptina_tpu.intersect.blocked import _coherence_order
    scene = _cluster_scene()
    ro, rd = _rays(n=96, seed=11)
    order, inv = _coherence_order(ro, rd, scene.block_bounds)
    o = np.asarray(order)
    assert sorted(o.tolist()) == list(range(96))
    assert (np.asarray(inv)[o] == np.arange(96)).all()
    d = np.stack([np.asarray(rd.x), np.asarray(rd.y),
                  np.asarray(rd.z)])[:, o]
    octant = (d[0] < 0) * 4 + (d[1] < 0) * 2 + (d[2] < 0)
    assert (np.diff(octant) >= 0).all(), 'octants out of order'


def test_cast_keys_matches_cast_closest_core():
    '''cast_keys_chunks (the key-only traversal core) must produce the
    exact packed keys of cast_closest_chunks on the same table.'''
    import jax.numpy as jnp
    from ptina_tpu.intersect.plucker import (
        pack_plucker, pack_extract, ray_features, cast_closest_chunks,
        cast_keys_chunks)
    scene = _cluster_scene(nfaces=200)
    ro, rd = _rays(n=64, seed=3)
    o4 = jnp.stack([ro.x, ro.y, ro.z, jnp.ones_like(ro.x)])
    d4 = jnp.stack([rd.x, rd.y, rd.z, jnp.zeros_like(rd.x)])
    q = ray_features(o4, d4)
    t5 = pack_plucker(scene.tri_w2b)
    ext = pack_extract(scene.tri_w2b, scene.tri_attrs)
    avoid = jnp.full((1, 64), -1, jnp.int32)
    key_full, _, _, _ = cast_closest_chunks(t5, ext, q, avoid,
                                            interp=True)
    key_only = cast_keys_chunks(t5, q, avoid, interp=True)
    np.testing.assert_array_equal(np.asarray(key_full),
                                  np.asarray(key_only))
