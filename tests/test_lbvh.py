import numpy as np
import jax.numpy as jnp

from ptina_tpu.scene import precompute_tri_functionals
from ptina_tpu.intersect.lbvh import lbvh_build, lbvh_traverse, morton3d
from ptina_tpu.intersect.brute import cast_closest
from ptina_tpu.utils.vec import V3


def _random_tris(rng, nf):
    base = rng.rand(nf, 1, 3).astype(np.float32) * 8 - 4
    return base + rng.rand(nf, 3, 3).astype(np.float32) * 0.7


def test_morton_orders_spatially():
    p = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5]])
    m = np.asarray(morton3d(p))
    assert m[0] == 0
    assert m[1] > m[2] > m[0]


def test_build_invariants():
    rng = np.random.RandomState(0)
    tris = jnp.asarray(_random_tris(rng, 37))
    bvh = lbvh_build(tris)
    n = 37
    # every face appears exactly once as a leaf
    assert sorted(np.asarray(bvh.leaf).tolist()) == list(range(n))
    # every node (except root n+0) is referenced exactly once as a child
    refs = np.asarray(bvh.child).ravel()
    assert len(refs) == 2 * (n - 1)
    assert sorted(refs.tolist()) == sorted(
        list(range(n)) + [n + k for k in range(1, n - 1)])
    # parent AABBs contain child AABBs
    child = np.asarray(bvh.child)
    bmin, bmax = np.asarray(bvh.bmin), np.asarray(bvh.bmax)
    lmin, lmax = np.asarray(bvh.leaf_bmin), np.asarray(bvh.leaf_bmax)
    for i in range(n - 1):
        for c in child[i]:
            cmin = lmin[c] if c < n else bmin[c - n]
            cmax = lmax[c] if c < n else bmax[c - n]
            assert (bmin[i] <= cmin + 1e-6).all()
            assert (bmax[i] >= cmax - 1e-6).all()


def test_traverse_matches_brute():
    rng = np.random.RandomState(1)
    tris = jnp.asarray(_random_tris(rng, 64))
    m = precompute_tri_functionals(tris)
    bvh = lbvh_build(tris)
    nr = 128
    ro = jnp.asarray(rng.randn(nr, 3) * 5, jnp.float32)
    rd = jnp.asarray(rng.randn(nr, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    avoid = jnp.full((nr,), -1, jnp.int32)

    hb = cast_closest(V3.from_array(ro), V3.from_array(rd), m, avoid)
    ht = lbvh_traverse(bvh, m, ro, rd, avoid)
    same = np.asarray(hb.index) == np.asarray(ht.index)
    assert same.mean() > 0.97  # ties on shared edges may differ
    hits = np.asarray(hb.hit) & same
    assert np.allclose(np.asarray(hb.t)[hits], np.asarray(ht.t)[hits],
                       rtol=1e-4, atol=1e-4)


def test_traverse_avoid():
    rng = np.random.RandomState(2)
    tris = jnp.asarray(_random_tris(rng, 16))
    m = precompute_tri_functionals(tris)
    bvh = lbvh_build(tris)
    ro = jnp.asarray([[0.0, 0.0, -10.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])
    h1 = lbvh_traverse(bvh, m, ro, rd, jnp.asarray([-1], jnp.int32))
    if bool(h1.hit[0]):
        h2 = lbvh_traverse(bvh, m, ro, rd, h1.index)
        assert (not bool(h2.hit[0])) or int(h2.index[0]) != int(h1.index[0])
