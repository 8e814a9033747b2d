import os
import tempfile

import numpy as np
import jax.numpy as jnp

from ptina_tpu.scene import (
    make_scene, make_materials, precompute_tri_functionals, DEFAULT_MATERIAL,
)
from ptina_tpu.io.readobj import readobj, writeobj, obj_mtlids, obj_to_vertices
from ptina_tpu.texture import sample_texture
from ptina_tpu.scene import make_textures


def test_tri_functionals_barycentric():
    tris = jnp.asarray(np.random.RandomState(0).randn(8, 3, 3), jnp.float32)
    m = precompute_tri_functionals(tris)
    # evaluate at each vertex: (plane=0, u, v) = v0->(0,0,0) v1->(0,1,0) v2->(0,0,1)
    for k, expect in [(0, (0.0, 0.0)), (1, (1.0, 0.0)), (2, (0.0, 1.0))]:
        p = jnp.concatenate([tris[:, k], jnp.ones((8, 1))], axis=1)
        vals = jnp.einsum('fij,fj->fi', m, p)
        v = np.asarray(vals)
        assert np.allclose(v[:, 0], 0.0, atol=1e-3)
        assert np.allclose(v[:, 1], expect[0], atol=1e-4)
        assert np.allclose(v[:, 2], expect[1], atol=1e-4)


def test_default_material_row():
    mats = make_materials([])
    fac = np.asarray(mats.fac)
    assert np.allclose(fac[-1, 0, :3], DEFAULT_MATERIAL['basecolor'])
    assert np.allclose(fac[-1, 11, 0], DEFAULT_MATERIAL['ior'])


def test_obj_roundtrip():
    obj = dict(
        v=np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32),
        vt=np.zeros((1, 2), np.float32),
        vn=np.asarray([[0, 0, 1]], np.float32),
        f=np.asarray([[[0, 0, 0], [1, 0, 0], [2, 0, 0]],
                      [[1, 0, 0], [3, 0, 0], [2, 0, 0]]], np.int32),
        usemtl=[], mtllib=None,
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 't.obj')
        writeobj(path, obj)
        back = readobj(path)
    assert np.allclose(back['v'], obj['v'])
    assert back['f'].shape == (2, 3, 3)
    assert np.array_equal(back['f'][:, :, 0], obj['f'][:, :, 0])
    verts = obj_to_vertices(back)
    assert verts.shape == (6, 8)


def test_obj_quad_triangulation_and_mtl():
    src = '''
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
usemtl red
f 1 2 3 4
'''
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'q.obj')
        with open(path, 'w') as f:
            f.write(src)
        obj = readobj(path)
    assert obj['f'].shape[0] == 2  # quad -> 2 tris
    ids = obj_mtlids(obj, {'red': 3})
    assert (ids == 3).all()


def test_texture_bilinear_wrap():
    img = np.zeros((2, 2, 4), np.float32)
    img[0, 0] = [1, 0, 0, 1]
    img[1, 1] = [0, 1, 0, 1]
    atlas = make_textures([img])
    tid = jnp.zeros((1,), jnp.int32)
    # s=t=0 -> exactly texel (0,0)
    v = np.asarray(sample_texture(atlas, tid, jnp.asarray([0.0]), jnp.asarray([0.0])))
    assert np.allclose(v[0], [1, 0, 0, 1], atol=1e-6)
    v = np.asarray(sample_texture(atlas, tid, jnp.asarray([1.0]), jnp.asarray([1.0])))
    assert np.allclose(v[0], [0, 1, 0, 1], atol=1e-6)


def test_make_scene_padding():
    verts = np.zeros((3, 8), np.float32)
    verts[:, 0:3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    s = make_scene(verts, pad_faces_to=64)
    assert s.tri_w2b.shape[0] == 64
    assert int(s.nfaces) == 1
    assert int(s.tri_mtl[1]) == -1
