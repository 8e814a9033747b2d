import numpy as np
import jax.numpy as jnp
import scipy.special

from ptina_tpu.utils.mathutils import (
    clamp, lerp, smoothstep, tanspace, spherical, unspherical, dir2tex,
    reflect, refract, normaldist, normalize, dot,
)


def test_clamp_lerp():
    assert float(clamp(jnp.asarray(2.0))) == 1.0
    assert float(clamp(jnp.asarray(-1.0))) == 0.0
    assert float(lerp(0.25, 0.0, 8.0)) == 2.0
    assert float(smoothstep(jnp.asarray(0.5))) == 0.5


def test_tanspace_orthonormal():
    n = normalize(jnp.asarray(np.random.RandomState(0).randn(32, 3), jnp.float32))
    T = tanspace(n)
    gram = jnp.einsum('...ij,...ik->...jk', T, T)
    assert np.allclose(np.asarray(gram), np.eye(3)[None], atol=1e-5)
    # third column is the normal itself
    assert np.allclose(np.asarray(T[..., 2]), np.asarray(n), atol=1e-6)


def test_spherical_roundtrip():
    h = jnp.asarray([0.3, -0.7, 0.0, 0.99])
    p = jnp.asarray([0.1, 0.5, 0.9, 0.25])
    d = spherical(h, p)
    assert np.allclose(np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-6)
    h2, p2 = unspherical(d)
    assert np.allclose(np.asarray(h2), np.asarray(h), atol=1e-6)
    assert np.allclose(np.asarray(p2), np.asarray(p), atol=1e-5)


def test_dir2tex_range():
    d = normalize(jnp.asarray(np.random.RandomState(1).randn(64, 3), jnp.float32))
    s, t = dir2tex(d)
    assert (np.asarray(s) >= 0).all() and (np.asarray(s) <= 1).all()
    assert (np.asarray(t) >= 0).all() and (np.asarray(t) <= 1).all()


def test_reflect_refract():
    n = jnp.asarray([0.0, 0.0, 1.0])
    i = normalize(jnp.asarray([1.0, 0.0, -1.0]))
    r = reflect(i, n)
    assert np.allclose(np.asarray(r), np.asarray(normalize(jnp.asarray([1.0, 0.0, 1.0]))), atol=1e-6)
    # straight-through refraction
    has, t = refract(jnp.asarray([0.0, 0.0, -1.0]), n, 1.0 / 1.45)
    assert bool(has) and np.allclose(np.asarray(t), [0, 0, -1], atol=1e-6)
    # total internal reflection: grazing exit from dense medium
    has2, _ = refract(normalize(jnp.asarray([1.0, 0.0, -0.1])), n, 1.45)
    assert not bool(has2)


def test_normaldist_matches_scipy():
    u = jnp.linspace(0.01, 0.99, 21)
    ours = np.asarray(normaldist(u))
    ref = np.sqrt(2) * scipy.special.erfinv(np.asarray(u) * 2 - 1)
    assert np.allclose(ours, ref, atol=1e-4)
