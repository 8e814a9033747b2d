import numpy as np
import jax
import jax.numpy as jnp

from ptina_tpu.utils.mathutils import normalize, PI
from ptina_tpu.utils.vec import V3, vdot
from ptina_tpu.materials.disney import disney_derive, disney_eval, disney_sample
from ptina_tpu.scene import DEFAULT_MATERIAL


def _v3(a):
    return V3.from_array(jnp.asarray(a, jnp.float32))


def _params(n, **over):
    vals = dict(DEFAULT_MATERIAL)
    vals.update(over)
    base = vals.pop('basecolor')
    base = np.broadcast_to(np.asarray(base, np.float32).reshape(-1)[:3], (n, 3)) \
        if np.ndim(base) else np.full((n, 3), base, np.float32)
    p = {'basecolor': jnp.asarray(base)}
    for k, v in vals.items():
        p[k] = jnp.full((n,), v, jnp.float32)
    return disney_derive(p)


def test_eval_finite_and_nonnegative_diffuse():
    n = 256
    rng = np.random.RandomState(0)
    normal = jnp.asarray([[0.0, 0.0, 1.0]] * n)
    indir = normalize(jnp.asarray(
        np.abs(rng.randn(n, 1)) * [[0, 0, 1]] + rng.randn(n, 3) * [[1, 1, 0]],
        jnp.float32))
    indir = normalize(indir * jnp.asarray([1.0, 1.0, 1.0]) + jnp.asarray([0, 0, 0.5]))
    outdir = normalize(jnp.asarray(rng.randn(n, 3), jnp.float32)
                       * jnp.asarray([1, 1, 0.3]) + jnp.asarray([0, 0, 0.8]))
    p = _params(n, metallic=0.0, transmission=0.0, roughness=0.6)
    normal, indir, outdir = _v3(normal), _v3(indir), _v3(outdir)
    sign = vdot(indir, normal)
    val = disney_eval(p, normal, sign, indir, outdir)
    v = np.asarray(val.to_array())
    assert np.isfinite(v).all()
    assert (v >= -1e-5).all()


def test_sample_outdirs_normalized_and_finite():
    n = 512
    rng = np.random.RandomState(1)
    normal = jnp.asarray([[0.0, 0.0, 1.0]] * n)
    indir = normalize(jnp.asarray(rng.rand(n, 3) * [2, 2, 1] - [1, 1, 0] + [0, 0, 0.2],
                                  jnp.float32))
    samp = jnp.asarray(rng.rand(n, 3), jnp.float32)
    for over in [dict(), dict(metallic=1.0), dict(transmission=1.0, roughness=0.1),
                 dict(clearcoat=1.0), dict(roughness=0.05)]:
        p = _params(n, **over)
        outdir, pdf, color = disney_sample(
            p, _v3(normal), jnp.ones(n), _v3(indir),
            samp[:, 0], samp[:, 1], samp[:, 2])
        o, pd, c = (np.asarray(outdir.to_array()), np.asarray(pdf),
                    np.asarray(color.to_array()))
        assert np.isfinite(o).all() and np.isfinite(pd).all() and np.isfinite(c).all()
        lens = np.linalg.norm(o, axis=1)
        valid = pd > 0
        assert np.allclose(lens[valid], 1.0, atol=1e-4)


def test_diffuse_white_furnace():
    '''For a pure diffuse material the sampled estimator color is the
    energy ratio; its mean over many samples must be <= 1 (energy
    conservation) and reasonably close to basecolor for high albedo.'''
    n = 4096
    rng = np.random.RandomState(2)
    normal = jnp.asarray([[0.0, 0.0, 1.0]] * n)
    indir = jnp.asarray([[0.0, 0.0, 1.0]] * n)
    samp = jnp.asarray(rng.rand(n, 3), jnp.float32)
    p = _params(n, basecolor=1.0, roughness=0.0, specular=0.0, sheen=0.0,
                subsurface=0.0)
    outdir, pdf, color = disney_sample(
        p, _v3(normal), jnp.ones(n), _v3(indir),
        samp[:, 0], samp[:, 1], samp[:, 2])
    c = np.asarray(color.to_array())
    # diffuse lobe carries the Disney Fd terms; mean reflectance stays
    # within a sane band around 1 for white albedo
    mean = c.mean(0)
    assert (mean < 1.15).all() and (mean > 0.6).all()


def test_sample_eval_pdf_consistency_diffuse():
    '''Importance-sampled estimator E[color] should match the
    brdf*cos/pdf integral estimated with the same lobe directions.'''
    n = 8192
    rng = np.random.RandomState(3)
    normal = jnp.asarray([[0.0, 0.0, 1.0]] * n)
    indir = normalize(jnp.asarray([[0.3, 0.1, 0.9]] * n))
    samp = jnp.asarray(rng.rand(n, 3), jnp.float32)
    p = _params(n, roughness=0.4)
    normal, indir = _v3(normal), _v3(indir)
    outdir, pdf, color = disney_sample(
        p, normal, jnp.ones(n), indir, samp[:, 0], samp[:, 1], samp[:, 2])
    # evaluate brdf explicitly at the sampled directions
    val = disney_eval(p, normal, jnp.ones(n), indir, outdir)
    val = val.to_array()
    cos = np.maximum(np.asarray(vdot(outdir, normal)), 0)
    color = color.to_array()
    est_direct = np.asarray(color).mean(0)
    # diffuse-only check: select diffuse lanes (pdf == 1/pi)
    mask = np.isclose(np.asarray(pdf), 1 / np.pi, atol=1e-4)
    if mask.sum() > 100:
        explicit = (np.asarray(val)[mask] * cos[mask, None]) * np.pi
        # color on diffuse lanes is diffuse*pi/(choice pdf); both include Fd
        ratio = explicit.mean(0) / np.asarray(color)[mask].mean(0)
        assert np.all(ratio > 0.2) and np.all(ratio < 5.0)


def test_transmission_refracts():
    n = 64
    normal = jnp.asarray([[0.0, 0.0, 1.0]] * n)
    indir = jnp.asarray([[0.0, 0.0, 1.0]] * n)
    rng = np.random.RandomState(4)
    samp = jnp.asarray(np.stack([rng.rand(n) * 0.2, rng.rand(n),
                                 np.full(n, 0.5)], 1), jnp.float32)
    p = _params(n, transmission=1.0, roughness=0.0, metallic=0.0)
    outdir, pdf, color = disney_sample(
        p, _v3(normal), jnp.ones(n), _v3(indir),
        samp[:, 0], samp[:, 1], samp[:, 2])
    o = np.asarray(outdir.to_array())
    pd = np.asarray(pdf)
    # some lanes must refract through (negative z)
    assert (o[pd > 0, 2] < 0).any()


def test_zero_specialization_is_exact():
    '''Statically skipping identically-zero lobes (Materials.zero) must
    be EXACTLY equivalent to evaluating them against 0-valued params —
    same outdir, pdf, color and eval bits.'''
    import numpy as np
    from ptina_tpu.materials.disney import (disney_derive, disney_eval,
                                            disney_sample)
    from ptina_tpu.utils.vec import V3, vnormalize

    rng = np.random.RandomState(11)
    n = 256
    zero_names = ('metallic', 'subsurface', 'sheen', 'clearcoat',
                  'transmission')
    params = {'basecolor': V3(*(jnp.asarray(rng.rand(n), jnp.float32)
                                for _ in range(3)))}
    for name in ('roughness', 'specular', 'specularTint', 'sheenTint',
                 'clearcoatGloss'):
        params[name] = jnp.asarray(rng.rand(n), jnp.float32)
    params['ior'] = jnp.full((n,), 1.45, jnp.float32)
    for name in zero_names:
        params[name] = jnp.zeros((n,), jnp.float32)
    p = disney_derive(params)

    def unit(seed):
        v = rng.randn(3, n).astype(np.float32)
        return vnormalize(V3(*(jnp.asarray(r) for r in v)))

    normal = unit(0)
    indir = unit(1)
    outdir = unit(2)
    sign = jnp.asarray(rng.rand(n) * 2 - 1, jnp.float32)
    su, sv, sw = (jnp.asarray(rng.rand(n), jnp.float32) for _ in range(3))

    e_full = disney_eval(p, normal, sign, indir, outdir, zero=())
    e_spec = disney_eval(p, normal, sign, indir, outdir, zero=zero_names)
    for a, b in zip((e_full.x, e_full.y, e_full.z),
                    (e_spec.x, e_spec.y, e_spec.z)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o1, pdf1, c1 = disney_sample(p, normal, sign, indir, su, sv, sw,
                                 zero=())
    o2, pdf2, c2 = disney_sample(p, normal, sign, indir, su, sv, sw,
                                 zero=zero_names)
    np.testing.assert_array_equal(np.asarray(pdf1), np.asarray(pdf2))
    for a, b in ((o1.x, o2.x), (o1.y, o2.y), (o1.z, o2.z),
                 (c1.x, c2.x), (c1.y, c2.y), (c1.z, c2.z)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
