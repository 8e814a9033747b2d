'''
Microfacet theory helpers, vectorized (reference: ptina/materials/microfacet.py).
All functions are elementwise over any batch shape and numerically guarded
so masked-out lanes stay finite (required for clean autodiff).
Lobe samplers return local-frame directions as SoA V3 rows.
'''

import jax.numpy as jnp

from ptina_tpu.utils.mathutils import PI, clamp, spherical, normalize, safe_sqrt
from ptina_tpu.utils.vec import vspherical

__all__ = ['schlick_fresnel', 'dielectric_fresnel', 'gtr1', 'gtr2',
           'smith_ggx', 'sample_gtr1', 'sample_gtr2', 'sample_gtr2_vnor']


def schlick_fresnel(cost):
    '''(1 - cos)^5 (reference: microfacet.py:8-10).'''
    return clamp(1.0 - cost, 0.0, 1.0) ** 5


def dielectric_fresnel(etai, etao, cosi):
    '''Full unpolarized dielectric Fresnel with total internal reflection
    (reference: microfacet.py:13-27; argument order kept identical).'''
    sini = safe_sqrt(1.0 - cosi * cosi)
    sint = etao / etai * sini
    no_tir = sint < 1.0
    cost = safe_sqrt(1.0 - sint * sint)
    a1, a2 = etai * cosi, etao * cost
    b1, b2 = etao * cosi, etai * cost
    para = (a1 - a2) / jnp.maximum(a1 + a2, 1e-12)
    perp = (b1 - b2) / jnp.maximum(b1 + b2, 1e-12)
    return jnp.where(no_tir, 0.5 * (para * para + perp * perp), 1.0)


def gtr1(cosh, alpha):
    '''Berry NDF used for clearcoat (reference: microfacet.py:30-34).
    alpha must stay < 1 (the clearcoat alpha range is [0.001, 0.1]).'''
    a2 = alpha * alpha
    t = 1.0 + (a2 - 1.0) * cosh * cosh
    denom = PI * jnp.log(jnp.maximum(a2, 1e-12)) * t
    return (a2 - 1.0) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)


def gtr2(cosh, alpha):
    '''GGX NDF (reference: microfacet.py:37-41).'''
    a2 = alpha * alpha
    t = 1.0 + (a2 - 1.0) * cosh * cosh
    return a2 / (PI * jnp.maximum(t * t, 1e-12))


def smith_ggx(cosi, alpha):
    '''Smith masking term 1/(cos + sqrt(a^2 + cos^2 - a^2 cos^2))
    (reference: microfacet.py:44-48).'''
    a = alpha * alpha
    b = cosi * cosi
    return 1.0 / jnp.maximum(cosi + safe_sqrt(a + b - a * b), 1e-12)


def sample_gtr1(u, v, alpha):
    '''Importance-sample the GTR1 lobe, local frame.  Uses the standard
    CDF inversion cos = sqrt((1 - a^(2(1-u))) / (1 - a^2)); the reference's
    expression (microfacet.py:68-71) misplaces the parentheses and yields
    nan for most u, which its callers silently reject — fixed here.'''
    a2 = jnp.maximum(alpha * alpha, 1e-12)
    h = safe_sqrt(jnp.maximum(1.0 - a2 ** (1.0 - u), 0.0) /
                  jnp.maximum(1.0 - a2, 1e-12))
    return vspherical(h, v)


def sample_gtr2(u, v, alpha):
    '''Importance-sample the GGX lobe, local frame (reference:
    microfacet.py:74-77).'''
    h = safe_sqrt((1.0 - u) / jnp.maximum(1.0 - u * (1.0 - alpha * alpha), 1e-12))
    return vspherical(h, v)


def sample_gtr2_vnor(ve, u, v, alpha):
    '''Visible-normal GGX sampling (present but disabled in the reference,
    microfacet.py:81-100 / disney.py:162).  ve: view dir in local frame.'''
    vh = normalize(jnp.stack([alpha * ve[..., 0], alpha * ve[..., 1],
                              ve[..., 2]], axis=-1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    safe = lensq > 1e-12
    inv = 1.0 / jnp.sqrt(jnp.where(safe, lensq, 1.0))
    t1 = jnp.where(safe[..., None],
                   jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv,
                              jnp.zeros_like(inv)], axis=-1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    r = safe_sqrt(u)
    phi = 2.0 * PI * v
    p1 = r * jnp.cos(phi)
    p2r = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2r
    nh = (p1[..., None] * t1 + p2[..., None] * t2 +
          safe_sqrt(1.0 - p1 * p1 - p2 * p2)[..., None] * vh)
    ne = normalize(jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                              jnp.maximum(nh[..., 2], 0.0)], axis=-1))
    return ne
