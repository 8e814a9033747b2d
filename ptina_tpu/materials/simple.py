'''
Alternate material models: Lambert, Mirror, Phong.

Reference: ptina/materials/lambert.py:8-39 (Lambert cosine-hemisphere
diffuse, Mirror perfect specular with pdf=inf sentinel) and
ptina/materials/phong.py:8-33 (classic Phong lobe sampler that rejects
below-horizon directions).  Same calling convention as the Disney
functions (materials/disney.py): pure elementwise jnp over SoA V3 rows,
`*_eval(p, normal, sign, indir, outdir) -> V3` and
`*_sample(p, normal, sign, indir, su, sv, sw) -> (outdir, pdf, color)`.

`p` is the derived parameter dict from mtllib.fetch_material: these
models read `basecolor` (and Phong maps roughness -> shineness), so any
scene authored for Disney renders under them unchanged — the reference
selects them the same way, by swapping which class mtllib constructs.

The per-model dispatch happens at TRACE time (static string), so a jit
cache entry contains exactly one model's math: see `bsdf_eval` /
`bsdf_sample`.
'''

import jax.numpy as jnp

from ptina_tpu.utils.mathutils import INF
from ptina_tpu.utils.vec import (
    V3, vdot, vnormalize, vreflect, vspherical, vtanframe, vwhere,
)

__all__ = ['lambert_eval', 'lambert_sample', 'mirror_eval', 'mirror_sample',
           'phong_eval', 'phong_sample', 'bsdf_eval', 'bsdf_sample',
           'MATERIAL_MODELS']


def _to_frame(normal, local):
    tan, bitan = vtanframe(normal)
    return tan * local.x + bitan * local.y + normal * local.z


def lambert_eval(p, normal, sign, indir, outdir):
    '''reference Lambert.brdf (lambert.py:15-18): color / pi.'''
    return p['basecolor'] * (1.0 / jnp.pi)


def lambert_sample(p, normal, sign, indir, su, sv, sw):
    '''Cosine-hemisphere bounce (reference Lambert.bounce,
    lambert.py:21-23): outdir = frame @ spherical(sqrt(u), v),
    pdf = 1/pi, throughput color = basecolor.'''
    outdir = _to_frame(normal, vspherical(jnp.sqrt(su), sv))
    pdf = jnp.full_like(su, 1.0 / jnp.pi)
    return outdir, pdf, p['basecolor']


def mirror_eval(p, normal, sign, indir, outdir):
    '''Perfect mirror: zero everywhere for NEE (reference Mirror.brdf,
    lambert.py:33-35).'''
    zero = jnp.zeros_like(sign)
    return V3(zero, zero, zero)


def mirror_sample(p, normal, sign, indir, su, sv, sw):
    '''Deterministic reflection, pdf = inf sentinel so MIS weights the
    light-hit path to ~0 (reference Mirror.bounce, lambert.py:37-39).'''
    outdir = vreflect(-1.0 * indir, normal)
    pdf = jnp.full_like(su, INF)
    return outdir, pdf, p['basecolor']


def _shineness(p):
    # Phong exponent from the shared parameter set: the reference
    # constructs Phong(color, shineness=32) directly; here shineness
    # derives from roughness via the standard Blinn-style mapping
    # 2/r^2 - 2 (roughness 0 -> mirror-sharp, 1 -> broad exponent-0 lobe).
    r = jnp.clip(p.get('roughness', jnp.asarray(0.4)), 1e-3, 1.0)
    return jnp.maximum(2.0 / (r * r) - 2.0, 0.0)


def phong_eval(p, normal, sign, indir, outdir):
    '''reference Phong.brdf (phong.py:16-22) returns color / pi (the ndf
    term is computed there but unused — kept faithfully).'''
    return p['basecolor'] * (1.0 / jnp.pi)


def phong_sample(p, normal, sign, indir, su, sv, sw):
    '''Phong lobe around the reflected direction (reference Phong.bounce,
    phong.py:24-33): cos_r = u^(1/(m+1)); samples below the horizon are
    invalid (pdf = 0, color = 0).'''
    m = _shineness(p)
    cosor = su ** (1.0 / (m + 1.0))
    refldir = vreflect(-1.0 * indir, normal)
    outdir = _to_frame(refldir, vspherical(cosor, sv))
    ok = vdot(outdir, normal) >= 0.0
    pdf = jnp.where(ok, 1.0 / jnp.pi, 0.0)
    color = vwhere(ok, p['basecolor'], 0.0)
    return vnormalize(vwhere(ok, outdir, normal)), pdf, color


def _disney_eval(p, normal, sign, indir, outdir, zero=()):
    from ptina_tpu.materials.disney import disney_eval
    return disney_eval(p, normal, sign, indir, outdir, zero)


def _disney_sample(p, normal, sign, indir, su, sv, sw, zero=()):
    from ptina_tpu.materials.disney import disney_sample
    return disney_sample(p, normal, sign, indir, su, sv, sw, zero)


MATERIAL_MODELS = {
    'disney': (_disney_eval, _disney_sample),
    'lambert': (lambert_eval, lambert_sample),
    'mirror': (mirror_eval, mirror_sample),
    'phong': (phong_eval, phong_sample),
}


def bsdf_eval(model, p, normal, sign, indir, outdir, zero=()):
    '''Static-string model dispatch (the reference swaps material classes
    in mtllib.py:79-95 by edit; here it is a config knob).  zero: static
    zero-parameter names (Materials.zero), consumed by the disney model
    to drop dead lobes at trace time.'''
    if model == 'disney':
        return MATERIAL_MODELS[model][0](p, normal, sign, indir, outdir,
                                         zero)
    return MATERIAL_MODELS[model][0](p, normal, sign, indir, outdir)


def bsdf_sample(model, p, normal, sign, indir, su, sv, sw, zero=()):
    if model == 'disney':
        return MATERIAL_MODELS[model][1](p, normal, sign, indir, su, sv,
                                         sw, zero)
    return MATERIAL_MODELS[model][1](p, normal, sign, indir, su, sv, sw)
