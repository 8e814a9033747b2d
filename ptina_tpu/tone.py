'''
Tone mapping operators for film post-processing.

Counterpart of the reference's unwired ToneMapping experiment
(ptina/wip/tonemapping.py:15-18: a filmic-ish curve with exposure and
gamma) — here finished and usable: pure functions over [.., 3] images or
V3 rows, applied after film_to_image.
'''

import jax.numpy as jnp

__all__ = ['tonemap_filmic', 'tonemap_aces', 'apply_exposure_gamma']


def apply_exposure_gamma(rgb, exposure=1.0, gamma=2.2):
    '''Linear exposure scale followed by display gamma
    (reference wip/tonemapping.py:15-18 applies pow(1/gamma) after an
    exposure multiply).'''
    v = jnp.maximum(rgb * exposure, 0.0)
    return v ** (1.0 / gamma)


def tonemap_filmic(rgb, exposure=1.0):
    '''Hejl-Burgess-style filmic curve (no separate gamma needed; the
    curve embeds an sRGB-like toe).'''
    v = jnp.maximum(rgb * exposure - 0.004, 0.0)
    return (v * (6.2 * v + 0.5)) / (v * (6.2 * v + 1.7) + 0.06)


def tonemap_aces(rgb, exposure=1.0):
    '''Narkowicz ACES approximation, then gamma 2.2.'''
    v = jnp.maximum(rgb * exposure, 0.0)
    mapped = (v * (2.51 * v + 0.03)) / (v * (2.43 * v + 0.59) + 0.14)
    return jnp.clip(mapped, 0.0, 1.0) ** (1.0 / 2.2)
