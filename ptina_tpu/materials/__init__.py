'''
Material models (all pure elementwise jnp functions over ray batches).

The reference's `Choice` stream-splitting lobe selector
(ptina/materials/__init__.py:21-48) consumes ONE uniform for all branch
decisions, remapping the remainder after each test so a single random
number drives the whole decision tree while the combined discrete pdf is
tracked.  `choice_split` below is its branchless counterpart: it returns
the taken mask, the remapped uniform and the per-branch pdf factors, and
the caller composes per-lane lobe masks out of them.
'''

import jax.numpy as jnp

__all__ = ['choice_split']


def choice_split(w, rate, tiny=1e-12):
    '''One stream-splitting decision (reference Choice.__call__,
    ptina/materials/__init__.py:37-48).

    w: [..] uniforms in [0,1); rate: [..] branch probability.
    Returns (taken mask, remapped w, pdf factor applied on this decision:
    rate where taken else 1-rate).'''
    taken = w < rate
    safe_r = jnp.maximum(rate, tiny)
    safe_1r = jnp.maximum(1.0 - rate, tiny)
    w2 = jnp.where(taken, w / safe_r, (w - rate) / safe_1r)
    pdf = jnp.where(taken, rate, 1.0 - rate)
    return taken, w2, pdf
