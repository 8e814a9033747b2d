'''
Checkpoint / resume for long progressive renders.

The reference has no cross-process persistence (SURVEY.md §5) — a killed
render loses everything.  Here the full render state is a small pytree
(film accumulator + next sample index + optional MLT chain state), so
save/restore is trivial and a restarted render continues bit-exactly
(the samplers are stateless functions of the sample index).
'''

import os
import pickle

import numpy as np
import jax

__all__ = ['save_render_state', 'load_render_state']


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_render_state(path, film, sample_index, mlt_state=None, meta=None):
    '''Atomically write the render state.'''
    state = {
        'film': np.asarray(film),
        'sample_index': int(sample_index),
        'mlt_state': None if mlt_state is None else _to_host(mlt_state),
        'meta': meta or {},
        'version': 1,
    }
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(state, f, protocol=4)
    os.replace(tmp, path)


def load_render_state(path):
    '''Returns dict(film, sample_index, mlt_state, meta) with film as a
    jnp-convertible numpy array, or None if no checkpoint exists.'''
    if not os.path.exists(path):
        return None
    with open(path, 'rb') as f:
        state = pickle.load(f)
    assert state.get('version') == 1
    return state
