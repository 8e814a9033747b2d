'''
Sampling utilities: integer hashes for pixel decorrelation and a
pseudo-random fallback sampler.

(reference: ptina/sampling/__init__.py:8-31 for the wang hashes.)
'''

import jax
import jax.numpy as jnp

__all__ = ['wanghash', 'wanghash2', 'wanghash3', 'hash_uniform', 'uniform_grid']

_U32 = jnp.uint32


def wanghash(x):
    '''Wang integer hash (reference: ptina/sampling/__init__.py:8-15).
    Accepts/returns uint32 arrays.'''
    x = x.astype(_U32)
    x = (x ^ _U32(61)) ^ (x >> _U32(16))
    x = x * _U32(9)
    x = x ^ (x >> _U32(4))
    x = x * _U32(0x27d4eb2d)
    x = x ^ (x >> _U32(15))
    return x


def wanghash2(i, j):
    '''Two-int decorrelation hash (reference: ptina/sampling/__init__.py:18-24).'''
    return wanghash(wanghash(jnp.asarray(i)) + jnp.asarray(j).astype(_U32))


def wanghash3(i, j, k):
    '''Three-int hash (reference: ptina/sampling/__init__.py:27-31).'''
    return wanghash(wanghash2(i, j) + jnp.asarray(k).astype(_U32))


def hash_uniform(*ints):
    '''Hash integers to a float uniform in [0, 1).'''
    h = wanghash(jnp.asarray(ints[0]))
    for x in ints[1:]:
        h = wanghash(h + jnp.asarray(x).astype(_U32))
    return h.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def uniform_grid(key, shape):
    '''Plain pseudo-random uniforms (reference RandomSampler,
    ptina/sampling/random.py) — used for tests and MLT chain resets.'''
    return jax.random.uniform(key, shape)
