'''
Texture atlas sampling.

Replaces the reference's flat texel pool + first-fit allocator
(ptina/image.py, ptina/allocator.py) with a padded stacked atlas
[T, H, W, 4] — static shapes so everything jits.  Sampling semantics
match the reference Image handle: wrap-around integer indexing and
bilinear filtering over (x*(nx-1), y*(ny-1)) (ptina/image.py:137-148,
bilerp ptina/common.py:184-192).
'''

import jax.numpy as jnp

__all__ = ['sample_texture']


def sample_texture(atlas, texid, s, t):
    '''Bilinear wrap-around fetch.  texid, s, t: [..] arrays.
    Returns [.., 4].  texid must be a valid row (clamp/select -1 upstream).'''
    nx = atlas.nx[texid]
    ny = atlas.ny[texid]
    px = s * (nx - 1).astype(s.dtype)
    py = t * (ny - 1).astype(t.dtype)
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    fx = (px - ix)[..., None]
    fy = (py - iy)[..., None]

    def fetch(dx, dy):
        x = jnp.mod(ix + dx, jnp.maximum(nx, 1))
        y = jnp.mod(iy + dy, jnp.maximum(ny, 1))
        return atlas.data[texid, x, y]

    return (fetch(1, 1) * fx * fy
            + fetch(1, 0) * fx * (1.0 - fy)
            + fetch(0, 0) * (1.0 - fx) * (1.0 - fy)
            + fetch(0, 1) * (1.0 - fx) * fy)
