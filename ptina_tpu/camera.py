'''
Camera ray generation from a 4x4 view-projection matrix.

Same unproject-two-points scheme as the reference (works for both
perspective and orthographic matrices; reference: ptina/camera.py:34-39),
vectorized over pixel batches.
'''

import jax.numpy as jnp

from ptina_tpu.utils.mathutils import normalize

__all__ = ['camera_rays']


def camera_rays(v2w, x, y):
    '''x, y: [..] NDC coords in [-1, 1].  Returns (ro, rd) each [.., 3].'''
    one = jnp.ones_like(x)

    def unproject(z):
        p = jnp.stack([x, y, z * one, one], axis=-1)
        q = jnp.einsum('ij,...j->...i', v2w, p)
        return q[..., :3] / q[..., 3:4]

    ro = unproject(-1.0)
    ro1 = unproject(1.0)
    return ro, normalize(ro1 - ro)
