'''
Camera ray generation from a 4x4 view-projection matrix.

Same unproject-two-points scheme as the reference (works for both
perspective and orthographic matrices; reference: ptina/camera.py:34-39),
vectorized over pixel batches.  Rays are produced directly in SoA form
(V3 component rows) — the 4x4 is applied as 8 scalar-broadcast FMAs per
point instead of a per-ray einsum, so ray generation fuses into the
integrator with no materialized [N, 4] intermediates.
'''

import jax.numpy as jnp

from ptina_tpu.utils.vec import V3, vnormalize

__all__ = ['camera_rays']


def camera_rays(v2w, x, y):
    '''x, y: [..] NDC coords in [-1, 1].  Returns (ro, rd) V3 pairs.'''
    m = v2w

    def unproject(z):
        px = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
        py = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
        pz = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
        pw = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3]
        inv = 1.0 / pw
        return V3(px * inv, py * inv, pz * inv)

    ro = unproject(-1.0)
    ro1 = unproject(1.0)
    return ro, vnormalize(ro1 - ro)
