'''
Ray-scene intersection backends.

  * brute:    dense MXU-friendly all-triangles test — the fast path for
              benchmark-scale scenes (no gathers, no divergence).
  * lbvh:     device-built Karras linear BVH (build) + batched stack
              traversal (traverse) — the sublinear path for big scenes.

Both implement the same contract:
    cast_closest(ro, rd, scene_tris, avoid) -> Hit
    cast_any(ro, rd, scene_tris, avoid, tmax) -> occluded mask
'''

from ptina_tpu.intersect.brute import Hit  # noqa: F401
from ptina_tpu.intersect.dispatch import cast_closest, cast_any  # noqa: F401
