'''
ptina_tpu — a TPU-native differentiable Monte-Carlo path tracer.

Brand-new JAX/XLA/Pallas implementation with the capability set of the
reference renderer archibate/ptina (see SURVEY.md): Disney BSDF with
transmission, linear-BVH build + traversal, point/area/environment lights
with multiple importance sampling, textures, Sobol quasi-random sampling,
Metropolis light transport, albedo/normal AOVs, progressive film
accumulation, and OBJ/GLTF scene loading — re-architected from the
reference's per-pixel megakernel (reference: ptina/engine/path.py) into a
wavefront pipeline of jit-compiled, differentiable whole-array ops over
struct-of-array ray batches.

Key TPU-first design points (none of these exist in the reference):
  * Ray-triangle intersection runs on the MXU: each triangle is
    precompiled to a 3x4 affine functional, so a full ray cast is two
    [N,4]@[4,3F] matmuls + a masked min-reduction (intersect/brute.py).
  * The integrator is wavefront: [N]-shaped SoA ray state advanced by
    lax.fori_loop over bounces with alive masks, instead of per-thread
    divergent loops (engine/path.py).
  * Sampling is stateless: Sobol points are pure functions of
    (sample_index, dimension) so they jit and shard freely
    (sampling/sobol.py).
  * Scenes/films are pytrees; multi-chip scaling is shard_map over the
    ray axis with per-device film shards (parallel/).
'''

__version__ = '0.1.0'

from ptina_tpu.utils.mathutils import *  # noqa: F401,F403
