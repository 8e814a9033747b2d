'''
Benchmark: the reference's headline configurations, 512x512, 32 spp,
unidirectional path tracing with MIS (reference exams/benchmark.py:25-38;
baselines on a GeForce 940MX CUDA: cornell two-boxes 7.25 sps
(README.md:44), cornell+monkey 2.88 sps (README.md:50)).

Methodology mirrors the reference: one warmup render + image readback,
clear the film, then time 32 progressive samples; sps = 32 / elapsed.

Prints one JSON line per metric; the HEADLINE cornell line is printed
LAST (the driver parses the final line):
  - sps_cornell_monkey_512x512_32spp   (978 tris, vs 2.88 sps)
  - sps_cornell_highpoly_512x512_8spp  (~102k tris -> blocked two-level
    cast; no reference baseline row — vs_baseline uses the monkey 2.88,
    the closest published BVH-bound number)
  - sps_cornell_textured_512x512_32spp (wavefront path: textures make
    the scene ineligible for the fused megakernel; vs 7.25)
  - sps_cornell_512x512_32spp          (34 tris, vs 7.25 sps)
'''

import json
import time

import numpy as np


def _time_render(scene, res, spp, warm_spp=None):
    import jax
    import jax.numpy as jnp
    from ptina_tpu.film import new_film, film_to_image
    from ptina_tpu.engine.path import render

    film = new_film(res, res)
    film = render(scene, film, 0, spp=warm_spp or spp)
    np.asarray(film_to_image(film))
    film = new_film(res, res)

    # sync by reading back a scalar reduction of the film:
    # block_until_ready() on a donated output can return before remote
    # execution finishes on tunneled devices, under-measuring wildly.
    t0 = time.perf_counter()
    film = render(scene, film, 0, spp=spp)
    checksum = float(jnp.sum(film))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)
    img = np.asarray(film_to_image(film))
    assert not np.isnan(img).any(), 'nan in benchmark render'
    return spp / elapsed


def _emit(metric, sps, baseline):
    print(json.dumps({
        'metric': metric,
        'value': round(sps, 3),
        'unit': 'samples/s',
        'vs_baseline': round(sps / baseline, 3),
    }), flush=True)


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/ptina_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
    jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')
    from ptina_tpu.scenes import (cornell_box, cornell_monkey,
                                  cornell_highpoly)

    res, spp = 512, 32

    sps = _time_render(cornell_monkey(), res, spp)
    _emit('sps_cornell_monkey_512x512_32spp', sps, 2.88)

    # ~102k faces: auto-routes to the blocked two-level cast on TPU
    sps = _time_render(cornell_highpoly(), res, 8)
    _emit('sps_cornell_highpoly_512x512_8spp', sps, 2.88)

    # textured cornell: drops off the fused megakernel to the wavefront
    # path (measures the "narrow fast path" penalty explicitly)
    tex = (np.linspace(0, 1, 64 * 64, dtype=np.float32)
           .reshape(64, 64, 1) * np.ones((1, 1, 3), np.float32))
    scene_tex = cornell_box(images=[tex])
    sps = _time_render(scene_tex, res, spp)
    _emit('sps_cornell_textured_512x512_32spp', sps, 7.25)

    # headline metric LAST: cornell two-boxes vs 7.25 sps CUDA baseline
    sps = _time_render(cornell_box(), res, spp)
    _emit('sps_cornell_512x512_32spp', sps, 7.25)


if __name__ == '__main__':
    main()
