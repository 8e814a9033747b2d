'''
Benchmark: cornell two-boxes, 512x512, 32 spp, unidirectional path
tracing with MIS — the reference's headline configuration
(reference exams/benchmark.py:25-38; baseline 7.25 samples/s on a
GeForce 940MX with the CUDA backend, README.md:44).

Methodology mirrors the reference: one warmup render + image readback,
clear the film, then time 32 progressive samples and report
sps = 32 / elapsed.  Prints ONE json line.
'''

import json
import time

import numpy as np
import jax.numpy as jnp


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/ptina_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
    jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')
    from ptina_tpu.scenes import cornell_box
    from ptina_tpu.film import new_film, film_to_image
    from ptina_tpu.engine.path import render

    baseline_sps = 7.25
    res, spp = 512, 32

    scene = cornell_box()
    film = new_film(res, res)

    # warmup: compile the exact timed computation (spp is a static arg, so
    # a different spp would compile a separate executable) + readback
    # (reference methodology: benchmark.py:25-27)
    film = render(scene, film, 0, spp=spp)
    np.asarray(film_to_image(film))
    film = new_film(res, res)

    # timed region syncs by reading back a scalar reduction of the film:
    # block_until_ready() on a donated output can return before remote
    # execution finishes on tunneled devices, under-measuring wildly.
    t0 = time.perf_counter()
    film = render(scene, film, 0, spp=spp)
    checksum = float(jnp.sum(film))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)

    img = np.asarray(film_to_image(film))
    assert not np.isnan(img).any(), 'nan in benchmark render'

    sps = spp / elapsed
    print(json.dumps({
        'metric': 'sps_cornell_512x512_32spp',
        'value': round(sps, 3),
        'unit': 'samples/s',
        'vs_baseline': round(sps / baseline_sps, 3),
    }))


if __name__ == '__main__':
    main()
