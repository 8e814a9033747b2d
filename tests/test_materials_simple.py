'''Lambert / Mirror / Phong material models (reference
ptina/materials/lambert.py, phong.py) + config/checkpoint integration.'''

import os

import numpy as np
import jax
import jax.numpy as jnp

from ptina_tpu.utils.vec import V3, vdot, vnorm
from ptina_tpu.materials.simple import (
    lambert_eval, lambert_sample, mirror_sample, phong_sample,
)


def _rows(n, x, y, z):
    return V3(jnp.full((n,), x), jnp.full((n,), y), jnp.full((n,), z))


def _params(n, basecolor=(0.8, 0.6, 0.4), roughness=0.4):
    return {
        'basecolor': _rows(n, *basecolor),
        'roughness': jnp.full((n,), roughness),
    }


def _uniforms(n, seed=0):
    k = jax.random.key(seed)
    u = jax.random.uniform(k, (3, n))
    return u[0], u[1], u[2]


def test_lambert_cosine_hemisphere():
    n = 4096
    p = _params(n)
    normal = _rows(n, 0.0, 0.0, 1.0)
    indir = _rows(n, 0.0, 0.0, 1.0)
    su, sv, sw = _uniforms(n)
    out, pdf, color = lambert_sample(p, normal, jnp.ones(n), indir,
                                     su, sv, sw)
    cos = np.asarray(vdot(out, normal))
    assert (cos >= -1e-6).all()                      # upper hemisphere
    assert np.allclose(np.asarray(vnorm(out)), 1.0, atol=1e-4)
    # cosine-weighted: E[cos] = 2/3
    assert abs(cos.mean() - 2.0 / 3.0) < 0.02
    assert np.allclose(np.asarray(pdf), 1.0 / np.pi)
    assert np.allclose(np.asarray(color.x), 0.8)
    ev = lambert_eval(p, normal, jnp.ones(n), indir, out)
    assert np.allclose(np.asarray(ev.x), 0.8 / np.pi)


def test_mirror_reflects():
    n = 8
    p = _params(n, basecolor=(1.0, 1.0, 1.0))
    normal = _rows(n, 0.0, 0.0, 1.0)
    indir = _rows(n, 0.6, 0.0, 0.8)  # toward the surface's viewer side
    su, sv, sw = _uniforms(n)
    out, pdf, color = mirror_sample(p, normal, jnp.ones(n), indir,
                                    su, sv, sw)
    # reflect(-indir, n) with indir the to-viewer direction: out.z = in.z
    assert np.allclose(np.asarray(out.x), -0.6, atol=1e-6)
    assert np.allclose(np.asarray(out.z), 0.8, atol=1e-6)
    assert (np.asarray(pdf) > 1e5).all()  # inf sentinel kills light-hit MIS


def test_phong_lobe_and_horizon():
    n = 4096
    p = _params(n, roughness=0.3)
    normal = _rows(n, 0.0, 0.0, 1.0)
    indir = _rows(n, 0.0, 0.0, 1.0)  # reflection = +z, lobe around it
    su, sv, sw = _uniforms(n, seed=1)
    out, pdf, color = phong_sample(p, normal, jnp.ones(n), indir, su, sv, sw)
    ok = np.asarray(pdf) > 0
    assert ok.mean() > 0.95                # lobe around +z: nearly all valid
    cos = np.asarray(vdot(out, normal))
    assert (cos[ok] >= -1e-6).all()        # invalid = below-horizon rejected
    assert cos[ok].mean() > 2.0 / 3.0      # tighter than cosine hemisphere


def test_render_with_each_model():
    '''Every model renders the cornell scene finite and lit through the
    engine's model dispatch (worker set_config path).'''
    from ptina_tpu.scenes import cornell_box
    from ptina_tpu.film import new_film, film_to_image
    from ptina_tpu.engine.path import render
    scene = cornell_box()
    for model in ('lambert', 'phong'):
        film = render(scene, new_film(8, 8), 0, spp=1, model=model)
        img = np.asarray(film_to_image(film))
        assert np.isfinite(img).all(), model
        assert img[..., :3].mean() > 0.01, model


def test_worker_config_and_checkpoint(tmp_path):
    '''Config drives the worker; save/load resumes the film bit-exactly
    (capability the reference lacks, SURVEY.md §5).'''
    from ptina_tpu import worker
    worker.init()
    assert worker.get_config().material_model == 'disney'
    worker.set_config(material_model='lambert')
    worker.load_model(np.asarray(_cornell_verts(), np.float32))
    worker.set_size(8, 8)
    worker.render()
    worker.render()
    ck = os.path.join(tmp_path, 'state.ckpt')
    worker.save_state(ck)
    img_before = worker.get_image()

    worker.init()  # wipe everything
    worker.set_config(material_model='lambert')
    worker.load_model(np.asarray(_cornell_verts(), np.float32))
    assert worker.load_state(ck)
    img_after = worker.get_image()
    assert np.array_equal(img_before, img_after)
    # resuming continues the progressive accumulation
    worker.render()
    assert not np.array_equal(worker.get_image(), img_after)


def _cornell_verts():
    from ptina_tpu.scenes import cornell_box_vertices
    return cornell_box_vertices()[0]
