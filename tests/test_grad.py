import numpy as np
import jax
import jax.numpy as jnp

from ptina_tpu.scenes import cornell_box
from ptina_tpu.film import new_film, film_to_image
from ptina_tpu.engine.path import render_sample


def _loss(fac, scene, film):
    sc = scene.replace(materials=scene.materials.replace(fac=fac))
    out = render_sample(sc, film, 0)
    img = film_to_image(out)[..., :3]
    return jnp.mean(img)


def test_material_gradients_match_finite_difference():
    '''Pixel gradients w.r.t. the Disney material factors: autodiff vs
    central finite differences on the white wall basecolor.'''
    scene = cornell_box()
    film = new_film(8, 8)
    fac = scene.materials.fac

    g = jax.grad(_loss)(fac, scene, film)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # perturb white material (row 0) basecolor red channel (param 0, ch 0)
    eps = 1e-2
    idx = (0, 0, 0)
    fp = fac.at[idx].add(eps)
    fm = fac.at[idx].add(-eps)
    lp = float(_loss(fp, scene, film))
    lm = float(_loss(fm, scene, film))
    fd = (lp - lm) / (2 * eps)
    assert fd > 0  # more albedo -> brighter
    assert abs(g[idx] - fd) < 0.2 * max(abs(fd), 1e-3)


def test_gradient_nonzero_only_for_used_params():
    scene = cornell_box()
    film = new_film(8, 8)
    g = np.asarray(jax.grad(_loss)(scene.materials.fac, scene, film))
    # basecolor of the white material participates
    assert np.abs(g[0, 0, :3]).sum() > 0
    # channel 3 (alpha) of basecolor is unused by shading
    assert np.abs(g[:, 0, 3]).sum() == 0
