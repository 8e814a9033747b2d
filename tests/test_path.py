import numpy as np
import jax
import jax.numpy as jnp

from ptina_tpu.scenes import cornell_box
from ptina_tpu.scene import make_scene
from ptina_tpu.film import new_film, film_to_image
from ptina_tpu.engine.path import render, render_sample, power_heuristic


def test_power_heuristic():
    assert abs(float(power_heuristic(jnp.asarray(1.0), jnp.asarray(1.0))) - 0.5) < 1e-6
    assert float(power_heuristic(jnp.asarray(10.0), jnp.asarray(0.1))) > 0.99


def _tiny_degenerate_scene(**kw):
    # single far-away triangle so almost every ray escapes to the env
    verts = np.zeros((3, 8), np.float32)
    verts[:, :3] = [[100, 100, 100], [101, 100, 100], [100, 101, 100]]
    verts[:, 5] = 1.0
    return make_scene(verts, **kw)


def test_furnace_env_only():
    '''Rays that hit nothing must return exactly the env color
    (reference path.py:37-39).'''
    scene = _tiny_degenerate_scene(
        lights=[], default_light=False, world_fac=(0.7, 0.6, 0.5, 1.0))
    film = render(scene, new_film(16, 16), 0, spp=1)
    img = np.asarray(film_to_image(film))
    assert np.allclose(img[..., 0], 0.7, atol=1e-5)
    assert np.allclose(img[..., 1], 0.6, atol=1e-5)
    assert np.allclose(img[..., 2], 0.5, atol=1e-5)


def test_render_deterministic():
    scene = cornell_box()
    f1 = render(scene, new_film(16, 16), 0, spp=2)
    f2 = render(scene, new_film(16, 16), 0, spp=2)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


def test_render_progressive_equals_batched():
    '''spp=2 in one call == two sequential one-sample calls.'''
    scene = cornell_box()
    fa = render(scene, new_film(8, 8), 0, spp=2)
    fb = render(scene, new_film(8, 8), 0, spp=1)
    fb = render(scene, fb, 1, spp=1)
    assert np.allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)


def test_cornell_sanity():
    scene = cornell_box()
    film = render(scene, new_film(16, 16), 0, spp=4)
    img = np.asarray(film_to_image(film))
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0.05  # scene is lit
    # left third redder than right third; right third greener
    left = img[:5, 4:12, :3].mean(axis=(0, 1))
    right = img[-5:, 4:12, :3].mean(axis=(0, 1))
    assert left[0] > left[1]
    assert right[1] > right[0]


def test_tile_offsets_compose():
    '''Rendering two half-films with x0 offsets equals the full film
    (exercises the tile/shard path).'''
    scene = cornell_box()
    full = render_sample(scene, new_film(16, 8), 0)
    top = render_sample(scene, new_film(8, 8), 0, x0=0, full_res=(16, 8))
    bot = render_sample(scene, new_film(8, 8), 0, x0=8, full_res=(16, 8))
    glued = jnp.concatenate([top, bot], axis=2)
    assert np.allclose(np.asarray(full), np.asarray(glued), atol=1e-5)
