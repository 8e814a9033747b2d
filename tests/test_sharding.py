import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptina_tpu.scenes import cornell_box
from ptina_tpu.film import new_film
from ptina_tpu.engine.path import render
from ptina_tpu.parallel import make_mesh, render_sharded, train_step_sharded


@pytest.fixture(scope='module')
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices (see conftest XLA_FLAGS)')
    return jax.devices()[:8]


def test_sharded_render_matches_single_device(eight_devices):
    scene = cornell_box()
    mesh = make_mesh(eight_devices)
    nx, ny = 16, 8
    single = render(scene, new_film(nx, ny), 0, spp=1)
    sharded = render_sharded(scene, new_film(nx, ny), 0, mesh, spp=1)
    assert np.allclose(np.asarray(single), np.asarray(sharded), atol=1e-5)


def test_train_step_sharded_runs_and_descends(eight_devices):
    scene = cornell_box()
    mesh = make_mesh(eight_devices)
    nx, ny = 16, 8
    target = jnp.zeros((nx, ny, 3))
    film0 = new_film(nx, ny)
    s1, l1 = train_step_sharded(scene, film0, target, 0, mesh, lr=0.1)
    s2, l2 = train_step_sharded(s1, film0, target, 0, mesh, lr=0.1)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) <= float(l1) + 1e-3  # same sample index -> descends
