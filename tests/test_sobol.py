import numpy as np
import jax.numpy as jnp
from scipy.stats import qmc

from ptina_tpu.sampling.sobol import (
    sobol, sobol_vgrid, sobol_block, sample_dims, pixel_rotation, SKIP,
)


def test_matches_scipy_sequence():
    d = 8
    vg = sobol_vgrid(d)
    ours = np.asarray(sobol(jnp.arange(64), vg))
    ref = qmc.Sobol(d=d, scramble=False).random(64)
    assert np.allclose(ours, ref, atol=1e-7)


def test_block_has_skip():
    vg = sobol_vgrid(4)
    direct = np.asarray(sobol(jnp.asarray(5 + SKIP), vg))
    block = np.asarray(sobol_block(5, 4))
    assert np.allclose(direct, block)


def test_pixel_rotation_decorrelates():
    rot = np.asarray(pixel_rotation(jnp.arange(100), jnp.zeros(100, jnp.int32), 8))
    assert rot.shape == (8, 100)  # dimension-major (see pixel_rotation doc)
    assert (rot >= 0).all() and (rot < 1).all()
    # distinct pixels get distinct rotations
    assert len(np.unique(rot[0].round(6))) > 90


def test_sample_dims_stratification():
    # rotated Sobol keeps 1-D stratification per pixel: 64 samples of one
    # pixel's dim 0 should cover [0,1) nearly uniformly
    ii = jnp.zeros(1, jnp.int32)
    jj = jnp.zeros(1, jnp.int32)
    vals = np.array([
        float(sample_dims(s, ii, jj, 4)[0, 0]) for s in range(64)
    ])
    hist, _ = np.histogram(vals, bins=8, range=(0, 1))
    assert hist.min() >= 6  # near-perfect balance (8 per bin ideal)
