'''MLT render (reference exams/metropolis.py): cornell with Metropolis
chains, progressive passes written to /tmp.'''
import numpy as np
import jax

from ptina_tpu.scenes import cornell_box
from ptina_tpu.film import new_film, film_to_image
from ptina_tpu.engine.mlt import mlt_init, render_mlt

scene = cornell_box()
film = new_film(256, 256)
state = mlt_init(jax.random.key(0), nchains=256 * 256)

for it in range(8):
    state, film = render_mlt(scene, state, film, steps=4)
    print('pass', it)

img = np.asarray(film_to_image(film))
print('mean', img[..., :3].mean())
try:
    from PIL import Image
    rgb = np.clip(img[..., :3], 0, 1) ** (1 / 2.2)
    Image.fromarray((np.transpose(rgb, (1, 0, 2))[::-1] * 255).astype(np.uint8)) \
        .save('/tmp/metropolis_cornell.png')
    print('saved /tmp/metropolis_cornell.png')
except ImportError:
    pass
