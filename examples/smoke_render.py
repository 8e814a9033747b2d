'''Quick smoke render on CPU: cornell box at low res, save PNG.'''
import os
import sys

os.environ['JAX_PLATFORMS'] = os.environ.get('SMOKE_PLATFORM', 'cpu')

import numpy as np
import jax

if os.environ.get('SMOKE_PLATFORM', 'cpu') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

from ptina_tpu.scenes import cornell_box, cornell_monkey
from ptina_tpu.film import new_film, film_to_image
from ptina_tpu.engine.path import render

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
scene_name = sys.argv[3] if len(sys.argv) > 3 else 'cornell'

scene = {'cornell': cornell_box, 'monkey': cornell_monkey}[scene_name]()
film = new_film(res, res)
film = render(scene, film, 0, spp=spp)
img = np.asarray(film_to_image(film))
print('image', img.shape, 'min', img[..., :3].min(), 'max', img[..., :3].max(),
      'mean', img[..., :3].mean(), 'nan', np.isnan(img).any())

# save a PNG via PIL if available
try:
    from PIL import Image
    rgb = np.clip(img[..., :3], 0, 1) ** (1 / 2.2)
    # film is [x, y]; images are row = y (flipped), col = x
    rgb8 = (np.transpose(rgb, (1, 0, 2))[::-1] * 255).astype(np.uint8)
    Image.fromarray(rgb8).save(f'/tmp/smoke_{scene_name}_{res}.png')
    print('saved', f'/tmp/smoke_{scene_name}_{res}.png')
except ImportError:
    pass
