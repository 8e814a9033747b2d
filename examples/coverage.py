'''Golden-image coverage render (reference exams/coverage.py): cornell
at 512x512, 32 spp, written to /tmp for eyeballing — plus a numeric
summary so CI can assert on drift.'''
import numpy as np

from ptina_tpu.scenes import cornell_box
from ptina_tpu.film import new_film, film_to_image
from ptina_tpu.engine.path import render

scene = cornell_box()
film = render(scene, new_film(512, 512), 0, spp=32)
img = np.asarray(film_to_image(film))
print('mean', img[..., :3].mean(), 'p99', np.percentile(img[..., :3], 99))

try:
    from PIL import Image
    rgb = np.clip(img[..., :3], 0, 1) ** (1 / 2.2)
    Image.fromarray((np.transpose(rgb, (1, 0, 2))[::-1] * 255).astype(np.uint8)) \
        .save('/tmp/coverage_cornell.png')
    print('saved /tmp/coverage_cornell.png')
except ImportError:
    pass
