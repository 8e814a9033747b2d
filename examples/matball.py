'''Material preview ball (reference exams/matball.py): Disney sphere on
a ground plane with an optional roughness texture.'''
import numpy as np

from ptina_tpu.scenes import matball
from ptina_tpu.io.matrix import perspective, lookat
from ptina_tpu.film import new_film, film_to_image
from ptina_tpu.engine.path import render

# checker roughness texture
u, v = np.meshgrid(np.arange(64), np.arange(64), indexing='ij')
checker = (((u // 8) + (v // 8)) % 2).astype(np.float32) * 0.7 + 0.1
tex = np.stack([checker] * 3, axis=-1)

cam = perspective(fov=45) @ lookat(pos=(0, 1, 0), back=(2.5, 1.5, 2.5))
scene = matball(roughness_tex=tex, cam_pers=cam)
film = render(scene, new_film(256, 256), 0, spp=16)
img = np.asarray(film_to_image(film))
print('mean', img[..., :3].mean())
try:
    from PIL import Image
    rgb = np.clip(img[..., :3], 0, 1) ** (1 / 2.2)
    Image.fromarray((np.transpose(rgb, (1, 0, 2))[::-1] * 255).astype(np.uint8)) \
        .save('/tmp/matball.png')
    print('saved /tmp/matball.png')
except ImportError:
    pass
