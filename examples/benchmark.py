'''Reference-style benchmark (reference exams/benchmark.py): cornell
monkey-class scene, 512x512, warmup, then 32 timed samples.'''
import time

import numpy as np

from ptina_tpu.scenes import cornell_monkey
from ptina_tpu.film import new_film, film_to_image
from ptina_tpu.engine.path import render

scene = cornell_monkey()
film = new_film(512, 512)

film = render(scene, film, 0, spp=1)
np.asarray(film_to_image(film))
film = new_film(512, 512)

t0 = time.time()
nsamples = 32
film = render(scene, film, 0, spp=nsamples)
film.block_until_ready()
img = np.asarray(film_to_image(film))
title = f'{nsamples / (time.time() - t0):.03f} sps'
print(title)
