'''
OBJ loading demo (reference exams/objloader.py): generate a small OBJ on
the fly, load it through the worker API's OBJ path and render it with
the default material + default point light.
'''

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ptina_tpu import worker
from ptina_tpu.io.matrix import perspective, lookat


OBJ = '''
v -1 0 -1
v 1 0 -1
v 1 0 1
v -1 0 1
v 0 1.4 0
f 1 2 3 4
f 1 2 5
f 2 3 5
f 3 4 5
f 4 1 5
'''


def main():
    with tempfile.NamedTemporaryFile('w', suffix='.obj', delete=False) as fp:
        fp.write(OBJ)
        path = fp.name

    worker.init()
    worker.load_model(path)  # str -> readobj -> obj_to_vertices
    worker.build_tree()
    worker.set_size(256, 256)
    worker.set_camera(perspective(60, 1) @ lookat(pos=(0, 0.5, 0),
                                                  back=(2.0, 1.5, 2.5)))
    for _ in range(16):
        worker.render()
    img = worker.get_image()
    print('pyramid render: mean', float(img[..., :3].mean()),
          'max', float(img[..., :3].max()))
    os.unlink(path)


if __name__ == '__main__':
    main()
