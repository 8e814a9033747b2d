import numpy as np

from ptina_tpu import worker
from ptina_tpu.scenes import cornell_box


def _cornell_vertices():
    from ptina_tpu.scenes import _cornell_shell, _mesh_to_vertices
    shell, mtl = _cornell_shell()
    return _mesh_to_vertices(shell), np.asarray(mtl, np.int32)


def test_worker_full_flow():
    worker.init()
    worker.set_size(16, 16)
    verts, mtlids = _cornell_vertices()
    worker.load_model(verts, mtlids)
    worker.load_materials([])
    worker.load_images([])
    worker.build_tree()
    worker.render()
    worker.render()
    img = worker.get_image()
    assert img.shape == (16, 16, 4)
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0.01

    worker.render_preview()
    albedo = worker.get_image(1)
    assert np.isfinite(albedo).all()

    out = np.zeros(16 * 16 * 3, np.float32)
    worker.fast_export_image(out)
    assert out.max() > 0

    worker.clear()
    img2 = worker.get_image()
    assert (img2[..., 3] == 0).all()  # cleared film is empty (debug pink)


def test_worker_lights_and_camera():
    worker.init()
    worker.set_size(8, 8)
    verts, mtlids = _cornell_vertices()
    worker.load_model(verts, mtlids)
    worker.clear_lights()
    world = np.eye(4)
    world[:3, 3] = [0, 3.9, 0]
    worker.add_light(world, color=(10, 10, 10), size=0.8, type='AREA')
    worker.set_world_light((0.2, 0.2, 0.2, 1.0), -1)
    from ptina_tpu.scenes import BENCH_CAMERA
    worker.set_camera(BENCH_CAMERA)
    worker.render()
    img = worker.get_image()
    assert np.isfinite(img).all()


def test_worker_mlt_engine():
    worker.init(engine='mlt')
    worker.set_size(8, 8)
    verts, mtlids = _cornell_vertices()
    worker.load_model(verts, mtlids)
    worker.render()
    img = worker.get_image()
    assert np.isfinite(img).all()
