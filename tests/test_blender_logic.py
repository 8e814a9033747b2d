'''Pure-logic parts of the Blender integration (no bpy needed).'''

import numpy as np
import pytest

from ptina_tpu.blender import (
    parse_node_value, principled_to_material, light_to_pool_entry,
    world_background, classify_updates, PRINCIPLED_SOCKETS, RENDER_PASSES,
    ViewportRefiner,
)


class FakeTexNode:
    def __init__(self, image):
        self.image = image


def test_parse_node_value_scalar_color_texture():
    fac, tex = parse_node_value(0.5)
    assert fac == [0.5] * 4 and tex == -1
    fac, tex = parse_node_value((0.1, 0.2, 0.3, 1.0))
    assert fac == [0.1, 0.2, 0.3, 1.0] and tex == -1
    fac, tex = parse_node_value(FakeTexNode('img'), get_image_id=lambda im: 7)
    assert fac == [1.0] * 4 and tex == 7


def test_parse_node_value_rejects_other_nodes():
    class FakeShaderNode:
        bl_idname = 'ShaderNodeMixRGB'
    with pytest.raises(ValueError):
        parse_node_value(FakeShaderNode())


def test_principled_to_material_layout():
    vals = {name: 0.5 for name in PRINCIPLED_SOCKETS}
    vals['Base Color'] = (0.8, 0.6, 0.4, 1.0)
    mat = principled_to_material(vals)
    assert len(mat) == 12
    base_fac, base_tex = mat[0]
    assert np.allclose(base_fac, [0.8, 0.6, 0.4, 1.0]) and base_tex == -1
    rough_fac, _ = mat[2]
    assert np.allclose(rough_fac, 0.5)


def test_light_energy_to_radiance():
    world = np.eye(4)
    # point: L = P / (4 pi^2 r^2)
    _, c, s, t = light_to_pool_entry(world, (1, 1, 1), 100.0, 'POINT', 0.5)
    assert t == 'POINT' and s == 0.5
    assert np.allclose(c, 100.0 / (4 * np.pi ** 2 * 0.25), rtol=1e-6)
    # area: L = P / (4 pi s^2)
    _, c, s, t = light_to_pool_entry(world, (1, 0.5, 1), 40.0, 'AREA', 1.0)
    assert np.allclose(c[1], 0.5 * 40.0 / (4 * np.pi), rtol=1e-6)
    with pytest.raises(ValueError):
        light_to_pool_entry(world, (1, 1, 1), 1.0, 'SUN', 1.0)


def test_world_background_strength():
    fac, tex = world_background((0.2, 0.4, 0.6, 1.0), 2.0)
    assert np.allclose(fac, [0.4, 0.8, 1.2, 2.0]) and tex == -1
    fac, tex = world_background(FakeTexNode('env'), 3.0,
                                get_image_id=lambda im: 2)
    assert np.allclose(fac, [3.0] * 4) and tex == 2


def test_render_pass_ids_match_film_layout():
    from ptina_tpu.film import PASS_COMBINED, PASS_ALBEDO, PASS_NORMAL
    names = [p[0] for p in RENDER_PASSES]
    assert names[PASS_COMBINED] == 'Combined'
    assert names[PASS_ALBEDO] == 'Albedo'
    assert names[PASS_NORMAL] == 'Normal'


def test_viewport_refiner_ladder():
    '''Reproduces the reference my_draw resolution ladder
    (ptina/blender.py:713-784): start at 1/start_pixel_size resolution,
    double until full size, then accumulate up to max_samples.'''
    r = ViewportRefiner(start_pixel_size=4, pixel_scale=1, max_samples=3)
    cam = b'cam0'
    widths = []
    acts = []
    while True:
        a = r.next_action((256, 128), cam)
        if a is None:
            break
        acts.append(a)
        widths.append(a['width'])
    # ladder 1/4 -> 1/2 -> full, then (max_samples) full-res accumulations
    assert widths[:3] == [64, 128, 256]
    assert all(w == 256 for w in widths[2:])
    # ladder passes clear the film; the accumulation steps do not
    assert acts[0]['clear'] and acts[1]['clear'] and acts[2]['clear']
    assert not acts[3]['clear'] and not acts[-1]['clear']
    assert len(widths) == 2 + 3  # 2 coarse steps + max_samples full steps


def test_viewport_refiner_resets_on_camera_change():
    r = ViewportRefiner(start_pixel_size=8, max_samples=2)
    a = r.next_action((64, 64), b'cam0')
    assert a['width'] == 8
    r.next_action((64, 64), b'cam0')
    a = r.next_action((64, 64), b'cam1')  # orbit -> restart coarse
    assert a['width'] == 8 and a['clear']
    a = r.next_action((64, 64), b'cam1', is_preview=True)  # mode change
    assert a['width'] == 8 and a['pass_id'] == 1


def test_viewport_refiner_finishes():
    r = ViewportRefiner(start_pixel_size=1, max_samples=2)
    assert r.next_action((32, 32), b'c') is not None
    assert r.next_action((32, 32), b'c') is not None
    assert r.next_action((32, 32), b'c') is None  # converged, no rerender


def test_classify_updates():
    plan = classify_updates(
        [('MATERIAL', 'red'), ('OBJECT_MESH', 'Cube'),
         ('OBJECT_LIGHT', 'Lamp'), ('SCENE', 'Scene'), ('WORLD', 'World')],
        {'Cube', 'Lamp'})
    assert plan['materials'] == ['red']
    assert plan['meshes'] == ['Cube']
    assert plan['lights'] == ['Lamp']
    assert plan['world'] and plan['prune']
    plan = classify_updates([], set())
    assert plan == {'materials': [], 'world': False, 'meshes': [],
                    'lights': [], 'prune': False}
