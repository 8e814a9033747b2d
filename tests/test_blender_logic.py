'''Pure-logic parts of the Blender integration (no bpy needed).'''

import numpy as np
import pytest

from ptina_tpu.blender import (
    parse_node_value, principled_to_material, light_to_pool_entry,
    world_background, PRINCIPLED_SOCKETS,
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
