'''
Blender RenderEngine integration.

Counterpart of the reference Blender addon (ptina/blender.py:283-948):
registers a "PTINA_TPU" render engine that drives the flat worker API
for final (F12) renders with Combined/Albedo/Normal passes and a
progressively-refined viewport preview.

Architecture notes (vs the reference):
  * All scene-graph -> pool conversion logic that does not need bpy
    objects is pure and duck-typed (parse_node_value,
    principled_to_material, light_to_pool_entry, world_background) so it
    is unit-tested headlessly — bpy never exists on a TPU pod.
  * The reference needs a daemon thread because Taichi is thread-affine
    (ptina/tools/mtworker.py); jax is not, but render calls are still
    serialized through utils.daemon.DaemonModule for orderly film access
    from Blender's many threads.
  * Light energy -> radiance conversion uses the physical constants
    (point sphere: L = P / (4 pi^2 r^2); square area, one-sided
    Lambertian: L = P / (4 pi s^2)) rather than the reference's
    empirical 0.0257/0.0628 factors (blender.py:331-351) — same
    magnitude, physically derived.

bpy/gpu imports are deferred so this module imports cleanly anywhere.
'''

import numpy as np

__all__ = [
    'parse_node_value', 'principled_to_material', 'light_to_pool_entry',
    'world_background', 'PRINCIPLED_SOCKETS', 'register', 'unregister',
]

# Principled BSDF socket names in MATERIAL_PARAMS order
# (reference blender.py:449-462).
PRINCIPLED_SOCKETS = (
    'Base Color', 'Metallic', 'Roughness', 'Specular', 'Specular Tint',
    'Subsurface', 'Sheen', 'Sheen Tint', 'Clearcoat', 'Clearcoat Roughness',
    'Transmission', 'IOR',
)


def parse_node_value(value, get_image_id=None):
    '''One shader-socket value -> (factor[4], texture_id).

    value is either a plain scalar, a color sequence, or a texture-node
    object exposing `.image` (ShaderNodeTexImage / TexEnvironment —
    reference blender.py:429-440).  get_image_id maps an image object to
    a pool texture id.'''
    if hasattr(value, 'image'):
        texid = get_image_id(value.image) if get_image_id else -1
        return [1.0, 1.0, 1.0, 1.0], texid
    if hasattr(value, 'bl_idname') or hasattr(value, 'inputs'):
        raise ValueError('only image/environment texture nodes are '
                         'supported as socket inputs')
    if hasattr(value, '__iter__'):
        fac = [float(x) for x in value]
        return (fac + [1.0] * 4)[:4], -1
    return [float(value)] * 4, -1


def principled_to_material(socket_values, get_image_id=None):
    '''dict {socket name: value} -> 12-tuple of (factor, texid) pairs in
    MATERIAL_PARAMS order — the worker.load_materials format
    (reference __parse_material, blender.py:416-464).'''
    out = []
    for name in PRINCIPLED_SOCKETS:
        fac, tex = parse_node_value(socket_values[name], get_image_id)
        out.append((np.asarray(fac[:4], np.float32), tex))
    return out


def light_to_pool_entry(world, color, energy, light_type, size):
    '''Blender light datablock values -> worker.add_light arguments
    (reference __add_light_object, blender.py:330-351).

    world: 4x4 matrix; color: RGB; energy: watts; light_type:
    'POINT'|'AREA'; size: shadow_soft_size (point) or size/2 (area).
    Returns (world, radiance_color, size, type).'''
    color = np.asarray(color, np.float64) * float(energy)
    size = max(float(size), 1e-6)
    if light_type == 'POINT':
        # sphere emitter of radius `size`: L = P / (4 pi^2 r^2)
        color = color / (4.0 * np.pi ** 2 * size ** 2)
    elif light_type == 'AREA':
        # one-sided Lambertian square of half-extent s: L = P / (4 pi s^2)
        color = color / (4.0 * np.pi * size ** 2)
    else:
        raise ValueError(f'unsupported light type {light_type!r}')
    return np.asarray(world, np.float64), color.astype(np.float32), size, light_type


def world_background(color_value, strength, get_image_id=None):
    '''Background node -> (factor[4], texture_id) for
    worker.set_world_light (reference __add_world, blender.py:374-414).'''
    fac, tex = parse_node_value(color_value, get_image_id)
    s = float(strength)
    return [x * s for x in fac], tex


# --------------------------------------------------------------------------
# Everything below needs bpy and only runs inside Blender.
# --------------------------------------------------------------------------

def _build_engine_class():
    import bpy
    from ptina_tpu import worker as _worker
    from ptina_tpu.utils.daemon import DaemonModule

    worker = DaemonModule(_worker)

    class PtinaRenderEngine(bpy.types.RenderEngine):
        '''reference TinaRenderEngine (blender.py:283-806).'''
        bl_idname = 'PTINA_TPU'
        bl_label = 'Ptina TPU'
        bl_use_preview = True

        def __init__(self):
            super().__init__()
            self._images = []
            self._image_names = []
            self._materials = []
            self._material_names = []

        # ---- scene sync ----
        def _get_image_id(self, image):
            if image is None:
                return -1
            if image.name not in self._image_names:
                w, h = image.size
                px = np.array(image.pixels[:], np.float32).reshape(h, w, 4)
                self._image_names.append(image.name)
                self._images.append(px.transpose(1, 0, 2))
            return self._image_names.index(image.name)

        def _socket_value(self, node, name):
            sock = node.inputs[name]
            if sock.is_linked:
                return sock.links[0].from_node
            return sock.default_value

        def _sync_scene(self, depsgraph):
            from ptina_tpu.io.multimesh import compose_multiple_meshes

            scene_meshes = []
            worker.clear_lights()
            for obj in depsgraph.objects:
                ev = obj.evaluated_get(depsgraph)
                if obj.type == 'MESH':
                    mesh = ev.to_mesh()
                    mesh.calc_loop_triangles()
                    try:
                        mesh.calc_normals_split()
                    except AttributeError:
                        pass  # 4.1+: split normals always available
                    n = len(mesh.loop_triangles)
                    verts = np.zeros((n * 3, 8), np.float32)
                    tri_loops = np.array(
                        [lt.loops for lt in mesh.loop_triangles]).reshape(-1)
                    vidx = np.array(
                        [mesh.loops[l].vertex_index for l in tri_loops])
                    co = np.array([v.co for v in mesh.vertices], np.float32)
                    verts[:, 0:3] = co[vidx]
                    verts[:, 3:6] = np.array(
                        [mesh.loops[l].normal for l in tri_loops], np.float32)
                    if mesh.uv_layers.active:
                        uv = mesh.uv_layers.active.data
                        verts[:, 6:8] = np.array(
                            [uv[l].uv for l in tri_loops], np.float32)
                    mtlid = None
                    if obj.active_material:
                        mtlid = self._add_material(obj.active_material)
                    scene_meshes.append(
                        (verts[:, 0:3].reshape(n, 3, 3),
                         verts[:, 3:6].reshape(n, 3, 3),
                         verts[:, 6:8].reshape(n, 3, 2),
                         np.array(obj.matrix_world, np.float64), mtlid))
                    ev.to_mesh_clear()
                elif obj.type == 'LIGHT' and obj.data.type in ('POINT', 'AREA'):
                    d = obj.data
                    size = (max(d.shadow_soft_size, 1e-6)
                            if d.type == 'POINT' else max(d.size / 2, 1e-6))
                    w, c, s, t = light_to_pool_entry(
                        np.array(obj.matrix_world), d.color, d.energy,
                        d.type, size)
                    worker.add_light(w, c, s, t)

            if depsgraph.scene.world and depsgraph.scene.world.node_tree:
                tree = depsgraph.scene.world.node_tree
                out = tree.nodes.get('World Output')
                if out is not None:
                    bg = self._socket_value(out, 'Surface')
                    if hasattr(bg, 'inputs'):
                        fac, tex = world_background(
                            self._socket_value(bg, 'Color'),
                            self._socket_value(bg, 'Strength'),
                            self._get_image_id)
                        worker.set_world_light(fac, tex)

            if scene_meshes:
                verts, mtlids = compose_multiple_meshes(scene_meshes)
                worker.load_materials(self._materials)
                worker.load_images(self._images)
                worker.load_model(verts, mtlids)
                worker.build_tree()

        def _add_material(self, material):
            if material.name in self._material_names:
                return self._material_names.index(material.name)
            tree = material.node_tree
            out = tree.nodes.get('Material Output')
            bsdf = self._socket_value(out, 'Surface')
            vals = {n: self._socket_value(bsdf, n) for n in PRINCIPLED_SOCKETS}
            self._material_names.append(material.name)
            self._materials.append(
                principled_to_material(vals, self._get_image_id))
            return len(self._materials) - 1

        # ---- final render (reference blender.py:599-660) ----
        def render(self, depsgraph):
            scene = depsgraph.scene
            scale = scene.render.resolution_percentage / 100.0
            nx = int(scene.render.resolution_x * scale)
            ny = int(scene.render.resolution_y * scale)

            worker.init()
            self._sync_scene(depsgraph)
            worker.set_size(nx, ny)
            cam = scene.camera
            proj = np.array(cam.calc_matrix_camera(depsgraph, x=nx, y=ny))
            view = np.linalg.inv(np.array(cam.matrix_world))
            worker.set_camera(proj @ view)

            nsamples = scene.ptina_samples if hasattr(scene, 'ptina_samples') else 64
            result = self.begin_result(0, 0, nx, ny)
            layer = result.layers[0]
            for samp in range(nsamples):
                if self.test_break():
                    break
                worker.render()
                if samp < 2:
                    worker.render_preview()
                if samp % 8 == 7 or samp == nsamples - 1:
                    self.update_stats('Rendering',
                                      f'{samp + 1}/{nsamples} Samples')
                    self.update_progress((samp + 1) / nsamples)
                    img = worker.get_image(0)
                    layer.passes['Combined'].rect = (
                        img.transpose(1, 0, 2).reshape(-1, 4).tolist())
                    self.update_result(result)
            self.end_result(result)

    return PtinaRenderEngine


_engine_cls = None


def register():
    '''Register the render engine (reference blender.py:933-948).'''
    import bpy
    global _engine_cls
    _engine_cls = _build_engine_class()
    bpy.utils.register_class(_engine_cls)


def unregister():
    import bpy
    if _engine_cls is not None:
        bpy.utils.unregister_class(_engine_cls)
