'''
Procedural benchmark scenes.

The reference benchmarks against GLTF assets that are not shipped in its
repo (exams/benchmark.py:12 loads assets/monkey_cornell.gltf; see
BASELINE.md).  These builders reconstruct equivalent scenes from
primitives with matching triangle counts: cornell two-boxes = 34 tris,
cornell "monkey-class" = 978 tris (a UV sphere stands in for Suzanne —
same count, same BVH/traversal stress).  The fixed benchmark camera
matrix is the one recorded at reference exams/benchmark.py:18-23.
'''

import numpy as np

from ptina_tpu.scene import make_scene, LIGHT_AREA, LIGHT_POINT

__all__ = ['BENCH_CAMERA', 'cornell_box', 'cornell_monkey',
           'cornell_highpoly', 'matball', 'envlight_scene',
           'cornell_box_vertices']

# reference exams/benchmark.py:18-23
BENCH_CAMERA = np.array([
    [1.73205081e+00, 0.00000000e+00, 0.00000000e+00, 1.01348227e-02],
    [0.00000000e+00, 1.73205081e+00, -1.73205081e-05, -3.36860025e+00],
    [0.00000000e+00, -1.00020002e-05, -1.00020002e+00, 5.27350023e+00],
    [0.00000000e+00, -1.00000000e-05, -1.00000000e+00, 5.37243564e+00],
])


def _quad(a, b, c, d):
    '''Two triangles for quad a-b-c-d (counter-clockwise).'''
    return [[a, b, c], [a, c, d]]


def _mesh_to_vertices(tris, normals=None, uvs=None):
    '''tris: [F, 3, 3] positions -> [F*3, 8] vertex array with flat
    normals unless smooth normals are given.'''
    tris = np.asarray(tris, np.float32)
    f = tris.shape[0]
    if normals is None:
        n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        normals = np.repeat(n[:, None, :], 3, axis=1)
    if uvs is None:
        uvs = np.zeros((f, 3, 2), np.float32)
    return np.concatenate([tris.reshape(f * 3, 3),
                           np.asarray(normals, np.float32).reshape(f * 3, 3),
                           np.asarray(uvs, np.float32).reshape(f * 3, 2)],
                          axis=1)


def _box_tris(center, size, yaw=0.0):
    '''12 triangles of an axis-aligned box rotated by yaw around +y.'''
    cx, cy, cz = center
    sx, sy, sz = size
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    corners = np.array([[x, y, z]
                        for x in (-sx, sx) for y in (-sy, sy) for z in (-sz, sz)])
    corners = corners @ rot.T + np.array(center)
    # index pattern: bit2 = x, bit1 = y, bit0 = z
    quads = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    tris = []
    for a, b, c_, d in quads:
        tris += _quad(corners[a], corners[b], corners[c_], corners[d])
    return np.asarray(tris, np.float32)


def _cornell_shell():
    '''5 walls (10 tris) + material ids (0 white, 1 red, 2 green).'''
    x0, x1 = -2.0, 2.0
    y0, y1 = 0.0, 4.0
    z0, z1 = -2.0, 2.0
    tris, mtl = [], []

    def wall(quad, m):
        tris.extend(quad)
        mtl.extend([m, m])

    wall(_quad([x0, y0, z1], [x1, y0, z1], [x1, y0, z0], [x0, y0, z0]), 0)  # floor
    wall(_quad([x0, y1, z0], [x1, y1, z0], [x1, y1, z1], [x0, y1, z1]), 0)  # ceiling
    wall(_quad([x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0]), 0)  # back
    wall(_quad([x0, y0, z1], [x0, y0, z0], [x0, y1, z0], [x0, y1, z1]), 1)  # left red
    wall(_quad([x1, y0, z0], [x1, y0, z1], [x1, y1, z1], [x1, y1, z0]), 2)  # right green
    return np.asarray(tris, np.float32), mtl


_CORNELL_MATERIALS_SPEC = [
    # (basecolor, roughness) rows in MATERIAL_PARAMS order are filled by
    # _materials() below
    ((0.725, 0.71, 0.68), 0.8),   # white
    ((0.63, 0.065, 0.05), 0.8),   # red
    ((0.14, 0.45, 0.091), 0.8),   # green
    ((0.85, 0.85, 0.85), 0.15),   # glossy (boxes / blob)
]


def _materials():
    mats = []
    for base, rough in _CORNELL_MATERIALS_SPEC:
        mat = [
            (np.asarray(base, np.float32), -1),  # basecolor
            (0.0, -1),   # metallic
            (rough, -1),  # roughness
            (0.5, -1),   # specular
            (0.4, -1),   # specularTint
            (0.0, -1),   # subsurface
            (0.0, -1),   # sheen
            (0.4, -1),   # sheenTint
            (0.0, -1),   # clearcoat
            (0.5, -1),   # clearcoatGloss
            (0.0, -1),   # transmission
            (1.45, -1),  # ior
        ]
        mats.append(mat)
    return mats


def _ceiling_light(size=0.8, power=12.0):
    # The axes matrix must be RIGHT-handed with col2 = the pool's
    # sampling normal: LightPool.hit() sees an area light from the side
    # where ray.d . (col0 x col1) > 0 (reference Area.intersect,
    # ptina/geometries.py:63-65) while sample() weights by
    # dot(col2, dir-to-light) (light/__init__.py:115-117) — a
    # left-handed axes makes the two queries disagree about which side
    # emits (caught by tests/test_parity.py's brute-vs-path check).
    # col2 = +y with x cross y' = +y means y' = -z.
    axes = np.stack([np.array([1.0, 0.0, 0.0]),
                     np.array([0.0, 0.0, -1.0]),
                     np.array([0.0, 1.0, 0.0])], axis=1)
    return dict(color=(power, power, power), pos=(0.0, 3.98, 0.0),
                size=size, type=LIGHT_AREA, axes=axes)


def _shell_uvs(ntris):
    '''Planar per-quad UVs for the cornell shell: each wall quad maps to
    the full [0,1]^2 (corner order a-b-c / a-c-d of _quad).'''
    tri_a = np.asarray([[0, 0], [1, 0], [1, 1]], np.float32)
    tri_b = np.asarray([[0, 0], [1, 1], [0, 1]], np.float32)
    return np.tile(np.stack([tri_a, tri_b]), (ntris // 2, 1, 1))


def cornell_box(textured_image=None, **kw):
    '''Cornell two-boxes, 34 triangles (reference README.md:42-44 scene).
    textured_image: optional numpy image bound as material 0's basecolor
    texture (the white walls/boxes), with planar wall UVs — the
    benchmark's "textures on the default path" configuration
    (reference ptina/mtllib.py:30-38).'''
    shell, mtl = _cornell_shell()
    tall = _box_tris((-0.75, 1.2, -0.6), (0.6, 1.2, 0.6), yaw=np.radians(18))
    short = _box_tris((0.75, 0.6, 0.7), (0.6, 0.6, 0.6), yaw=np.radians(-17))
    mtlids = np.asarray(mtl + [0] * 12 + [0] * 12, np.int32)
    mats = _materials()
    if textured_image is not None:
        kw.setdefault('images', [textured_image])
        mats[0][0] = (mats[0][0][0], 0)  # basecolor fac * texture 0
        shell_uv = _shell_uvs(shell.shape[0])
        verts = np.concatenate([
            _mesh_to_vertices(shell, uvs=shell_uv),
            _mesh_to_vertices(tall),
            _mesh_to_vertices(short),
        ])
    else:
        verts = _mesh_to_vertices(np.concatenate([shell, tall, short]))
    kw.setdefault('cam_pers', BENCH_CAMERA)
    kw.setdefault('lights', [_ceiling_light()])
    kw.setdefault('world_fac', (0.05, 0.05, 0.05, 1.0))
    return make_scene(verts, mtlids, materials=mats, **kw)


def cornell_box_vertices():
    '''The cornell-two-boxes geometry in worker-API form:
    (vertices [F*3, 8], mtlids [F], materials list) — for
    worker.load_model / load_materials consumers.'''
    shell, mtl = _cornell_shell()
    tall = _box_tris((-0.75, 1.2, -0.6), (0.6, 1.2, 0.6), yaw=np.radians(18))
    short = _box_tris((0.75, 0.6, 0.7), (0.6, 0.6, 0.6), yaw=np.radians(-17))
    tris = np.concatenate([shell, tall, short])
    mtlids = np.asarray(mtl + [0] * 12 + [0] * 12, np.int32)
    return _mesh_to_vertices(tris), mtlids, _materials()


def _uv_sphere(center, radius, nu=59, nv=9):
    '''UV sphere with nu segments and nv latitude bands:
    2*nu caps + 2*nu*(nv-2) quadded tris = 944 tris at (59, 9).'''
    cx, cy, cz = center

    def point(iu, iv):
        theta = np.pi * iv / nv
        phi = 2 * np.pi * iu / nu
        return np.array([cx + radius * np.sin(theta) * np.cos(phi),
                         cy + radius * np.cos(theta),
                         cz + radius * np.sin(theta) * np.sin(phi)])

    tris = []
    for iu in range(nu):
        iu1 = (iu + 1) % nu
        tris.append([point(iu, 1), point(iu1, 1), point(0, 0)])  # top cap
        for iv in range(1, nv - 1):
            a, b = point(iu, iv), point(iu1, iv)
            c, d = point(iu1, iv + 1), point(iu, iv + 1)
            tris += [[a, b, c], [a, c, d]]
        tris.append([point(iu1, nv - 1), point(iu, nv - 1), point(0, nv)])  # bottom
    return np.asarray(tris, np.float32)


def _sphere_smooth_normals(tris, center):
    n = tris - np.asarray(center)[None, None, :]
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n


def cornell_monkey(**kw):
    '''Cornell + a 944-tri smooth blob = 978 triangles, the same count and
    traversal depth class as the reference monkey_cornell scene
    (reference README.md:48-51).'''
    shell, mtl = _cornell_shell()
    blob = _uv_sphere((0.0, 1.3, 0.2), 1.0)
    tall = _box_tris((-1.2, 0.45, -0.9), (0.45, 0.45, 0.45), yaw=np.radians(20))
    verts = np.concatenate([
        _mesh_to_vertices(shell),
        _mesh_to_vertices(blob, normals=_sphere_smooth_normals(blob, (0.0, 1.3, 0.2))),
        _mesh_to_vertices(tall),
    ])
    mtlids = np.asarray(mtl + [3] * blob.shape[0] + [0] * 12, np.int32)
    kw.setdefault('cam_pers', BENCH_CAMERA)
    kw.setdefault('lights', [_ceiling_light()])
    kw.setdefault('world_fac', (0.05, 0.05, 0.05, 1.0))
    return make_scene(verts, mtlids, materials=_materials(), **kw)


def cornell_highpoly(nu=320, nv=160, **kw):
    '''Cornell + a ~101k-triangle smooth sphere: the big-scene
    configuration that exercises the blocked two-level cast
    (intersect/blocked.py).  The reference handles this class of scene
    through its LBVH (capacity 2^21 faces, ptina/things.py:13); the
    dense single-pass kernels top out at 8192 faces, so this scene
    auto-routes to accel='blocked' with Morton-ordered face blocks.'''
    shell, mtl = _cornell_shell()
    blob = _uv_sphere((0.0, 1.3, 0.2), 1.0, nu=nu, nv=nv)
    tall = _box_tris((-1.2, 0.45, -0.9), (0.45, 0.45, 0.45),
                     yaw=np.radians(20))
    verts = np.concatenate([
        _mesh_to_vertices(shell),
        _mesh_to_vertices(blob, normals=_sphere_smooth_normals(
            blob, (0.0, 1.3, 0.2))),
        _mesh_to_vertices(tall),
    ])
    mtlids = np.asarray(mtl + [3] * blob.shape[0] + [0] * 12, np.int32)
    kw.setdefault('cam_pers', BENCH_CAMERA)
    kw.setdefault('lights', [_ceiling_light()])
    kw.setdefault('world_fac', (0.05, 0.05, 0.05, 1.0))
    return make_scene(verts, mtlids, materials=_materials(), **kw)


def envlight_scene(env_res=(64, 128), **kw):
    '''Environment-light scene with full MIS (BASELINE.json config 4):
    a glossy sphere + ground under a procedural equirect sky texture
    (world_tex), plus a small area light so BOTH MIS strategies (light
    sampling and BSDF sampling against the env) carry weight.  Sobol QMC
    is the default sampler (sampling/sobol.py).'''
    h, w = env_res
    # simple sky gradient with a bright "sun" blob, equirect [h, w, 3]
    ty = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    tx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    sky = np.stack([0.3 + 0.4 * ty + 0.0 * tx,
                    0.45 + 0.3 * ty + 0.0 * tx,
                    0.7 + 0.25 * ty + 0.0 * tx], axis=-1)
    sun = np.exp(-(((ty - 0.7) / 0.08) ** 2 + ((tx - 0.25) / 0.05) ** 2))
    env = (sky + 18.0 * sun[..., None]).astype(np.float32)

    ground = np.asarray(_quad([-6, 0, 6], [6, 0, 6], [6, 0, -6],
                              [-6, 0, -6]), np.float32)
    ball = _uv_sphere((0.0, 1.0, 0.0), 1.0, nu=48, nv=24)
    verts = np.concatenate([
        _mesh_to_vertices(ground),
        _mesh_to_vertices(ball,
                          normals=_sphere_smooth_normals(ball, (0, 1.0, 0))),
    ])
    mtlids = np.asarray([0, 0] + [3] * ball.shape[0], np.int32)
    kw.setdefault('images', [env])
    kw.setdefault('world_tex', 0)
    kw.setdefault('world_fac', (1.0, 1.0, 1.0, 1.0))
    kw.setdefault('lights', [dict(color=(24, 20, 14), pos=(2.0, 3.0, 2.0),
                                  size=0.4, type=LIGHT_POINT)])
    return make_scene(verts, mtlids, materials=_materials(), **kw)


def _sphere_uvs(tris, center):
    '''Equirect per-corner UVs from sphere directions (texture-lookup
    parameterization for the matball; seam triangles wrap, which is
    fine for test/benchmark purposes).'''
    d = tris - np.asarray(center)[None, None, :]
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    u = 0.5 + np.arctan2(d[..., 2], d[..., 0]) / (2 * np.pi)
    v = 0.5 - np.arcsin(np.clip(d[..., 1], -1, 1)) / np.pi
    return np.stack([u, v], axis=-1).astype(np.float32)


def matball(roughness_tex=None, **kw):
    '''Material-preview ball on a ground plane (reference exams/matball.py
    spirit): a sphere with a full Disney material, optionally driven by a
    texture (bound to roughness, with spherical UVs), lit by the default
    point light + environment.'''
    ground = np.asarray(_quad([-6, 0, 6], [6, 0, 6], [6, 0, -6], [-6, 0, -6]),
                        np.float32)
    ball = _uv_sphere((0.0, 1.0, 0.0), 1.0, nu=48, nv=24)
    uvs = None
    images = None
    mats = _materials()
    if roughness_tex is not None:
        images = [roughness_tex]
        mats[3][2] = (1.0, 0)  # roughness from texture 0
        uvs = _sphere_uvs(ball, (0.0, 1.0, 0.0))
    verts = np.concatenate([
        _mesh_to_vertices(ground),
        _mesh_to_vertices(ball, normals=_sphere_smooth_normals(ball, (0.0, 1.0, 0.0)),
                          uvs=uvs),
    ])
    mtlids = np.asarray([0, 0] + [3] * ball.shape[0], np.int32)
    kw.setdefault('world_fac', (0.3, 0.3, 0.35, 1.0))
    kw.setdefault('images', images)
    return make_scene(verts, mtlids, materials=mats, **kw)
