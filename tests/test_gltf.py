import base64
import json
import os
import struct
import tempfile

import numpy as np

from ptina_tpu.io.readgltf import readgltf


def _tri_gltf(binary=False):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.asarray([[0, 0, 1]] * 3, np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    blob = pos.tobytes() + nrm.tobytes() + idx.tobytes()
    model = {
        'asset': {'version': '2.0'},
        'scene': 0,
        'scenes': [{'nodes': [0]}],
        'nodes': [{'mesh': 0, 'translation': [1.0, 2.0, 3.0]}],
        'meshes': [{'primitives': [{
            'attributes': {'POSITION': 0, 'NORMAL': 1},
            'indices': 2, 'material': 0}]}],
        'materials': [{'pbrMetallicRoughness': {
            'baseColorFactor': [0.5, 0.25, 0.125, 1.0],
            'metallicFactor': 0.25, 'roughnessFactor': 0.75}}],
        'accessors': [
            {'bufferView': 0, 'componentType': 0x1406, 'count': 3, 'type': 'VEC3'},
            {'bufferView': 1, 'componentType': 0x1406, 'count': 3, 'type': 'VEC3'},
            {'bufferView': 2, 'componentType': 0x1403, 'count': 3, 'type': 'SCALAR'},
        ],
        'bufferViews': [
            {'buffer': 0, 'byteOffset': 0, 'byteLength': 36},
            {'buffer': 0, 'byteOffset': 36, 'byteLength': 36},
            {'buffer': 0, 'byteOffset': 72, 'byteLength': 6},
        ],
        'buffers': [{'byteLength': len(blob)}],
    }
    if binary:
        js = json.dumps(model).encode()
        js += b' ' * (-len(js) % 4)
        blob_p = blob + b'\0' * (-len(blob) % 4)
        body = (struct.pack('<III', 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(blob_p))
                + struct.pack('<II', len(js), 0x4E4F534A) + js
                + struct.pack('<II', len(blob_p), 0x004E4942) + blob_p)
        return body, model
    model['buffers'][0]['uri'] = ('data:application/octet-stream;base64,'
                                  + base64.b64encode(blob).decode())
    return json.dumps(model).encode(), model


def test_readgltf_json():
    data, _ = _tri_gltf()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 's.gltf')
        with open(p, 'wb') as f:
            f.write(data)
        vertices, mtlids, materials, images = readgltf(p)
    assert vertices.shape == (3, 8)
    assert (mtlids == 0).all()
    # node translation baked into positions
    assert np.allclose(vertices[0, :3], [1, 2, 3], atol=1e-6)
    assert np.allclose(vertices[1, :3], [2, 2, 3], atol=1e-6)
    assert np.allclose(vertices[:, 3:6], [[0, 0, 1]] * 3, atol=1e-6)
    (b, bt), (m, mt), (r, rt) = materials[0]
    assert np.allclose(b, [0.5, 0.25, 0.125, 1.0])
    assert bt == -1 and m == 0.25 and r == 0.75


def test_readgltf_glb():
    data, _ = _tri_gltf(binary=True)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 's.glb')
        with open(p, 'wb') as f:
            f.write(data)
        vertices, mtlids, materials, images = readgltf(p)
    assert vertices.shape == (3, 8)
    assert np.allclose(vertices[0, :3], [1, 2, 3], atol=1e-6)
