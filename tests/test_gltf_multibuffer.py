"""Multi-mesh + multi-buffer .gltf loading (capability extension).

The reference asserts exactly 1 mesh / 1 buffer (gltf_model_reader.rs:62-63);
tpurt keeps that under strict=True and lifts it under strict=False: all
meshes' primitives are merged and every buffer is loaded into one
concatenated blob with per-buffer base offsets.
"""
import base64
import json

import numpy as np
import pytest

from tpurt.scene import GltfModelReader, MeshAttributeType


def _data_uri(arr: np.ndarray) -> str:
    return ("data:application/octet-stream;base64,"
            + base64.b64encode(arr.tobytes()).decode())


def _tri_mesh_doc():
    """Two triangle meshes, each with its own buffer (positions+indices)."""
    pos0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    pos1 = np.array([[5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)

    def buf(pos):
        blob = pos.tobytes() + idx.tobytes()
        return {"uri": _data_uri(np.frombuffer(blob, np.uint8)),
                "byteLength": len(blob)}

    doc = {
        "asset": {"version": "2.0"},
        "buffers": [buf(pos0), buf(pos1)],
        "bufferViews": [
            # buffer 0: positions, indices
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
            # buffer 1: positions, indices
            {"buffer": 1, "byteOffset": 0, "byteLength": 36},
            {"buffer": 1, "byteOffset": 36, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 3, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]},
            {"primitives": [{"attributes": {"POSITION": 2}, "indices": 3}]},
        ],
    }
    return doc, pos0, pos1


def test_multibuffer_multimesh(tmp_path):
    doc, pos0, pos1 = _tri_mesh_doc()
    path = tmp_path / "two.gltf"
    path.write_text(json.dumps(doc))

    model = GltfModelReader.open(str(path), strict=False)
    prims = model.primitive_arrays()
    assert len(prims) == 2
    np.testing.assert_array_equal(prims[0]["positions"], pos0)
    np.testing.assert_array_equal(prims[1]["positions"], pos1)
    np.testing.assert_array_equal(prims[0]["indices"], [[0, 1, 2]])
    np.testing.assert_array_equal(prims[1]["indices"], [[0, 1, 2]])


def test_strict_rejects_multibuffer(tmp_path):
    doc, _, _ = _tri_mesh_doc()
    path = tmp_path / "two.gltf"
    path.write_text(json.dumps(doc))
    with pytest.raises(AssertionError):
        GltfModelReader.open(str(path), strict=True)


def test_bounding_sphere_spans_both_meshes(tmp_path):
    doc, pos0, pos1 = _tri_mesh_doc()
    path = tmp_path / "two.gltf"
    path.write_text(json.dumps(doc))
    model = GltfModelReader.open(str(path), strict=False)
    sphere = model.get_primitives_bounding_sphere()
    allp = np.concatenate([pos0, pos1])
    d = np.linalg.norm(allp - np.asarray(sphere.center), axis=1)
    assert float(d.max()) <= sphere.radius + 1e-4
