"""Mesh metadata helpers: bitflag enumeration (model_reader.rs:148-175),
copy-info sizing, alignment, bounding-sphere transform."""
import numpy as np

from tpurt.scene.mesh import (
    MeshAttributeType,
    ModelCopyInfo,
    PrimitiveCopyInfo,
    Sphere,
    TextureType,
    align_offset,
    bitflag_list,
)


def test_bitflag_enumeration_order():
    flags = (MeshAttributeType.VERTICES | MeshAttributeType.NORMALS
             | MeshAttributeType.INDICES)
    out = bitflag_list(MeshAttributeType, flags)
    assert out == [MeshAttributeType.VERTICES, MeshAttributeType.NORMALS,
                   MeshAttributeType.INDICES]
    assert bitflag_list(TextureType, TextureType.ORM | TextureType.ALBEDO) == [
        TextureType.ALBEDO, TextureType.ORM]
    assert bitflag_list(MeshAttributeType, MeshAttributeType(0)) == []


def test_align_offset():
    assert align_offset(0, 12) == 0
    assert align_offset(1, 12) == 12
    assert align_offset(12, 12) == 12
    assert align_offset(13, 4) == 16


def test_copy_info_sizes():
    info = ModelCopyInfo([
        PrimitiveCopyInfo(mesh_size=100, indices_size=20, image_size=8),
        PrimitiveCopyInfo(mesh_size=50, indices_size=10, image_size=0),
    ])
    assert info.compute_total_size() == 188
    # aligned mesh+indices: 12-byte alignment between primitives
    assert info.compute_aligned_mesh_and_indices_size() == 120 + 60


def test_sphere_transform_max_column_scale():
    s = Sphere(center=np.array([1.0, 0, 0], np.float32), radius=2.0)
    m = np.array([[3.0, 0, 0, 1.0],
                  [0, 1.0, 0, 0.0],
                  [0, 0, 1.0, 0.0]], np.float32)
    t = s.transform(m)
    np.testing.assert_allclose(t.center, [4.0, 0, 0])
    assert abs(t.radius - 6.0) < 1e-6  # max column norm = 3

    assert s.distance_from_point([5.0, 0, 0]) == 2.0


def test_image_metrics():
    from tpurt.utils.image_metrics import diff_report, psnr, rmse

    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy()
    assert rmse(a, b) == 0.0 and psnr(a, b) == float("inf")
    b[0, 0, 0] = 255
    r = rmse(a, b)
    assert abs(r - np.sqrt(1.0 / (8 * 8 * 3))) < 1e-6
    rep = diff_report(a, b)
    assert 0 < rep["mismatch_frac"] < 0.01
