"""Multi-chip sharding: an 8-virtual-device CPU mesh must reproduce the
single-device frame bit-exactly (replicated scene, band-sharded rays,
ICI all-gather for the post passes)."""
import jax
import numpy as np

from tpurt.dist import make_mesh, render_frame_sharded
from tpurt.passes.gtao import gtao_constants

from test_frame import make_renderer


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    r = make_renderer()
    single = np.asarray(r.render()["image"])

    # fresh renderer state so noise_index matches frame 0
    r2 = make_renderer()
    cfg = r2.config
    cam = r2.camera.uniform()
    consts = gtao_constants(cfg.width, cfg.height, r2.camera.znear,
                            r2.camera.zfar, r2.camera.fovy, r2.camera.aspect)
    mesh = make_mesh(8)
    out = render_frame_sharded(
        r2.scene.as_pytree(), cam, r2.lights.shader_arrays(), consts,
        r2._lpm_derived, np.int32(0),
        width=cfg.width, height=cfg.height, gtao_settings=cfg.gtao, mesh=mesh)
    sharded = np.asarray(out)

    np.testing.assert_array_equal(single, sharded)


def test_renderer_mesh_api():
    """RendererConfig.mesh routes frames through the sharded path."""
    r = make_renderer()
    single = np.asarray(r.render()["image"])

    r2 = make_renderer()
    r2.config.mesh = make_mesh(8)
    out = r2.render()
    np.testing.assert_array_equal(single, np.asarray(out["image"]))


def test_sharded_bent_normals_matches_single():
    from tpurt.passes.gtao import GtaoSettings

    r = make_renderer()
    r.config.gtao = GtaoSettings(2, 2, denoise=1, bent_normals=True)
    single = np.asarray(r.render()["image"])

    r2 = make_renderer()
    r2.config.gtao = GtaoSettings(2, 2, denoise=1, bent_normals=True)
    r2.config.mesh = make_mesh(8)
    sharded = np.asarray(r2.render()["image"])
    np.testing.assert_array_equal(single, sharded)
