"""Procedural geometry + at-scale scene construction."""
import numpy as np

from tpurt.engine import Renderer, RendererConfig
from tpurt.passes.gtao import GtaoSettings
from tpurt.scene.lights import DirectionalLight
from tpurt.scene.procedural import box_field, ground_plane


def test_box_field_counts():
    m = box_field(nx=2, nz=2, subdiv=3)
    prims = m.primitives()
    assert len(prims) == 4
    tris = sum(len(p["indices"]) for p in prims)
    assert tris == 2 * 2 * 6 * 3 * 3 * 2


def test_render_procedural_scene():
    cfg = RendererConfig(width=64, height=64,
                         gtao=GtaoSettings(1, 2, denoise=1))
    r = Renderer(cfg)
    r.models.append(box_field(nx=3, nz=3, subdiv=2))
    r.models.append(ground_plane())
    r.lights_mut().directional_lights.append(
        DirectionalLight(dir=[0.3, 0.9, 0.2], color=[2.0, 2.0, 2.0],
                         casts_shadows=True))
    r.camera_mut().set_pos([0.0, -2.0, -6.0])
    d = np.array([0.0, 0.25, 1.0])
    r.camera_mut().set_dir(d / np.linalg.norm(d))
    r.prepare_first_frame()
    out = {k: np.asarray(v) for k, v in r.render().items()}
    assert (out["depth"] < 10000).mean() > 0.3, "scene should fill the view"
    assert out["image"].any()
