"""Cross-validation: GTAO (screen-space) vs ray-traced AO ground truth on
real geometry — both must darken the contact region where a box meets the
ground, relative to open floor. This is the tuning methodology XeGTAO itself
uses (its reference RTAO mode, XeGTAO.h:85-99)."""
import jax
import numpy as np

from tpurt.engine import Renderer, RendererConfig
from tpurt.passes.gtao import GtaoSettings
from tpurt.passes.rtao import rtao_frame
from tpurt.scene.lights import DirectionalLight
from tpurt.scene.procedural import box_field, ground_plane

SIZE = 96


def test_gtao_and_rtao_agree_on_contact_darkening():
    cfg = RendererConfig(width=SIZE, height=SIZE,
                         gtao=GtaoSettings(3, 3, denoise=1))
    r = Renderer(cfg)
    r.models.append(box_field(nx=1, nz=1, subdiv=2, half=1.0, spacing=1.0))
    r.models.append(ground_plane(size=30.0))
    r.lights_mut().directional_lights.append(
        DirectionalLight([0.2, 0.9, 0.3], [2.0, 2.0, 2.0], False))
    r.camera_mut().set_pos([0.0, -1.2, -5.0])
    d = np.array([0.0, 0.18, 1.0])
    r.camera_mut().set_dir(d / np.linalg.norm(d))
    r.prepare_first_frame()

    out = r.render()
    ao = np.asarray(out["ao"]).astype(np.float32)
    depth = np.asarray(out["depth"])
    hit = depth < 10000

    vis_rt, valid = rtao_frame(r.scene_device, r.camera.uniform(),
                               jax.random.PRNGKey(0), width=SIZE, height=SIZE,
                               samples_per_frame=16, total_rays_length=0.3)
    vis_rt = np.asarray(vis_rt)

    # contact region: hit pixels whose RTAO says strongly occluded
    occluded_rt = hit & (vis_rt < 0.75)
    open_rt = hit & (vis_rt > 0.97)
    assert occluded_rt.sum() > 20, "scene must have a contact-occluded region"
    assert open_rt.sum() > 200

    gtao_occluded = ao[occluded_rt].mean()
    gtao_open = ao[open_rt].mean()
    assert gtao_occluded < gtao_open - 10, (
        f"GTAO disagrees with RT ground truth: occluded {gtao_occluded:.1f} "
        f"vs open {gtao_open:.1f}")
