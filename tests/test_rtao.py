"""Ray-traced AO ground truth vs GTAO plausibility."""
import jax
import numpy as np

from tpurt.passes.rtao import rtao_frame

from test_frame import make_renderer, SIZE


def test_rtao_open_face_unoccluded_corner_occluded():
    r = make_renderer()
    scene = r.scene_device
    cam = r.camera.uniform()
    vis, valid = rtao_frame(scene, cam, jax.random.PRNGKey(0),
                            width=SIZE, height=SIZE, samples_per_frame=8,
                            total_rays_length=0.4)
    vis = np.asarray(vis)
    valid = np.asarray(valid)
    c = SIZE // 2
    assert valid[c, c]
    # camera-facing flat cube face: hemisphere fully open
    assert vis[c, c] > 0.95
    # background: defined as fully visible
    assert vis[0, 0] == 1.0


def test_rtao_accumulation_converges():
    r = make_renderer()
    scene = r.scene_device
    cam = r.camera.uniform()
    acc = None
    for i in range(3):
        vis, _ = rtao_frame(scene, cam, jax.random.PRNGKey(i),
                            width=SIZE, height=SIZE, samples_per_frame=4)
        acc = vis if acc is None else acc + vis
    mean = np.asarray(acc) / 3
    assert mean.min() >= 0.0 and mean.max() <= 1.0
