"""Golden-frame regression: the BoxTextured + point-light frame must stay
pixel-stable (the image-diff coverage SURVEY.md §4 notes the reference
lacks). Small drift tolerance absorbs cross-version XLA-CPU fusion changes;
anything beyond it is a real rendering change and the golden must be
regenerated deliberately (see tests/golden/)."""
import os

import numpy as np

from test_frame import make_renderer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "frame64.npz")


def test_frame_matches_golden():
    g = np.load(GOLDEN)
    r = make_renderer()
    out = {k: np.asarray(v) for k, v in r.render().items()}

    img = out["image"].astype(np.int32)
    ref = g["image"].astype(np.int32)
    # u8 sRGB: allow 1 LSB of drift on up to 1% of pixels
    close = (np.abs(img - ref) <= 1).all(axis=-1)
    assert close.mean() > 0.99, f"golden image drift: {1 - close.mean():.4f}"

    rmse = np.sqrt(((img - ref) ** 2).mean()) / 255.0
    assert rmse < 0.01, f"golden RMSE {rmse:.4f} exceeds the 1% gate"

    np.testing.assert_allclose(out["depth"], g["depth"], rtol=1e-4, atol=1e-3)
    assert (np.abs(out["ao"].astype(int) - g["ao"].astype(int)) <= 2).mean() > 0.99
