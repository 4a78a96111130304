"""Offline CLI smoke test (the app layer, main.rs analogue)."""
import os

import numpy as np

from tpurt.app import offline

BOX = "/root/reference/assets/models/BoxTextured.glb"


def test_cli_single_frame(tmp_path):
    out = str(tmp_path / "frame.png")
    offline.main([
        "--model", BOX, "--width", "64", "--height", "64",
        "--frames", "1", "--quality", "low", "--out", out,
        "--cam-pos", "0", "0", "-3",
    ])
    assert os.path.exists(out)
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (64, 64, 3)


def test_cli_accumulation_with_checkpoint(tmp_path):
    out = str(tmp_path / "truth.png")
    ckpt = str(tmp_path / "accum.npz")
    offline.main([
        "--model", BOX, "--width", "32", "--height", "32",
        "--spp", "3", "--checkpoint", ckpt, "--checkpoint-every", "2",
        "--quality", "low", "--out", out, "--cam-pos", "0", "0", "-3",
    ])
    assert os.path.exists(out) and os.path.exists(ckpt)
    data = np.load(ckpt)
    assert int(data["num_samples"]) == 3
