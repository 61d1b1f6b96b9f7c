import numpy as np

from bundleadjustment_tpu.parallel.multihost import initialize_multihost
from bundleadjustment_tpu.vis.debug import draw_keypoints, draw_matches, save_png


def test_draw_keypoints(rng):
    img = rng.random((60, 80)).astype(np.float32)
    xy = rng.uniform(0, 60, (20, 2)).astype(np.float32)
    out = draw_keypoints(img, xy)
    assert out.shape == (60, 80, 3)
    assert out.dtype == np.uint8
    # green channel got painted somewhere
    assert (out[..., 1] == 255).any()


def test_draw_matches_and_save(tmp_path, rng):
    a = rng.random((60, 80)).astype(np.float32)
    b = rng.random((50, 70)).astype(np.float32)
    xy_a = rng.uniform(5, 45, (15, 2)).astype(np.float32)
    xy_b = rng.uniform(5, 45, (15, 2)).astype(np.float32)
    matches = np.arange(15)
    matches[5:] = -1
    out = draw_matches(a, xy_a, b, xy_b, matches)
    assert out.shape == (60, 150, 3)
    p = str(tmp_path / "m.png")
    save_png(p, out)
    from PIL import Image

    assert Image.open(p).size == (150, 60)


def test_multihost_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_multihost() is False
