"""scripts/serve.py streaming-loop pieces (the full CLI is driven
end-to-end in the verify recipe; the model-free logic is tested here)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _touch_img(path):
    import cv2

    cv2.imwrite(str(path), np.zeros((8, 8, 3), np.uint8))


def test_iter_frames_oneshot(tmp_path):
    from scripts.serve import iter_frames

    _touch_img(tmp_path / "b.jpg")
    _touch_img(tmp_path / "a.jpg")
    got = list(iter_frames(str(tmp_path), watch=False))
    assert [os.path.basename(p) for p in got] == ["a.jpg", "b.jpg"]


def test_iter_frames_watch_yields_new_and_idle(tmp_path):
    from scripts.serve import iter_frames

    _touch_img(tmp_path / "a.jpg")
    gen = iter_frames(str(tmp_path), watch=True, poll_s=0.01)
    assert os.path.basename(next(gen)) == "a.jpg"
    # idle poll -> None (lets the caller flush partial batches)
    assert next(gen) is None
    _touch_img(tmp_path / "b.jpg")
    # next non-None yield is the new frame, exactly once
    vals = [next(gen) for _ in range(3)]
    names = [os.path.basename(v) for v in vals if v is not None]
    assert names == ["b.jpg"]
