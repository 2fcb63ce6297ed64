"""scripts/serve.py streaming-loop pieces (the full CLI is driven
end-to-end in the verify recipe; the model-free logic is tested here)."""

import os
import sys
import time

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


def _backdate(path, seconds=60.0):
    """Age a file's mtime past the watch-mode settle window (a frame whose
    mtime is within one poll interval is treated as still being written)."""
    past = time.time() - seconds
    os.utime(path, (past, past))


def test_iter_frames_watch_yields_new_and_idle(tmp_path):
    from scripts.serve import iter_frames

    _touch_img(tmp_path / "a.jpg")
    _backdate(tmp_path / "a.jpg")
    gen = iter_frames(str(tmp_path), watch=True, poll_s=0.01)
    assert os.path.basename(next(gen)) == "a.jpg"
    # idle poll -> None (lets the caller flush partial batches)
    assert next(gen) is None
    _touch_img(tmp_path / "b.jpg")
    _backdate(tmp_path / "b.jpg")
    # next non-None yield is the new frame, exactly once
    vals = [next(gen) for _ in range(3)]
    names = [os.path.basename(v) for v in vals if v is not None]
    assert names == ["b.jpg"]


def test_iter_frames_watch_settles_and_evicts(tmp_path):
    from scripts.serve import iter_frames

    gen = iter_frames(str(tmp_path), watch=True, poll_s=0.05)
    # A frame still being written (fresh mtime) is held back, not decoded
    # truncated: the poll is idle until the mtime settles.
    _touch_img(tmp_path / "a.jpg")
    assert next(gen) is None
    _backdate(tmp_path / "a.jpg")
    assert os.path.basename(next(gen)) == "a.jpg"
    # Deleting the file evicts it from the dedup set (bounded memory for
    # long-running loops); re-creating it yields it again.
    os.unlink(tmp_path / "a.jpg")
    assert next(gen) is None
    _touch_img(tmp_path / "a.jpg")
    _backdate(tmp_path / "a.jpg")
    assert os.path.basename(next(gen)) == "a.jpg"
