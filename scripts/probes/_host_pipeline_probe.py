"""Measure host input-pipeline throughput: samples/s at num_workers and
with/without the composed single-warp augmentation (VERDICT r1 item 8)."""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import cv2
import numpy as np


def make_dataset(root, n=32, composed=False):
    from smap_tpu.config import Config, TrainConfig
    from smap_tpu.data.datasets import JointDataset

    rng = np.random.RandomState(0)
    records = []
    for i in range(n):
        h, w = 1080, 1920
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, f"t{i}.jpg"), img)
        bodys = np.zeros((2, 15, 11))
        bodys[..., 0] = rng.uniform(100, w - 100, (2, 15))
        bodys[..., 1] = rng.uniform(100, h - 100, (2, 15))
        bodys[..., 2] = rng.uniform(200, 400, (2, 15))
        bodys[..., 3] = 2
        bodys[..., 7] = 1100.0
        records.append({"dataset": "MUCO", "img_paths": f"t{i}.jpg",
                        "img_height": h, "img_width": w, "isValidation": 0,
                        "bodys": bodys.tolist()})
    cfg = Config(train=TrainConfig(composed_warp=composed))
    return JointDataset(records, {"MUCO": root}, cfg, "train",
                        with_augmentation=True)


def measure(ds, num_workers, n_batches=4, batch=8):
    from smap_tpu.data.datasets import train_iterator

    it = train_iterator(ds, batch, n_batches, num_workers=num_workers)
    t0 = time.perf_counter()
    count = 0
    for _, b in it:
        count += b.images.shape[0]
    dt = time.perf_counter() - t0
    return count / dt


with tempfile.TemporaryDirectory() as root:
    for composed in (False, True):
        ds = make_dataset(root, composed=composed)
        for nw in (0, 1, 2, 4):
            rate = measure(ds, nw)
            print(f"composed={composed} workers={nw}: "
                  f"{rate:.1f} samples/s", flush=True)
