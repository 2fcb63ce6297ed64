"""Datasets over the unified annotation JSON schema + batch iterators.

Equivalents of the reference's dataset classes
(``dataset/base_dataset.py`` / ``dataset/custom_dataset.py`` /
``dataset/p2p_dataset.py`` in zju3dv/SMAP) and its sampler stack
(``cvpack/dataset/torch_samplers``, ``lib/utils/dataloader.py``), reshaped
for a single-controller SPMD trainer:

* ``JointDataset`` reads the unified JSON (rows ``[x, y, Z, v, X, Y, Z, fx,
  fy, cx, cy]``, see lib/preprocess/data_format.md), applies host-side
  geometric augmentation and returns fixed-capacity joint tables; label
  rasterization happens on device inside the train step.
* ``train_iterator`` replaces DistributedSampler + IterationBasedBatchSampler:
  epoch-seeded shuffles, pad-to-divisible, per-process strided shard,
  iteration-indexed so resume is exact; a background thread double-buffers
  batches.
* ``P2PDataset`` builds RefineNet (input, target) pairs from a
  ``generate_train`` result JSON.
"""

from __future__ import annotations

import json
import os.path as osp
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from smap_tpu.config import Config, NUM_JOINTS, ROOT_IDX
from smap_tpu.data.augmentation import augment_sample
from smap_tpu.data.preprocess import normalize_image


def load_annotations(json_path: str) -> List[dict]:
    with open(json_path) as f:
        return json.load(f)["root"]


class JointDataset:
    """Mixed 2D/3D pose dataset (reference: dataset/base_dataset.py:17-193).

    Args:
      records: annotation records (each with dataset/img_paths/img_height/
        img_width/isValidation/bodys).
      root_paths: dataset name -> image root directory.
      stage: 'train' | 'generation' | 'test'.
    """

    def __init__(self, records: Sequence[dict], root_paths: Dict[str, str],
                 cfg: Config = Config(), stage: str = "train",
                 with_augmentation: bool = False, with_mds: bool = True):
        assert stage in ("train", "test", "generation")
        self.cfg = cfg
        self.stage = stage
        self.with_augmentation = with_augmentation
        self.with_mds = with_mds
        self.root_paths = root_paths
        want_val = stage == "test"
        self.records = [r for r in records
                        if bool(r.get("isValidation", 0)) == want_val]

    def __len__(self) -> int:
        return len(self.records)

    def _load_image(self, rec: dict) -> np.ndarray:
        import cv2

        root = self.root_paths[rec["dataset"].upper()]
        img = cv2.imread(osp.join(root, rec["img_paths"]), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(osp.join(root, rec["img_paths"]))
        return img

    def get_train_sample(self, index: int, rng: np.random.RandomState):
        """Returns (image f32 normalized [H,W,3], bodys [P,15,11], valids
        [57], scale) with P = cfg.train.max_people."""
        cfg = self.cfg
        rec = self.records[index]
        img = self._load_image(rec)
        bodys = np.asarray(rec["bodys"], np.float64)
        is_coco = rec["dataset"].upper() == "COCO"

        img, bodys, scale = augment_sample(
            img, bodys, rng, cfg.train, cfg.input_shape, is_coco,
            self.with_augmentation)

        valids = np.ones((57,), np.float32)
        if is_coco:
            # COCO lacks head-top and depth labels (base_dataset.py:168-175).
            valids[1] = 0
            valids[NUM_JOINTS] = 0
            valids[NUM_JOINTS + 1] = 0
            valids[NUM_JOINTS + 28:] = 0

        P = cfg.train.max_people
        table = np.zeros((P, NUM_JOINTS, 11), np.float32)
        n = min(len(bodys), P)
        if n:
            cols = min(bodys.shape[-1], 11)
            table[:n, :, :cols] = bodys[:n, :, :cols]
        from smap_tpu.data.native import normalize_native

        return (normalize_native(img), table, valids, np.float32(scale))

    def get_eval_sample(self, index: int):
        """Test/generation sample: (image, bodys_raw [P,15,C], path, scale
        dict) — reference base_dataset.py:157-165."""
        import cv2

        cfg = self.cfg
        rec = self.records[index]
        img = self._load_image(rec)
        bodys = np.asarray(rec["bodys"], np.float64)
        net_h, net_w = cfg.input_shape
        scale_v = min(net_w / img.shape[1], net_h / img.shape[0])
        rs = np.random.RandomState(0)  # no randomness on the eval path
        img2, bodys2, scale_v = augment_sample(
            img, bodys, rs, cfg.train, cfg.input_shape, False, False)
        P = cfg.train.max_people
        width = bodys2.shape[-1] if len(bodys2) else 11
        table = np.zeros((P, NUM_JOINTS, width), np.float64)
        table[:min(len(bodys2), P)] = bodys2[:P]
        scale = {"scale": scale_v,
                 "img_width": rec["img_width"],
                 "img_height": rec["img_height"],
                 "net_width": net_w, "net_height": net_h}
        return normalize_image(img2), table, rec["img_paths"], scale


class P2PDataset:
    """RefineNet pair dataset (reference: dataset/p2p_dataset.py:9-40)."""

    def __init__(self, json_path: str, root_idx: int = ROOT_IDX):
        with open(json_path) as f:
            data = json.load(f)
        self.pairs = data["3d_pairs"]
        self.root_idx = root_idx

    def __len__(self) -> int:
        return len(self.pairs)

    def get_sample(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (input [75], target [45]) root-relative encodings."""
        pair = self.pairs[index]
        pred_3d = np.asarray(pair["pred_3d"], np.float32)
        pred_2d = np.asarray(pair["pred_2d"], np.float32)
        gt_3d = np.asarray(pair["gt_3d"], np.float32)
        r = self.root_idx
        inp = np.zeros((NUM_JOINTS, 5), np.float32)
        inp[r, :2] = pred_2d[r, :2]
        inp[r, 2:] = pred_3d[r, :3]
        for j in range(NUM_JOINTS):
            if j != r and pred_3d[j, 3] > 0:
                inp[j, :2] = pred_2d[j, :2] - pred_2d[r, :2]
                inp[j, 2:] = pred_3d[j, :3] - pred_3d[r, :3]
        gt = gt_3d[:, :3] - gt_3d[r:r + 1, :3]
        return inp.reshape(-1), gt.reshape(-1)


def epoch_indices(n: int, epoch: int, shuffle: bool, num_shards: int,
                  shard: int, seed: int = 0) -> np.ndarray:
    """DistributedSampler semantics (cvpack torch_samplers): epoch-seeded
    shuffle, pad to a multiple of num_shards, strided slice per shard."""
    if shuffle:
        g = np.random.RandomState(seed + epoch)
        idx = g.permutation(n)
    else:
        idx = np.arange(n)
    total = -(-n // num_shards) * num_shards
    idx = np.concatenate([idx, idx[:total - n]])
    return idx[shard::num_shards]


_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_sample(args):
    index, sample_seed = args
    rng = np.random.RandomState(sample_seed)
    return _WORKER_DATASET.get_train_sample(index, rng)


def train_iterator(dataset: JointDataset, batch_size: int, max_iter: int,
                   start_iter: int = 0, seed: int = 0, num_shards: int = 1,
                   shard: int = 0, prefetch: int = 2,
                   num_workers: int = 0) -> Iterator:
    """Infinite re-iteration to max_iter with background prefetch.

    Mirrors IterationBasedBatchSampler (re-shuffling each epoch, resuming at
    ``start_iter``) but yields assembled numpy TrainBatch tuples. With
    ``num_workers > 0``, samples are decoded/augmented in a fork-based
    process pool (the reference's DataLoader workers,
    lib/utils/dataloader.py:60-63); randomness stays per-sample-seeded so
    results are identical for any worker count.
    """
    from smap_tpu.train.step import TrainBatch

    n = len(dataset)
    per_epoch = max(len(epoch_indices(n, 0, True, num_shards, shard))
                    // batch_size, 1)

    pool = None
    if num_workers > 0:
        import multiprocessing as mp

        pool = mp.get_context("fork").Pool(
            num_workers, initializer=_worker_init, initargs=(dataset,))

    def sample_seed(it, k):
        return (seed * 7919 + it * 131 + k * 31 + shard) % (2 ** 31)

    def make_batch(it, order, offset):
        jobs = [(int(order[offset + k]), sample_seed(it, k))
                for k in range(batch_size)]
        if pool is not None:
            samples = pool.map(_worker_sample, jobs)
        else:
            samples = [_worker_sample(job) for job in jobs]
        imgs, bodys, valids, scales = zip(*samples)
        return TrainBatch(images=np.stack(imgs), bodys=np.stack(bodys),
                          valids=np.stack(valids),
                          scales=np.asarray(scales, np.float32))

    def produce(out_q: queue.Queue):
        try:
            it = start_iter
            while it < max_iter:
                epoch = it // per_epoch
                order = epoch_indices(n, epoch, True, num_shards, shard,
                                      seed)
                offset = (it % per_epoch) * batch_size
                while offset + batch_size <= len(order) and it < max_iter:
                    out_q.put((it, make_batch(it, order, offset)))
                    it += 1
                    offset += batch_size
            out_q.put(None)
        finally:
            if pool is not None:
                pool.close()

    # The single-worker path needs the global set in-process too.
    _worker_init(dataset)
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    thread = threading.Thread(target=produce, args=(q,), daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item
