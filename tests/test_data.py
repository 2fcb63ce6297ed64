"""Dataset + augmentation pipeline tests (synthetic images/annotations)."""

import json

import numpy as np
import pytest


@pytest.fixture
def dataset_dir(tmp_path, rng):
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    records = []
    for i in range(6):
        h, w = (480, 640) if i % 2 else (720, 960)
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        n_people = 1 + i % 3
        bodys = np.zeros((n_people, 15, 11))
        bodys[..., 0] = rng.uniform(0, w - 1, (n_people, 15))
        bodys[..., 1] = rng.uniform(0, h - 1, (n_people, 15))
        bodys[..., 2] = rng.uniform(100, 500, (n_people, 15))
        bodys[..., 3] = 2
        bodys[..., 7] = w
        records.append({
            "dataset": "MUCO" if i % 2 else "COCO",
            "img_paths": name, "img_height": h, "img_width": w,
            "isValidation": 0, "bodys": bodys.tolist()})
    json_path = tmp_path / "annot.json"
    json_path.write_text(json.dumps({"root": records}))
    return tmp_path, img_dir, json_path


def test_joint_dataset_train_samples(dataset_dir, rng):
    from smap_tpu.config import Config
    from smap_tpu.data.datasets import JointDataset, load_annotations

    tmp, img_dir, json_path = dataset_dir
    records = load_annotations(str(json_path))
    roots = {"MUCO": str(img_dir), "COCO": str(img_dir)}
    ds = JointDataset(records, roots, Config(), "train",
                      with_augmentation=True, with_mds=True)
    assert len(ds) == 6
    img, bodys, valids, scale = ds.get_train_sample(0, rng)
    assert img.shape == (512, 832, 3) and img.dtype == np.float32
    assert bodys.shape == (20, 15, 11)
    assert valids.shape == (57,)
    assert 0 < scale < 2
    # COCO channels masked (record 0 is COCO)
    assert valids[1] == 0 and valids[15] == 0 and valids[16] == 0
    assert np.all(valids[43:] == 0)
    # MUCO record: everything valid
    _, _, valids_m, _ = ds.get_train_sample(1, rng)
    assert np.all(valids_m == 1)
    # joints that survived augmentation are inside the crop
    vis = bodys[..., 3] > 0
    assert np.all(bodys[vis][:, 0] < 832) and np.all(bodys[vis][:, 0] >= 0)
    assert np.all(bodys[vis][:, 1] < 512) and np.all(bodys[vis][:, 1] >= 0)


def test_epoch_indices_sharding():
    from smap_tpu.data.datasets import epoch_indices

    n, shards = 10, 4
    parts = [epoch_indices(n, epoch=3, shuffle=True, num_shards=shards,
                           shard=s) for s in range(shards)]
    allidx = np.concatenate(parts)
    assert len(allidx) == 12              # padded to divisible
    assert set(allidx.tolist()) == set(range(n))
    # deterministic per epoch
    again = epoch_indices(n, 3, True, shards, 1)
    np.testing.assert_array_equal(parts[1], again)
    assert not np.array_equal(
        epoch_indices(n, 4, True, shards, 1), again)


def test_train_iterator_batches(dataset_dir):
    from smap_tpu.config import Config
    from smap_tpu.data.datasets import (JointDataset, load_annotations,
                                        train_iterator)

    tmp, img_dir, json_path = dataset_dir
    records = load_annotations(str(json_path))
    roots = {"MUCO": str(img_dir), "COCO": str(img_dir)}
    ds = JointDataset(records, roots, Config(), "train",
                      with_augmentation=True)
    it = train_iterator(ds, batch_size=2, max_iter=4, start_iter=1)
    seen = []
    for iteration, batch in it:
        seen.append(iteration)
        assert batch.images.shape == (2, 512, 832, 3)
        assert batch.bodys.shape == (2, 20, 15, 11)
        assert batch.valids.shape == (2, 57)
        assert batch.scales.shape == (2,)
    assert seen == [1, 2, 3]


def test_flip_augment_consistency(rng):
    import cv2

    from smap_tpu.config import FLIP_ORDER, TrainConfig
    from smap_tpu.data.augmentation import flip_augment

    img = (rng.rand(100, 200, 3) * 255).astype(np.uint8)
    bodys = np.zeros((1, 15, 11))
    bodys[0, :, 0] = rng.uniform(0, 199, 15)
    bodys[0, :, 1] = rng.uniform(0, 99, 15)
    bodys[0, :, 3] = 2
    img2, bodys2 = flip_augment(img, bodys, np.random.RandomState(1), 1.0)
    # left shoulder (3) lands where right shoulder (9) was, mirrored
    np.testing.assert_allclose(bodys2[0, 3, 0], 199 - bodys[0, 9, 0])
    np.testing.assert_allclose(bodys2[0, 3, 1], bodys[0, 9, 1])
    np.testing.assert_array_equal(img2, cv2.flip(img, 1))


def test_composed_warp_matches_sequential_geometry(rng):
    """The opt-in single-warp augmentation must reproduce the sequential
    chain's joint geometry and random-draw order exactly (only image
    interpolation may differ)."""
    import dataclasses

    from smap_tpu.config import TrainConfig
    from smap_tpu.data.augmentation import augment_sample

    cfg_seq = TrainConfig()
    cfg_one = dataclasses.replace(cfg_seq, composed_warp=True)
    crop_hw = (128, 208)

    # Smooth image: interpolation-scheme differences stay small (noise
    # images would maximize linear-vs-cubic disagreement by construction).
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float64)
    smooth = np.stack([xx * 0.6, yy * 0.9,
                       80 + 60 * np.sin(xx / 25) * np.cos(yy / 20)], -1)
    img = np.clip(smooth, 0, 255).astype(np.uint8)

    for seed in range(8):
        r = np.random.RandomState(100 + seed)
        bodys = np.zeros((2, 15, 11))
        bodys[..., 0] = r.uniform(10, 310, (2, 15))
        bodys[..., 1] = r.uniform(10, 230, (2, 15))
        bodys[..., 2] = r.uniform(100, 400, (2, 15))
        bodys[..., 3] = 2
        for is_coco in (False, True):
            img_a, bod_a, sc_a = augment_sample(
                img, bodys, np.random.RandomState(seed), cfg_seq, crop_hw,
                is_coco=is_coco, with_augmentation=True)
            img_b, bod_b, sc_b = augment_sample(
                img, bodys, np.random.RandomState(seed), cfg_one, crop_hw,
                is_coco=is_coco, with_augmentation=True)
            assert img_b.shape == img_a.shape == (128, 208, 3)
            assert sc_b == pytest.approx(sc_a)
            # identical joint coordinates (up to composed-matrix rounding)
            np.testing.assert_allclose(bod_b[..., :2], bod_a[..., :2],
                                       atol=1e-3)
            # identical validity decisions
            np.testing.assert_array_equal(bod_b[..., 3] > 0,
                                          bod_a[..., 3] > 0)
            # depth columns untouched by either path
            np.testing.assert_array_equal(bod_b[..., 2], bod_a[..., 2])
            # pixels only roughly agree (different resample chain)
            diff = (img_a.astype(int) - img_b.astype(int))
            assert np.abs(diff).mean() < 12.0

    # Without augmentation the composed flag must fall back to the exact
    # sequential (single-resize) path.
    img_a, bod_a, sc_a = augment_sample(
        img, bodys, np.random.RandomState(0), cfg_seq, crop_hw,
        is_coco=False, with_augmentation=False)
    img_b, bod_b, sc_b = augment_sample(
        img, bodys, np.random.RandomState(0), cfg_one, crop_hw,
        is_coco=False, with_augmentation=False)
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(bod_a, bod_b)
    assert sc_a == sc_b


def test_train_iterator_workers_deterministic(dataset_dir):
    """Worker-pool loading yields identical batches to in-process loading."""
    from smap_tpu.config import Config
    from smap_tpu.data.datasets import (JointDataset, load_annotations,
                                        train_iterator)

    tmp, img_dir, json_path = dataset_dir
    records = load_annotations(str(json_path))
    roots = {"MUCO": str(img_dir), "COCO": str(img_dir)}
    ds = JointDataset(records, roots, Config(), "train",
                      with_augmentation=True)
    serial = list(train_iterator(ds, batch_size=2, max_iter=2))
    pooled = list(train_iterator(ds, batch_size=2, max_iter=2,
                                 num_workers=2))
    assert len(serial) == len(pooled) == 2
    for (i0, b0), (i1, b1) in zip(serial, pooled):
        assert i0 == i1
        np.testing.assert_array_equal(b0.images, b1.images)
        np.testing.assert_array_equal(b0.bodys, b1.bodys)
        np.testing.assert_array_equal(b0.scales, b1.scales)
