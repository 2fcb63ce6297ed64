"""RefineNet stage tests: dataset pairs, training loop, model selection."""

import json

import numpy as np
import pytest


def _write_pairs_json(path, rng, n=64):
    pairs = []
    for _ in range(n):
        gt = rng.randn(15, 3) * 20
        gt[2] = 0
        pred3 = gt + rng.randn(15, 3) * 2
        score = np.ones((15, 1))
        pred3 = np.concatenate([pred3, score], -1)
        pred2 = np.concatenate([rng.rand(15, 2) * 500, np.zeros((15, 1)),
                                score], -1)
        pairs.append({"pred_3d": pred3.tolist(), "pred_2d": pred2.tolist(),
                      "gt_3d": gt.tolist(), "root_d": 350.0})
    path.write_text(json.dumps({"3d_pairs": pairs}))
    return path


def test_p2p_dataset_encoding(tmp_path, rng):
    from smap_tpu.data.datasets import P2PDataset

    p = _write_pairs_json(tmp_path / "pairs.json", rng, n=4)
    ds = P2PDataset(str(p))
    assert len(ds) == 4
    inp, gt = ds.get_sample(0)
    assert inp.shape == (75,) and gt.shape == (45,)
    # root slot holds absolute values; gt is root-relative
    gt3 = np.asarray(ds.pairs[0]["gt_3d"])
    np.testing.assert_allclose(gt.reshape(15, 3),
                               gt3 - gt3[2:3], atol=1e-6)


@pytest.mark.slow
def test_refinenet_training_reduces_error(tmp_path, rng):
    from smap_tpu.config import RefineNetConfig
    from smap_tpu.data.datasets import P2PDataset
    from smap_tpu.train.refine import (evaluate_refinenet, select_best_epoch,
                                       train_refinenet)

    p = _write_pairs_json(tmp_path / "pairs.json", rng, n=256)
    ds = P2PDataset(str(p))
    cfg = RefineNetConfig(batch_size=64, base_lr=0.01)
    snapshots = train_refinenet(ds, cfg, num_epochs=8, log_fn=lambda s: None)
    _, err_first = evaluate_refinenet(snapshots[0], ds, cfg)
    best_epoch, err_best = select_best_epoch(snapshots, ds, cfg)
    assert err_best < err_first
    assert np.isfinite(err_best)
