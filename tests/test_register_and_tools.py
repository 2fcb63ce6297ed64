"""Tests for GT registration, COCO conversion and visualization tooling."""

import json
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


def test_register_pred_matches_reference(rng):
    """Golden test vs. the reference numpy implementation."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    from smap_tpu.evaluation.register import register_pred

    P, G = 5, 4
    gt = np.zeros((G, 15, 11))
    gt[:, 2, :2] = rng.uniform(100, 700, (G, 2))
    pred2 = np.zeros((P, 15, 4))
    # three preds near gts 0..2, two far away
    pred2[0, 2, :2] = gt[0, 2, :2] + 5
    pred2[1, 2, :2] = gt[2, 2, :2] + [8, -3]
    pred2[2, 2, :2] = gt[1, 2, :2] + 25
    pred2[3, 2, :2] = [5000, 5000]
    pred2[4, 2, :2] = [6000, 6000]
    pred2[..., 3] = 1
    pred3 = rng.randn(P, 15, 4)
    rdep = rng.rand(P) * 400

    new2, new3, newd = register_pred(pred2, pred3, rdep, gt)

    # reference oracle (loop from test_util.py:18-42, adapted: np.int/float
    # aliases removed in modern numpy)
    root_gt = gt[:, 2, :2]
    root_pd = pred2[:, 2, :2]
    dist = np.linalg.norm(root_gt[:, None] - root_pd[None], axis=2)
    corres = np.full(G, -1)
    occupied = np.zeros(P)
    while np.min(dist) < 30:
        mi = np.where(dist == np.min(dist))
        for i in range(len(mi[0])):
            dist[mi[0][i]][mi[1][i]] = 50
            if corres[mi[0][i]] >= 0 or occupied[mi[1][i]]:
                continue
            corres[mi[0][i]] = mi[1][i]
            occupied[mi[1][i]] = 1
    for gi in range(G):
        if corres[gi] >= 0:
            np.testing.assert_array_equal(new2[gi], pred2[corres[gi]])
            np.testing.assert_array_equal(new3[gi], pred3[corres[gi]])
            assert newd[gi] == rdep[corres[gi]]
        else:
            assert np.all(new2[gi] == 0) and np.all(new3[gi] == 0)


def test_coco_convert(tmp_path, rng):
    from smap_tpu.data.coco_convert import convert_coco

    kpts = np.zeros((17, 3))
    kpts[5] = [100, 50, 2]    # shoulders
    kpts[6] = [140, 50, 2]
    kpts[11] = [105, 150, 2]  # hips
    kpts[12] = [135, 150, 1]
    kpts[15] = [108, 250, 2]  # one ankle
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 640,
                    "height": 480}],
        "annotations": [{"image_id": 1, "num_keypoints": 5, "iscrowd": 0,
                         "keypoints": kpts.ravel().tolist()}],
    }
    src = tmp_path / "coco.json"
    src.write_text(json.dumps(coco))
    out = tmp_path / "unified.json"
    n = convert_coco(str(src), str(out))
    assert n == 1
    rec = json.loads(out.read_text())["root"][0]
    body = np.asarray(rec["bodys"][0])
    assert body.shape == (15, 11)
    np.testing.assert_allclose(body[2, :2], [120, 150])       # pelvis
    sho = np.array([120.0, 50.0])
    np.testing.assert_allclose(body[0, :2],
                               sho + 0.185 * (sho - [120, 150]))
    assert body[1, 3] == 0                                     # head-top
    assert body[0, 7] == 640 and body[0, 9] == 320


def test_visualize_results(tmp_path, rng):
    from smap_tpu.utils.visualize import visualize_results

    person = np.zeros((15, 4))
    person[:, :3] = rng.randn(15, 3) * 30
    person[:, 3] = 1
    result = {"3d_pairs": [{"pred_3d": [person.tolist()],
                            "image_path": "missing.jpg"}]}
    rj = tmp_path / "result.json"
    rj.write_text(json.dumps(result))
    out_dir = tmp_path / "vis"
    visualize_results(str(rj), str(tmp_path), str(out_dir))
    assert (out_dir / "vis_00000.png").exists()
