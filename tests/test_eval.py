"""Tests for the Python MuPoTS evaluation harness."""

import numpy as np
import pytest

from smap_tpu.evaluation.mupots import (FrameAnnotation, FramePrediction,
                                        MPI_TEST_ORDER, MPI_TEST_PARENTS,
                                        aggregate, cal_ordinal,
                                        compute_pck_auc, evaluate_sequence,
                                        map_to_gt_bone_lengths, match_people,
                                        reorder_to_test)


def test_reorder_roundtrip():
    pose = np.arange(15 * 3).reshape(1, 15, 3).astype(float)
    out = reorder_to_test(pose)
    # pelvis (mpi15 idx 2) must land at test idx 14
    np.testing.assert_array_equal(out[0, 14], pose[0, 2])
    # head (mpi15 idx 1) at test idx 0
    np.testing.assert_array_equal(out[0, 0], pose[0, 1])


def test_match_people_greedy_order():
    gt = [np.zeros((2, 13)), np.full((2, 13), 100.0)]
    vis = [np.ones(13), np.ones(13)]
    # one pred near each gt + a decoy
    preds = [np.full((2, 13), 99.0), np.ones((2, 13))]
    pvis = [np.ones(13), np.ones(13)]
    m = match_people(gt, vis, preds, pvis)
    assert m.tolist() == [1, 0]


def test_match_people_exclusivity():
    gt = [np.zeros((2, 13)), np.ones((2, 13)) * 2]
    vis = [np.ones(13), np.ones(13)]
    preds = [np.ones((2, 13))]   # within 40px of both
    pvis = [np.ones(13)]
    m = match_people(gt, vis, preds, pvis)
    assert m[0] == 0 and m[1] == -1   # first GT takes it


def test_bone_rescale_exact_lengths():
    rng = np.random.RandomState(0)
    gt = rng.randn(3, 15) * 100
    pred = rng.randn(3, 15) * 100
    mapped = map_to_gt_bone_lengths(pred, gt)
    for j in range(14):
        p = MPI_TEST_PARENTS[j]
        gt_len = np.linalg.norm(gt[:, j] - gt[:, p])
        got_len = np.linalg.norm(mapped[:, j] - mapped[:, p])
        np.testing.assert_allclose(got_len, gt_len, rtol=1e-6)
    # pelvis (root) untouched
    np.testing.assert_array_equal(mapped[:, 14], pred[:, 14])


def test_cal_ordinal():
    assert cal_ordinal(1000, 500, 900, 400) == 1      # same order
    assert cal_ordinal(500, 1000, 900, 400) == -1     # swapped, far
    assert cal_ordinal(100, 0, 0, 100) == 0           # both within 300
    assert cal_ordinal(0, 100, 100, 0) == 0


def _perfect_frame(rng, n_people=3):
    gts, preds2, preds3 = [], [], []
    for p in range(n_people):
        pose3 = rng.randn(3, 15) * 200 + np.array([[0], [0], [3000 + 500 * p]])
        pose2 = pose3[:2] / 10 + 500 + 200 * p
        gts.append((pose2, pose3))
    ann = FrameAnnotation(
        annot2=[g[0] for g in gts],
        univ_annot3=[g[1] for g in gts],
        occlusion=[np.zeros(15) for _ in gts])
    pred = FramePrediction(
        pose_2d=np.stack([g[0].T for g in gts]),
        pose_3d=np.stack([g[1].T for g in gts]),
        visibility=np.ones((n_people, 15)))
    return ann, pred


def test_perfect_predictions_score_100(rng):
    frames = [_perfect_frame(rng) for _ in range(4)]
    res = evaluate_sequence([f[0] for f in frames], [f[1] for f in frames],
                            is_relative=True, use_skel=True)
    metrics = aggregate([res])
    assert metrics.pck["Total"] == pytest.approx(100.0)
    assert metrics.auc["Total"] > 95.0
    assert metrics.mpjpe == pytest.approx(0.0, abs=1e-6)
    assert metrics.undetected_rate == 0.0
    np.testing.assert_allclose(metrics.pck15_per_joint, 1.0)


def test_absolute_mode_ordinal(rng):
    frames = [_perfect_frame(rng) for _ in range(4)]
    res = evaluate_sequence([f[0] for f in frames], [f[1] for f in frames],
                            is_relative=False, use_skel=False)
    metrics = aggregate([res])
    assert metrics.ordinal_accuracy == pytest.approx(1.0)
    assert res.total_ordinal == 4 * 3  # C(3,2) per frame x 4 frames


def test_missing_prediction_counts_as_undetected(rng):
    ann, pred = _perfect_frame(rng, n_people=2)
    empty = FramePrediction(pose_2d=np.zeros((0, 15, 2)),
                            pose_3d=np.zeros((0, 15, 3)),
                            visibility=np.zeros((0, 15)))
    res = evaluate_sequence([ann], [empty], is_relative=True)
    metrics = aggregate([res])
    assert res.undetected == 2
    assert metrics.pck["Total"] == pytest.approx(0.0)


def test_pck15_denominator_includes_undetected(rng):
    """Golden case for the MATLAB PCK15 summary (mupots_smap.m:245-256):
    undetected persons are injected as 1e5-mm rows in EVALUATION_MODE 0 and
    DO count in the denominator (`count = count + size(tmp,3)` runs over
    every considered column, undetected included)."""
    # Frame with 3 GT people; predictions cover only the first 2.
    ann, pred = _perfect_frame(rng, n_people=3)
    partial = FramePrediction(pose_2d=pred.pose_2d[:2],
                              pose_3d=pred.pose_3d[:2],
                              visibility=pred.visibility[:2])
    res = evaluate_sequence([ann], [partial], is_relative=True,
                            use_skel=False, eval_mode=0)
    assert res.undetected == 1
    # 3 considered rows (2 matched + 1 undetected 1e5 row).
    assert res.per_joint_error.shape[1] == 3
    metrics = aggregate([res])
    # Matched persons are exact -> error 0; undetected row is all misses.
    np.testing.assert_allclose(metrics.pck15_per_joint,
                               np.full(15, 2.0 / 3.0))
    # PCK@150 over eval joints sees the same 2/3 ratio.
    assert metrics.pck["Total"] == pytest.approx(100.0 * 2.0 / 3.0)

    # EVALUATION_MODE 1 drops the undetected column from numerator AND
    # denominator (only_matched_annotations_ prefix in the MATLAB).
    res1 = evaluate_sequence([ann], [partial], is_relative=True,
                             use_skel=False, eval_mode=1)
    assert res1.per_joint_error.shape[1] == 2
    metrics1 = aggregate([res1])
    np.testing.assert_allclose(metrics1.pck15_per_joint, 1.0)


def test_eval_mode_1_skips_unmatched(rng):
    ann, pred = _perfect_frame(rng, n_people=2)
    empty = FramePrediction(pose_2d=np.zeros((0, 15, 2)),
                            pose_3d=np.zeros((0, 15, 3)),
                            visibility=np.zeros((0, 15)))
    res = evaluate_sequence([ann], [empty], is_relative=True, eval_mode=1)
    assert res.per_joint_error.shape[1] == 0


def test_compute_pck_auc_shapes(rng):
    errors = rng.rand(14, 100) * 300
    out = compute_pck_auc(errors)
    assert set(out["pck"]) == {g[0] for g in
                               [("Head",), ("Neck",), ("Shou",), ("Elbow",),
                                ("Wrist",), ("Hip",), ("Knee",), ("Ankle",),
                                ("Total",)]}
    expected_total = 100.0 * np.mean(errors < 150.0)
    assert out["pck"]["Total"] == pytest.approx(expected_total, abs=0.5)


def test_convert_reprojection(rng):
    from smap_tpu.evaluation.convert import (pair_to_prediction,
                                             unletterbox_2d)

    K = np.array([[1500.0, 0, 960], [0, 1500.0, 540], [0, 0, 1]])
    # ground-truth 3D point in cm, projected to pixels
    P = np.array([30.0, -20.0, 400.0])   # cm
    uv = K @ (P / P[2])
    pred_3d = np.zeros((1, 15, 4))
    pred_3d[0, :, :3] = P
    pred_3d[0, :, 3] = 1
    # net-input coords for a 1920x1080 image letterboxed into 832x512
    scale = min(832 / 1920, 512 / 1080)
    pad_y = (512 - 1080 * scale) // 2
    pred_2d = np.zeros((1, 15, 4))
    pred_2d[0, :, 0] = uv[0] * scale
    pred_2d[0, :, 1] = uv[1] * scale + pad_y
    pred_2d[0, :, 3] = 1
    pair = {"pred_3d": pred_3d.tolist(), "pred_2d": pred_2d.tolist(),
            "image_path": "TS7/img_000001.jpg"}
    fp = pair_to_prediction(pair, K)
    np.testing.assert_allclose(fp.pose_3d[0, 0], P * 10, rtol=1e-6)


def test_masked_pck(rng):
    from smap_tpu.evaluation.mupots import compute_masked_pck_auc

    frames = [_perfect_frame(rng) for _ in range(2)]
    # mark some joints occluded
    for ann, _ in frames:
        for occ in ann.occlusion:
            occ[3:6] = 1
    res = evaluate_sequence([f[0] for f in frames], [f[1] for f in frames])
    vis = compute_masked_pck_auc([res], use_occluded=False)
    occ = compute_masked_pck_auc([res], use_occluded=True)
    # perfect predictions: every *included* joint scores
    assert vis["pck"]["Total"] < 100.0   # some joints masked out
    assert occ["pck"]["Total"] < 100.0
    assert vis["pck"]["Total"] + occ["pck"]["Total"] == pytest.approx(100.0)


def test_panoptic_accumulator(rng):
    from smap_tpu.evaluation.panoptic import PanopticAccumulator

    P = 3
    gt = np.zeros((P, 15, 7))
    gt[..., 3] = 2
    gt[..., 4:7] = rng.randn(P, 15, 3) * 30
    pred = np.zeros((P, 15, 4))
    pred[..., :3] = gt[..., 4:7] + rng.randn(P, 15, 3) * 2
    pred[..., 3] = 1
    acc = PanopticAccumulator()
    acc.update(pred, gt)
    s = acc.summary()
    assert s["detection_rate"] == 1.0
    assert s["pck15_abs"] > 0.95
    assert 0 < s["mpjpe_abs_cm"] < 10
    # missed person
    pred2 = pred.copy()
    pred2[0, :, 3] = 0
    acc2 = PanopticAccumulator()
    acc2.update(pred2, gt)
    assert acc2.summary()["detection_rate"] == pytest.approx(2 / 3)


def test_eval_panoptic_cli_helper(rng):
    """scripts/eval_panoptic.py: perfect predictions score PCK15 1.0, full
    detection; an undetected person lowers the detection rate."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from scripts.eval_panoptic import evaluate_result_json

    P, J = 3, 15
    gt = np.zeros((P, J, 11), np.float32)
    gt[..., 3] = 2                      # visible
    gt[..., 4:7] = rng.rand(P, J, 3) * 100
    pred = np.concatenate([gt[..., 4:7], np.ones((P, J, 1), np.float32)],
                          -1)
    pair = {"gt_2d": gt[..., :4].tolist(), "gt_3d": gt[..., 4:].tolist(),
            "pred_3d": pred.tolist()}
    s = evaluate_result_json({"3d_pairs": [pair]})
    assert s["pck15_abs"] == 1.0 and s["pck15_rel"] == 1.0
    assert s["detection_rate"] == 1.0 and s["mpjpe_abs_cm"] == 0.0

    # drop the last person's prediction entirely
    pair2 = {"gt_2d": gt[..., :4].tolist(), "gt_3d": gt[..., 4:].tolist(),
             "pred_3d": pred[:2].tolist()}
    s2 = evaluate_result_json({"3d_pairs": [pair2]})
    assert abs(s2["detection_rate"] - 2 / 3) < 1e-9
