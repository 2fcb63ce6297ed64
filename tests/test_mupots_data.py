"""MuPoTS .mat loading + full JSON->metrics pipeline on synthetic data."""

import json

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")


def _write_sequence(seq_dir, rng, num_frames=3, num_subjects=2):
    import scipy.io as sio

    seq_dir.mkdir(parents=True)
    annotations = np.empty((num_frames, num_subjects), object)
    occlusions = np.empty((num_frames, num_subjects), object)
    poses = []
    for i in range(num_frames):
        frame_poses = []
        for k in range(num_subjects):
            valid = 1 if (i + k) % 3 != 2 else 0
            annot3 = rng.randn(3, 17) * 200
            annot3[2] += 3000 + 600 * k
            K = np.array([[1500.0, 0, 960], [0, 1500.0, 540], [0, 0, 1]])
            annot2 = (K @ (annot3 / annot3[2]))[:2]
            cell = np.zeros((1, 1), dtype=[
                ("annot2", object), ("univ_annot3", object),
                ("annot3", object), ("isValidFrame", object)])
            cell[0, 0]["annot2"] = annot2
            cell[0, 0]["univ_annot3"] = annot3
            cell[0, 0]["annot3"] = annot3
            cell[0, 0]["isValidFrame"] = np.array([[valid]])
            annotations[i, k] = cell
            occlusions[i, k] = np.zeros((17, 1))
            frame_poses.append((valid, annot2[:, :15], annot3[:, :15]))
        poses.append(frame_poses)
    sio.savemat(str(seq_dir / "annot.mat"), {"annotations": annotations})
    sio.savemat(str(seq_dir / "occlusion.mat"),
                {"occlusion_labels": occlusions})
    return poses


def test_load_sequence(tmp_path, rng):
    from smap_tpu.evaluation.mupots_data import load_sequence

    poses = _write_sequence(tmp_path / "TS1", rng)
    frames = load_sequence(str(tmp_path / "TS1"))
    assert len(frames) == 3
    for i, frame in enumerate(frames):
        want = [p for p in poses[i] if p[0]]
        assert len(frame.annot2) == len(want)
        for got2, got3, (_, w2, w3) in zip(frame.annot2, frame.univ_annot3,
                                           want):
            np.testing.assert_allclose(got2, w2)
            np.testing.assert_allclose(got3, w3)
            assert got2.shape == (2, 15)


def test_end_to_end_eval_with_perfect_predictions(tmp_path, rng):
    """Build GT; synthesize a result JSON whose predictions reproject onto
    the GT exactly; full metric pipeline must return PCK 100."""
    from smap_tpu.evaluation.mupots import MPI_TEST_ORDER
    from smap_tpu.evaluation.mupots_data import evaluate_results

    ts = 7   # 1920x1080 resolution branch
    poses = _write_sequence(tmp_path / f"TS{ts}", rng)

    K = np.array([[1500.0, 0, 960], [0, 1500.0, 540], [0, 0, 1]])
    inv_order = np.argsort(np.asarray(MPI_TEST_ORDER))
    scale = min(832 / 1920, 512 / 1080)
    pad_y = (512 - 1080 * scale) // 2

    pairs = []
    for i, frame in enumerate(poses):
        valid = [p for p in frame if p[0]]
        pred2, pred3 = [], []
        for _, a2, a3 in valid:
            P_mm = a3.T                       # [15, 3] test order, mm
            P_cm = P_mm / 10.0
            uv = (K @ (P_cm.T / P_cm.T[2])).T  # [15, 3]
            body2 = np.zeros((15, 4))
            body2[:, 0] = uv[:, 0] * scale
            body2[:, 1] = uv[:, 1] * scale + pad_y
            body2[:, 3] = 1
            body3 = np.zeros((15, 4))
            body3[:, :3] = P_cm
            body3[:, 3] = 1
            # stored in mpi15 order: invert the test reorder
            pred2.append(body2[inv_order])
            pred3.append(body3[inv_order])
        gt_rows = np.zeros((max(len(valid), 1), 15, 7))
        gt_rows[:, :, 3] = 1500.0   # fx slot used by intrinsics_from_gt
        gt_rows[:, :, 4] = 1500.0
        gt_rows[:, :, 5] = 960.0
        gt_rows[:, :, 6] = 540.0
        pairs.append({
            "pred_2d": np.asarray(pred2).tolist(),
            "pred_3d": np.asarray(pred3).tolist(),
            "gt_3d": gt_rows.tolist(),
            "root_d": [float(p[2, 2]) for p in pred3],
            "image_path": f"TS{ts}/img_{i:06d}.jpg"})
    rj = tmp_path / "result.json"
    rj.write_text(json.dumps({"3d_pairs": pairs}))

    metrics = evaluate_results(str(rj), str(tmp_path), is_relative=True,
                               use_skel=True)
    assert metrics.pck["Total"] == pytest.approx(100.0)
    assert metrics.mpjpe == pytest.approx(0.0, abs=1e-3)

    abs_metrics = evaluate_results(str(rj), str(tmp_path), is_relative=False,
                                   use_skel=False)
    assert abs_metrics.pck["Total"] == pytest.approx(100.0)
    assert abs_metrics.ordinal_accuracy == pytest.approx(1.0)
