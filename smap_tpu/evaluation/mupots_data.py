"""MuPoTS-3D ground-truth loading (annot.mat / occlusion.mat).

Replaces the MATLAB-side data access of the reference harness
(``lib/eval/mupots_smap.m:48-62`` in zju3dv/SMAP): per test sequence TS1-20,
``annot.mat`` holds a [num_frames, num_subjects] cell array of structs with
``annot2`` [2, J], ``univ_annot3`` [3, J] and ``isValidFrame``;
``occlusion.mat`` holds per-joint occlusion labels. Joints are truncated to
the first 15 (MPI test order).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from smap_tpu.evaluation.mupots import FrameAnnotation


def _cell_struct(arr, field: str):
    """Access a field of a scipy.io matlab struct (squeeze_me=False)."""
    return arr[field].item() if arr[field].shape == (1, 1) else arr[field]


def load_sequence(seq_dir: str) -> List[FrameAnnotation]:
    """Load one TS directory into per-frame annotations (valid persons only)."""
    import scipy.io as sio

    annot = sio.loadmat(os.path.join(seq_dir, "annot.mat"))["annotations"]
    occl = sio.loadmat(os.path.join(seq_dir, "occlusion.mat"))[
        "occlusion_labels"]
    num_frames, num_subjects = annot.shape
    frames = []
    for i in range(num_frames):
        a2, a3, oc = [], [], []
        for k in range(num_subjects):
            cell = annot[i, k]
            entry = cell[0, 0] if cell.dtype.names is None else cell
            # scipy returns a 1x1 struct array per cell.
            rec = cell[0, 0]
            valid = int(np.squeeze(rec["isValidFrame"]))
            if not valid:
                continue
            a2.append(np.asarray(rec["annot2"], float)[:, :15])
            a3.append(np.asarray(rec["univ_annot3"], float)[:, :15])
            oc.append(np.asarray(occl[i, k], float).reshape(-1)[:15])
        frames.append(FrameAnnotation(annot2=a2, univ_annot3=a3,
                                      occlusion=oc))
    return frames


def load_mupots(base_dir: str, sequences=None
                ) -> Dict[int, List[FrameAnnotation]]:
    """Load TS sequences from a MultiPersonTestSet root (all present by
    default)."""
    if sequences is None:
        sequences = [ts for ts in range(1, 21)
                     if os.path.isdir(os.path.join(base_dir, f"TS{ts}"))]
    return {ts: load_sequence(os.path.join(base_dir, f"TS{ts}"))
            for ts in sequences}


def evaluate_results(result_json_path: str, mupots_dir: str, *,
                     is_relative: bool = True, use_skel: bool = True,
                     eval_mode: int = 0):
    """Full pipeline: result JSON -> MuPoTS metrics (mupots_smap.m driver).

    Returns smap_tpu.evaluation.mupots.MupotsMetrics.
    """
    import json

    from smap_tpu.evaluation.convert import results_to_predictions
    from smap_tpu.evaluation.mupots import (FramePrediction, aggregate,
                                            evaluate_sequence)

    with open(result_json_path) as f:
        result = json.load(f)
    preds = results_to_predictions(result)
    gt = load_mupots(mupots_dir)

    results = []
    for ts, frames in gt.items():
        frame_preds = []
        for i in range(len(frames)):
            name = f"TS{ts}/img_{i:06d}.jpg"
            if name in preds:
                frame_preds.append(preds[name])
            else:
                frame_preds.append(FramePrediction(
                    pose_2d=np.zeros((0, 15, 2)),
                    pose_3d=np.zeros((0, 15, 3)),
                    visibility=np.zeros((0, 15))))
        results.append(evaluate_sequence(frames, frame_preds,
                                         is_relative=is_relative,
                                         use_skel=use_skel,
                                         eval_mode=eval_mode))
    return aggregate(results)
