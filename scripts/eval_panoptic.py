"""Panoptic-style evaluation of a generate_result JSON (PCK15/MPJPE/
ordinal-reversal accounting; the working port of the reference's stale
``lib/eval/test_util_panoptic.py`` — see smap_tpu/evaluation/panoptic.py).

Usage:
  python scripts/eval_panoptic.py --result-json result.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate_result_json(result: dict):
    """Accumulate every '3d_pairs' item (GT-registered rows, as emitted by
    generate_result) and return the metric summary dict."""
    from smap_tpu.evaluation.panoptic import PanopticAccumulator

    acc = PanopticAccumulator()
    for pair in result["3d_pairs"]:
        gt2, gt3 = np.asarray(pair["gt_2d"]), np.asarray(pair["gt_3d"])
        if gt2.size == 0:
            continue
        gt = np.concatenate([gt2, gt3], axis=-1)    # [P, J, >=7] rows
        pred = np.asarray(pair["pred_3d"], float)
        if pred.size == 0:
            pred = np.zeros((0, gt.shape[1], 4))
        if len(pred) < len(gt):                     # undetected tail rows
            pred = np.concatenate(
                [pred, np.zeros((len(gt) - len(pred), *pred.shape[1:]))])
        acc.update(pred[:len(gt)], gt)
    return acc.summary()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-json", required=True)
    args = parser.parse_args()
    if not os.path.exists(args.result_json):
        raise SystemExit(f"No such result file {args.result_json}")
    with open(args.result_json) as f:
        summary = evaluate_result_json(json.load(f))
    for k, v in summary.items():
        print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
