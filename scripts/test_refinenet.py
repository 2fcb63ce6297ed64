"""RefineNet model-selection sweep (reference: exps/refinenet_root2/test.py):
evaluates every saved epoch on a test pair-set, reports per-joint and mean
root-relative L2 error, tracks the best epoch."""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs-json", required=True)
    parser.add_argument("--snapshot-dir", required=True)
    args = parser.parse_args()

    from smap_tpu.config import RefineNetConfig
    from smap_tpu.data.datasets import P2PDataset
    from smap_tpu.train.refine import evaluate_refinenet

    cfg = RefineNetConfig()
    ds = P2PDataset(args.pairs_json)
    best = (None, float("inf"))
    for path in sorted(glob.glob(os.path.join(args.snapshot_dir,
                                              "epoch_*.pkl"))):
        epoch = int(re.search(r"epoch_(\d+)", path).group(1))
        with open(path, "rb") as f:
            state = pickle.load(f)
        per_joint, mean_err = evaluate_refinenet(state, ds, cfg)
        print(f"epoch {epoch}: mean {mean_err:.4f} cm, per-joint "
              + " ".join(f"{e:.3f}" for e in per_joint))
        if mean_err < best[1]:
            best = (epoch, mean_err)
    print(f"best epoch: {best[0]} ({best[1]:.4f} cm)")


if __name__ == "__main__":
    main()
