"""RefineNet training driver (reference: exps/refinenet_root2/train.py).

Usage:
  python scripts/train_refinenet.py --pairs-json <generate_train output> \
      [--epochs N] [--output-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs-json", required=True)
    parser.add_argument("--epochs", type=int, default=0)
    parser.add_argument("--output-dir", default="model_logs/refinenet_root2")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from smap_tpu.utils.cache import enable_compilation_cache
    from smap_tpu.utils.runtime import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    from smap_tpu.config import RefineNetConfig
    from smap_tpu.data.datasets import P2PDataset
    from smap_tpu.train.refine import train_refinenet

    cfg = RefineNetConfig()
    ds = P2PDataset(args.pairs_json)
    snapshots = train_refinenet(ds, cfg, num_epochs=args.epochs or None,
                                seed=args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    for epoch, state in snapshots.items():
        with open(os.path.join(args.output_dir, f"epoch_{epoch}.pkl"),
                  "wb") as f:
            pickle.dump(state, f)
    print(f"saved {len(snapshots)} epoch snapshots to {args.output_dir}")


if __name__ == "__main__":
    main()
