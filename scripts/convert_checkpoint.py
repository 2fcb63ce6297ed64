"""Convert reference PyTorch checkpoints to our Orbax training checkpoints.

Usage:
  python scripts/convert_checkpoint.py --smap-path SMAP.pth \
      --output-dir model_logs/stage3_root2
The converted state restores with ``Trainer.ckpt.restore`` (optimizer
moments initialized fresh, iteration 0).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smap-path", required=True)
    parser.add_argument("--output-dir", required=True)
    args = parser.parse_args()

    import jax

    from smap_tpu.config import Config
    from smap_tpu.models.torch_convert import (convert_smap_state_dict,
                                               load_torch_checkpoint)
    from smap_tpu.train.engine import Trainer, TrainerConfig

    cfg = Config()
    trainer = Trainer(cfg, TrainerConfig(output_dir=args.output_dir))
    state = trainer.init_state()
    converted = convert_smap_state_dict(load_torch_checkpoint(args.smap_path))
    state = state.replace(params=jax.tree.map(lambda x: x,
                                              converted["params"]),
                          batch_stats=converted["batch_stats"])
    trainer.ckpt.save(0, jax.device_get(state))
    print(f"converted checkpoint written to {args.output_dir}/checkpoints/0")


if __name__ == "__main__":
    main()
