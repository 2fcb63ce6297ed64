"""Convert checkpoints between the reference .pth format and our Orbax
training checkpoints — both directions.

Usage:
  # reference -> ours (restores with Trainer.ckpt.restore; optimizer
  # moments initialized fresh, iteration 0)
  python scripts/convert_checkpoint.py --smap-path SMAP.pth \
      --output-dir model_logs/stage3_root2
  # ours -> reference (loadable by the reference model/smap.py)
  python scripts/convert_checkpoint.py --ckpt-dir model_logs/stage3_root2 \
      --to-torch SMAP_tpu.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smap-path", default="",
                        help="reference .pth to import")
    parser.add_argument("--output-dir", default="",
                        help="our checkpoint dir (import target / export "
                        "source with --ckpt-dir)")
    parser.add_argument("--ckpt-dir", default="",
                        help="our checkpoint dir to export from")
    parser.add_argument("--to-torch", default="",
                        help="write a reference-format .pth to this path")
    args = parser.parse_args()

    import jax

    from smap_tpu.config import Config
    from smap_tpu.train.engine import Trainer, TrainerConfig

    cfg = Config()
    if args.to_torch:
        from smap_tpu.models.torch_convert import (export_smap_state_dict,
                                                   save_torch_checkpoint)

        src = args.ckpt_dir or args.output_dir
        trainer = Trainer(cfg, TrainerConfig(output_dir=src))
        if trainer.ckpt.latest_step() is None:
            raise SystemExit(f"no checkpoint found under {src} — refusing "
                             "to export uninitialized weights")
        state = trainer.ckpt.restore(trainer.init_state())
        sd = export_smap_state_dict({
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats)})
        save_torch_checkpoint(sd, args.to_torch)
        print(f"reference-format checkpoint written to {args.to_torch}")
        return

    from smap_tpu.models.torch_convert import (convert_smap_state_dict,
                                               load_torch_checkpoint)

    if not (args.smap_path and args.output_dir):
        raise SystemExit("need --smap-path + --output-dir (import) or "
                         "--ckpt-dir + --to-torch (export)")
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
