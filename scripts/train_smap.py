"""SMAP training driver (reference: exps/stage3_root2/train.py + train.sh).

Single-controller SPMD replaces torch.distributed.launch: one process
drives all local TPU devices through a data-axis mesh.

Usage:
  python scripts/train_smap.py --coco-json ... --muco-json ... \
      --coco-root ... --muco-root ... [--resume] [--max-steps N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smap_tpu.utils.cache import enable_compilation_cache
from smap_tpu.utils.runtime import apply_platform_env


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coco-json", default="")
    parser.add_argument("--muco-json", default="")
    parser.add_argument("--coco-root", default="")
    parser.add_argument("--muco-root", default="")
    parser.add_argument("--output-dir", default="model_logs/stage3_root2")
    parser.add_argument("--resume", "-c", action="store_true",
                        help="continue from the latest checkpoint")
    parser.add_argument("--max-steps", type=int, default=0)
    parser.add_argument("--batch-per-device", type=int, default=0)
    parser.add_argument("--num-workers", type=int, default=0,
                        help="data-loading worker processes")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps-per-execution", type=int, default=1,
                        help="scan K optimizer steps inside one XLA "
                        "program (amortizes host round-trips; pick a K "
                        "dividing the log/checkpoint cadences)")
    parser.add_argument("--grad-accum-steps", type=int, default=1,
                        help="split each global batch into A scanned "
                        "microbatches per optimizer step (peak activation "
                        "memory of one microbatch; batch must divide by "
                        "A x devices)")
    parser.add_argument("--profile-dir", default="",
                        help="capture an xprof device trace over steps "
                        "10-15 into this directory (TensorBoard profile "
                        "plugin / Perfetto)")
    # Multi-host (one process per host on a TPU pod; the reference's
    # torch.distributed.launch + env:// rendezvous, train.sh:5). On Cloud
    # TPU VMs jax.distributed discovers the coordinator automatically and
    # the flags can be omitted; --distributed alone enables it there.
    parser.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed (multi-host)")
    parser.add_argument("--coordinator", default=None,
                        help="coordinator address host:port (optional on "
                        "TPU VMs)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    if args.distributed or args.coordinator:
        from smap_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    apply_platform_env()
    enable_compilation_cache()

    import jax

    from smap_tpu.config import Config
    from smap_tpu.data.datasets import (JointDataset, load_annotations,
                                        train_iterator)
    from smap_tpu.train.engine import Trainer, TrainerConfig

    cfg = Config()
    records = []
    roots = {}
    if args.coco_json:
        records += load_annotations(args.coco_json)
        roots["COCO"] = args.coco_root
    if args.muco_json:
        records += load_annotations(args.muco_json)
        roots["MUCO"] = args.muco_root
    if not records:
        parser.error("at least one of --coco-json / --muco-json is required")

    dataset = JointDataset(records, roots, cfg, "train",
                           with_augmentation=True,
                           with_mds=cfg.train.with_mds)

    trainer = Trainer(cfg, TrainerConfig(
        output_dir=args.output_dir, seed=args.seed,
        steps_per_execution=args.steps_per_execution,
        grad_accum_steps=args.grad_accum_steps,
        profile_dir=args.profile_dir))
    per_device = args.batch_per_device or cfg.train.img_per_device
    global_batch = per_device * trainer.num_devices
    max_iter = args.max_steps or trainer.scaled_max_iter()

    state = trainer.init_state(args.seed)
    start_iter = 0
    if args.resume:
        state = trainer.ckpt.restore(state)
        start_iter = int(state.step)

    # Each host loads only its shard of every global batch (reference:
    # per-rank DistributedSampler, lib/utils/dataloader.py:12-65);
    # shard_batch assembles the global array from the local slices.
    host_batch = global_batch // jax.process_count()
    batches = train_iterator(dataset, host_batch, max_iter,
                             start_iter=start_iter, seed=args.seed,
                             num_shards=jax.process_count(),
                             shard=jax.process_index(),
                             num_workers=args.num_workers)
    trainer.fit(batches, state=state, max_steps=max_iter)


if __name__ == "__main__":
    main()
