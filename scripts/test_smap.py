"""SMAP inference/eval driver (reference: exps/stage3_root2/test.py).

Three modes, mirroring the reference CLI:
  run_inference   — custom image directory -> result JSON
  generate_result — labeled test set -> result JSON with GT (for MuPoTS eval)
  generate_train  — produce RefineNet training pairs

Checkpoints may be either our Orbax checkpoints (--ckpt-dir) or a converted
reference .pth (--smap-path, loaded via torch on host).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smap_tpu.utils.cache import enable_compilation_cache
from smap_tpu.utils.runtime import apply_platform_env


def load_smap_variables(args, cfg):
    import jax

    if args.smap_path and not os.path.exists(args.smap_path):
        # reference behavior: report and exit (test.py:220-221)
        raise SystemExit(f"No such checkpoint of SMAP {args.smap_path}")
    if args.smap_path:
        from smap_tpu.models.torch_convert import (convert_smap_state_dict,
                                                   load_torch_checkpoint)
        sd = load_torch_checkpoint(args.smap_path)
        return jax.tree.map(lambda x: x, convert_smap_state_dict(sd))
    if args.ckpt_dir:
        from smap_tpu.train.engine import CheckpointManager, Trainer, TrainerConfig
        trainer = Trainer(cfg, TrainerConfig(output_dir=args.ckpt_dir))
        state = trainer.ckpt.restore(trainer.init_state())
        return {"params": state.params, "batch_stats": state.batch_stats}
    raise SystemExit("one of --smap-path / --ckpt-dir is required")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--test_mode", "-t", default="run_inference",
                        choices=["generate_train", "generate_result",
                                 "run_inference"])
    parser.add_argument("--data_mode", "-d", default="test",
                        choices=["test", "generation"])
    parser.add_argument("--smap-path", "-p", default="",
                        help="reference .pth checkpoint (converted on load)")
    parser.add_argument("--ckpt-dir", default="",
                        help="our Orbax checkpoint directory")
    parser.add_argument("--refine-path", "-rp", default="")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--do_flip", type=float, default=0)
    parser.add_argument("--dataset_path", default="",
                        help="image dir for run_inference")
    parser.add_argument("--test-json", default="",
                        help="unified annotation JSON for generate_* modes")
    parser.add_argument("--test-root", default="",
                        help="image root for generate_* modes")
    parser.add_argument("--json_name", default="")
    parser.add_argument("--output-dir", default="model_logs/stage3_root2/result")
    parser.add_argument("--data-parallel", action="store_true",
                        help="single-process multi-chip serving: shard "
                        "each batch over all local devices (batch_size "
                        "must be divisible by the device count)")
    parser.add_argument("--adaptive-capacities", default="",
                        help="comma-separated peak-capacity ladder for "
                        "run_inference, e.g. 8,16,40: post-processing runs "
                        "at the smallest compiled capacity that fits each "
                        "batch's peak counts (cost is quadratic in "
                        "capacity), escalating to 127 on crowds")
    parser.add_argument("--profile-dir", default="",
                        help="capture an xprof device trace of the run "
                        "(TensorBoard profile plugin / Perfetto)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: initialize jax.distributed, shard "
                        "the eval set per process and all-gather the results")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    if args.distributed or args.coordinator:
        from smap_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    apply_platform_env()
    enable_compilation_cache()

    from smap_tpu.config import Config
    from smap_tpu.inference import SMAPInference, run_inference

    cfg = Config()
    variables = load_smap_variables(args, cfg)
    refine_variables = None
    if args.refine_path:
        import jax

        from smap_tpu.models.torch_convert import (
            convert_refinenet_state_dict, load_torch_checkpoint)
        refine_variables = jax.tree.map(
            lambda x: x,
            convert_refinenet_state_dict(load_torch_checkpoint(
                args.refine_path)))

    os.makedirs(args.output_dir, exist_ok=True)
    suffix = f"_{args.json_name}" if args.json_name else ""
    out_json = os.path.join(
        args.output_dir,
        f"stage3_root2_{args.test_mode}_{args.data_mode}{suffix}.json")

    from smap_tpu.utils.profiling import trace

    ladder = (tuple(int(c) for c in args.adaptive_capacities.split(","))
              if args.adaptive_capacities else None)
    if args.test_mode == "run_inference":
        with trace(args.profile_dir):
            run_inference(args.dataset_path, variables, cfg,
                          refine_variables=refine_variables,
                          do_flip=bool(args.do_flip),
                          batch_size=args.batch_size, output_json=out_json,
                          adaptive_capacities=ladder,
                          data_parallel=args.data_parallel)
        print(f"results written to {out_json}")
        return

    # generate_result / generate_train over a labeled set.
    from smap_tpu.data.datasets import JointDataset, load_annotations
    from smap_tpu.inference import run_labeled_inference

    records = load_annotations(args.test_json)
    stage = "generation" if args.test_mode == "generate_train" else "test"
    ds = JointDataset(records, {"MUPOTS": args.test_root,
                                "MUCO": args.test_root},
                      cfg, stage, with_augmentation=False)
    mesh = None
    if args.data_parallel:
        import jax as _jax

        from smap_tpu.parallel.mesh import make_mesh

        if len(_jax.local_devices()) > 1:
            mesh = make_mesh(_jax.local_devices())
    engine = SMAPInference(variables, cfg, refine_variables,
                           bool(args.do_flip), mesh=mesh)
    # Contiguous per-process eval shard + picklable all-gather merge
    # (reference: lib/utils/dataloader.py:79-85 + comm.py:47-87).
    import jax

    with trace(args.profile_dir):
        result = run_labeled_inference(ds, engine, mode=args.test_mode,
                                       batch_size=args.batch_size,
                                       shard=jax.process_index(),
                                       num_shards=jax.process_count(),
                                       gather=jax.process_count() > 1)
    from smap_tpu.parallel.distributed import is_main_process

    if is_main_process():
        with open(out_json, "w") as f:
            json.dump(result, f)
        print(f"results written to {out_json}")


if __name__ == "__main__":
    main()
