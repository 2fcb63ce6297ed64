#!/usr/bin/env bash
# Convenience launcher (reference: exps/stage3_root2/train.sh). On TPU there
# is no torch.distributed.launch: one process drives every local device.
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/train_smap.py "$@"
