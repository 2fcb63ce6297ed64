#!/usr/bin/env bash
# Convenience launcher (reference: exps/stage3_root2/test.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/test_smap.py "$@"
