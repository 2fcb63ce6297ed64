"""Visualize result JSON (reference: lib/visualize/vis.py CLI).

Usage:
  python scripts/visualize.py --result-json r.json --image-root /imgs \
      [--out-dir vis/] [--limit 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-json", required=True)
    parser.add_argument("--image-root", default="")
    parser.add_argument("--out-dir", default="")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    from smap_tpu.utils.visualize import visualize_results

    visualize_results(args.result_json, args.image_root,
                      args.out_dir or None, args.limit)


if __name__ == "__main__":
    main()
