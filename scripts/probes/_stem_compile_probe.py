"""Compile-bisect the fused stem on the real Mosaic compiler (no
execution — AOT lower+compile only, seconds per variant).

v1 failed Mosaic verification (strided vector slices in the pool); v2
(parity lanes, no strided access) passed verification but crashed the
compile HELPER (exit 1) with the single 12-way lane-concat im2col
matmul. This probe isolates which construct kills the helper across:
im2col (concat) vs accumulate (12 small matmuls), tile_p 8 vs 4, and
kernel stages (0 conv only / 1 +width pool / 2 full).

Run on TPU: python scripts/probes/_stem_compile_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp

BATCH = 16


def main():
    print("backend:", jax.default_backend(), flush=True)
    from smap_tpu.ops.fused_stem import fused_stem

    x = jax.ShapeDtypeStruct((BATCH, 256, 208, 24), jnp.bfloat16)
    k = jax.ShapeDtypeStruct((7, 7, 3, 64), jnp.bfloat16)
    b = jax.ShapeDtypeStruct((64,), jnp.float32)

    variants = [
        ("2ref tile8 full reshape-rowpool", dict(tile_p=8, stage=2)),
        ("2ref tile8 full stride-rowpool",
         dict(tile_p=8, stage=2, stride_rowpool=True)),
        ("2ref tile8 conv-only", dict(tile_p=8, stage=0)),
        ("2ref tile8 conv+wpool", dict(tile_p=8, stage=1)),
        ("2ref tile4 full", dict(tile_p=4, stage=2)),
    ]
    for tag, kw in variants:
        t0 = time.perf_counter()
        try:
            fused_stem.lower(x, k, b, **kw).compile()
            print(f"{tag}: OK ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
