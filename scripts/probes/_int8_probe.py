"""Does the TPU run int8 convs at the int8 MXU rate? (v5e: 394 TOPS.)

Work-scaling chains (fixed-overhead-robust) of 3x3 int8 convs vs the
same-shape bf16 convs, content-verified (distinct inputs must give
distinct checksums). If the marginal int8 rate is ~2x bf16, an opt-in
int8-quantized serving forward is worth building.

Run on TPU: python scripts/probes/_int8_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))

    shape = (16, 128, 208, 256)
    flop_per_step = 2 * 16 * 128 * 208 * 9 * 256 * 256 / 1e12  # 0.50 T(FL)OP

    def run(tag, dtype, acc, ns=(8, 32)):
        w = jnp.asarray(rng.randint(-10, 10, (3, 3, 256, 256)), dtype)
        results = {}
        for n in ns:
            @jax.jit
            def chain(x, w, n=n):
                def body(c, _):
                    y = jax.lax.conv_general_dilated(
                        c, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=acc)
                    # renormalize so the chain doesn't overflow/saturate
                    y = (y // 64).astype(dtype) if acc == jnp.int32 \
                        else jnp.maximum(y, 0).astype(dtype)
                    return y, ()
                y, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32))

            def fresh():
                if dtype == jnp.int8:
                    return jnp.asarray(rng.randint(-100, 100, shape),
                                       jnp.int8)
                return jnp.asarray(rng.randn(*shape) * 0.05, dtype)

            x = fresh()
            t0 = time.perf_counter()
            jax.block_until_ready(chain(x, w))
            dts, sums = [], []
            for _ in range(3):
                x = fresh()
                t0 = time.perf_counter()
                s = chain(x, w)
                jax.block_until_ready(s)
                dts.append(time.perf_counter() - t0)
                sums.append(float(s))
            if len(set(sums)) == 1:
                print(f"{tag} n={n}: IDENTICAL results -> replay, unusable",
                      flush=True)
                results[n] = None
                continue
            med = float(np.median(dts))
            results[n] = med
            results["spread"] = max(dts) / max(min(dts), 1e-9)
            print(f"{tag} n={n}: median {med*1e3:.0f} ms "
                  f"[{', '.join(f'{t*1e3:.0f}' for t in dts)}]", flush=True)
        if results.get(8) and results.get(32):
            marg = 24 * flop_per_step / (results[32] - results[8])
            print(f"{tag}: marginal rate {marg:.0f} T(FL)OPS", flush=True)
        return results

    # Full-size grant gate: the small-probe calibration misses grants
    # that only penalize long programs or oscillate between regimes. A
    # healthy grant times the same chain within ~15% across repeats;
    # re-roll otherwise (spread makes marginal-rate subtraction garbage).
    probe = run("gate(bf16 n=8)", jnp.bfloat16, jnp.float32, ns=(8,))
    spread = probe.get("spread", 99.0)
    tries = int(os.environ.get("SMAP_PROBE_TRY", "0"))
    if spread > 1.3 and tries < 4:
        os.environ["SMAP_PROBE_TRY"] = str(tries + 1)
        os.environ["SMAP_BENCH_TRY"] = "0"
        print(f"# gate spread {spread:.2f}x > 1.3 -> oscillating grant; "
              f"re-rolling (try {tries + 1})", flush=True)
        sys.stdout.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)

    run("bf16", jnp.bfloat16, jnp.float32)
    run("int8", jnp.int8, jnp.int32)


if __name__ == "__main__":
    main()
