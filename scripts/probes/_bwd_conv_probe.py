"""Pin the train-step slowdown to the backward convolutions.

_train_decomp_probe.py found: labels 13 ms, train-mode forward+loss 65 ms
(44 TFLOPS), full step 31 s (0.3 TFLOPS), scan-4 NOT amortizing — the
backward pass itself executes ~500x under the device's conv rate. The
backward of a conv has two pieces XLA lowers as convolutions with unusual
shapes: dX (input grad: conv with spatially-reversed kernels) and dW
(filter grad: a conv whose "kernel" is the full [H, W] activation). This
probe times, at a representative production shape:

  fwd        10-conv chain forward                       (known ~58 TFLOPS)
  grad       value_and_grad of the chain (dX + dW path)
  grad_dx    grad wrt the INPUT only (isolates dX convs)
  grad_dw    grad wrt the WEIGHTS only (isolates dW convs)
  dw_gemm    the same dW computed as an explicit im2col GEMM
             (patch extraction + one matmul per conv; big-matmul draws
             run ~146 TFLOPS here, so if grad_dw is the culprit this is
             the candidate fix)

Run on TPU: python scripts/probes/_bwd_conv_probe.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

N, H, W, C = 8, 128, 208, 256
K = 3
DEPTH = 10
ITERS = 4
CONV_TFLOP = 2 * N * H * W * K * K * C * C * DEPTH / 1e12   # one pass
PEAK = 197.0


def _window(tag, run, inputs, content, tflop):
    t0 = time.perf_counter()
    jax.block_until_ready(run(inputs[0]))
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    outs = [run(x) for x in inputs[1:]]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) * 1e3 / len(outs)
    sums = [content(o) for o in outs]
    if len(set(sums)) == 1:
        print(f"{tag}: IDENTICAL outputs -> replay, unusable", flush=True)
        return None
    floor_ms = tflop / PEAK * 1e3
    if ms < floor_ms:
        print(f"{tag}: {ms:.1f} ms < {floor_ms:.1f} floor -> replay",
              flush=True)
        return None
    print(f"{tag}: {ms:.1f} ms ({tflop / (ms / 1e3):.1f} TFLOPS)",
          flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    ws = jnp.asarray(rng.randn(DEPTH, K, K, C, C).astype(np.float32)
                     * 0.02).astype(jnp.bfloat16)
    xs = [jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
          .astype(jnp.bfloat16) for _ in range(ITERS + 1)]
    jax.block_until_ready((ws, xs))

    def chain(w, x):
        def body(c, wi):
            y = jax.lax.conv_general_dilated(
                c, wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0), ()
        y, _ = jax.lax.scan(body, x, w)
        return jnp.sum(y.astype(jnp.float32))

    results = {}
    fwd = jax.jit(chain)
    results["fwd"] = _window("fwd", lambda x: fwd(ws, x), xs,
                             float, CONV_TFLOP)

    g_both = jax.jit(jax.grad(chain, argnums=(0, 1)))
    results["grad"] = _window(
        "grad", lambda x: g_both(ws, x), xs,
        lambda o: float(jnp.sum(jnp.abs(o[0].astype(jnp.float32)))),
        3 * CONV_TFLOP)

    g_dx = jax.jit(jax.grad(chain, argnums=1))
    results["grad_dx"] = _window(
        "grad_dx", lambda x: g_dx(ws, x), xs,
        lambda o: float(jnp.sum(jnp.abs(o.astype(jnp.float32)))),
        2 * CONV_TFLOP)

    g_dw = jax.jit(jax.grad(chain, argnums=0))
    results["grad_dw"] = _window(
        "grad_dw", lambda x: g_dw(ws, x), xs,
        lambda o: float(jnp.sum(jnp.abs(o.astype(jnp.float32)))),
        2 * CONV_TFLOP)

    # dW as an explicit im2col GEMM: patches [N*H*W, K*K*C] x dy
    # [N*H*W, C] -> [K*K*C, C]. One conv's worth, scaled by DEPTH in the
    # FLOP count via a scan over layers with the same x (shape-faithful).
    def dw_gemm(w, x):
        def body(c, wi):
            pad = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
            patches = jnp.stack(
                [pad[:, i:i + H, j:j + W, :]
                 for i in range(K) for j in range(K)], axis=3)
            p2 = patches.reshape(N * H * W, K * K * C)
            dy = jax.lax.conv_general_dilated(
                c, wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            dw = jnp.dot(p2.T, dy.reshape(N * H * W, C),
                         preferred_element_type=jnp.float32)
            return jnp.maximum(dy, 0), jnp.sum(jnp.abs(dw))
        y, dws = jax.lax.scan(body, x, w)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(dws)

    gemm = jax.jit(dw_gemm)
    results["dw_gemm"] = _window("dw_gemm", lambda x: gemm(ws, x), xs,
                                 float, 2 * CONV_TFLOP)

    print("RESULT", results, flush=True)


if __name__ == "__main__":
    main()
