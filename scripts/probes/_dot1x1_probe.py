"""A/B: 1x1 convolutions as conv ops vs explicit dot_general (MXU path).

Motivation (VERDICT r4 conv-ceiling attack): ~47% of the SMAP forward's
FLOPs are 1x1 convolutions (the ResNet bottleneck 1x1s + decoder
u_skip/up_conv), and the measured conv-lowering rate on this runtime is
~58 TFLOPS while plain big matmuls reach ~146 (docs/perf_notes.md
round-3 item 2). A 1x1/stride-1 conv IS a matmul over the collapsed
[B*H*W, Cin] rows; if expressing it as a dot inherits the matmul rate,
the forward gains up to ~1.4x. This probe measures dependent chains of
the network's real bottleneck shapes in both formulations, plus the 3x3
control and a d=4096 matmul reference, windowed with distinct inputs and
content-verified (replay-state rules, perf_notes round-3 item 3).

Run on TPU twice (separate grants): python scripts/probes/_dot1x1_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0
ITERS = 6
# Bottleneck 1x1 pairs (down Cin->Cmid, up Cmid->Cin) at the network's
# real spatial/channel shapes, batch 16.
SHAPES = [
    # (tag, H, W, Cin, Cmid, n_pairs)
    ("L1 128x208 256<->64", 128, 208, 256, 64, 40),
    ("L3 32x52 1024<->256", 32, 52, 1024, 256, 40),
    ("u_skip 16x26 2048<->512", 16, 26, 2048, 512, 40),
]
BATCH = 16


def chain_fn(kind, w_down, w_up, n):
    """Dependent chain of (down, up, residual) 1x1 pairs."""

    def pair_conv(x):
        y = jax.lax.conv_general_dilated(
            x, w_down, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        z = jax.lax.conv_general_dilated(
            y, w_up, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + 0.01 * z

    def pair_dot(x):
        # 1x1 conv == matmul over collapsed rows; keep it 2D so the
        # matmul emitter sees one big [B*H*W, C] @ [C, C'] dot.
        b, h, w, c = x.shape
        rows = x.reshape(b * h * w, c)
        y = rows @ w_down[0, 0]
        z = y @ w_up[0, 0]
        return x + 0.01 * z.reshape(b, h, w, c)

    body = pair_conv if kind == "conv" else pair_dot

    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), ()
        y, _ = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    return run


def measure(tag, fn, streams, tflop_per_call):
    min_ms = tflop_per_call / PEAK_TFLOPS * 1e3
    t0 = time.perf_counter()
    jax.block_until_ready(fn(streams[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(streams[i + 1]) for i in range(ITERS)]
    jax.block_until_ready(outs)
    win_ms = (time.perf_counter() - t0) * 1e3 / ITERS
    sums = [float(o) for o in outs]
    if len(set(sums)) == 1:
        print(f"{tag}: IDENTICAL outputs -> replay, unusable", flush=True)
        return None
    if win_ms < min_ms:
        print(f"{tag}: {win_ms:.1f} ms < {min_ms:.1f} floor -> replay, "
              f"unusable", flush=True)
        return None
    tflops = tflop_per_call / (win_ms / 1e3)
    print(f"{tag}: {win_ms:.1f} ms/call ({tflops:.1f} TFLOPS, "
          f"{tflops/PEAK_TFLOPS:.0%} MFU; compile {compile_s:.0f}s)",
          flush=True)
    return tflops


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    results = {}

    # Matmul reference: healthy draws ~146 TFLOPS (perf_notes item 2).
    d, nmm = 4096, 64
    wmm = jax.device_put((rng.randn(d, d) * 0.02).astype(jnp.bfloat16))

    @jax.jit
    def mm_chain(x):
        def step(c, _):
            return jnp.tanh(c @ wmm), ()
        y, _ = jax.lax.scan(step, x, None, length=nmm)
        return jnp.sum(y.astype(jnp.float32))

    mm_streams = [jax.device_put(rng.randn(d, d).astype(jnp.bfloat16))
                  for _ in range(ITERS + 1)]
    jax.block_until_ready(mm_streams)
    results["matmul d=4096"] = measure(
        "matmul d=4096", mm_chain, mm_streams,
        2 * d * d * d * nmm / 1e12)

    for tag, h, w, cin, cmid, n in SHAPES:
        w_down = jax.device_put(
            (rng.randn(1, 1, cin, cmid) * 0.05).astype(jnp.bfloat16))
        w_up = jax.device_put(
            (rng.randn(1, 1, cmid, cin) * 0.05).astype(jnp.bfloat16))
        streams = [jax.device_put(
            rng.randn(BATCH, h, w, cin).astype(jnp.bfloat16))
            for _ in range(ITERS + 1)]
        jax.block_until_ready(streams)
        tflop = 2 * BATCH * h * w * (cin * cmid * 2) * n / 1e12
        for kind in ("conv", "dot"):
            fn = chain_fn(kind, w_down, w_up, n)
            results[f"{tag} {kind}"] = measure(f"{tag} {kind}", fn,
                                               streams, tflop)
        del streams

    # 3x3 control at the bottleneck's conv2 shape.
    h, w, c, n = 128, 208, 64, 40
    w33 = jax.device_put((rng.randn(3, 3, c, c) * 0.05).astype(jnp.bfloat16))

    @jax.jit
    def c33_chain(x):
        def step(cr, _):
            y = jax.lax.conv_general_dilated(
                cr, w33, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return cr + 0.01 * y, ()
        y, _ = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    streams = [jax.device_put(rng.randn(BATCH, h, w, c).astype(jnp.bfloat16))
               for _ in range(ITERS + 1)]
    jax.block_until_ready(streams)
    results["3x3 64ch control"] = measure(
        "3x3 64ch control", c33_chain, streams,
        2 * BATCH * h * w * 9 * c * c * n / 1e12)

    print("RESULT", {k: (round(v, 1) if v else None)
                     for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
