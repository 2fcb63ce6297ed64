"""A/B: fused Pallas bottleneck (ops/fused_block) vs unfused XLA convs.

Motivation (perf_notes round-4): the layer1-shape bottlenecks are
HBM-bandwidth-bound at ~16 TFLOPS unfused (the 218 MB 256-ch activation
crosses HBM ~4.5x per block). The fused kernel keeps the block's
intermediates in VMEM — one read of x, one write of the output. This
probe measures, windowed with distinct inputs + content verification:

1. chained layer1-shape bottleneck blocks, fused vs unfused;
2. the FULL SMAP.infer forward (512x832, 3 stages, batch 16), plain
   bf16 vs quantized="folded" (BN-folded + fused layer1) — the number
   VERDICT r3 item 2 asks for (target <=50 ms/batch-16).

Run on TPU twice (separate grants): python scripts/probes/_fused_block_probe.py
"""

import functools
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
BATCH = 16
FWD_TFLOP = 5.018       # full infer program, batch 16 (_flops_probe.py)


def measure(tag, fn, streams, tflop_per_call):
    min_ms = tflop_per_call / PEAK_TFLOPS * 1e3
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(fn(streams[0]))
    except Exception as e:  # e.g. Mosaic VMEM OOM on a variant
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
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
    return win_ms


def block_chain(rng, n, cin, cm, fused, tile_rows=8, im2col=True):
    """Dependent chain of identity bottlenecks (cin->cm->cm(3x3)->cin +
    residual), fused Pallas vs the pure-jnp oracle chain (identical op
    set — the A/B isolates HBM traffic)."""
    from smap_tpu.ops.fused_block import bottleneck_reference, fused_bottleneck

    params = [jax.device_put(p) for p in (
        (rng.randn(cin, cm) * 0.05).astype(np.float32),
        (rng.randn(cm) * 0.01).astype(np.float32),
        (rng.randn(3, 3, cm, cm) * 0.05).astype(np.float32),
        (rng.randn(cm) * 0.01).astype(np.float32),
        (rng.randn(cm, cin) * 0.05).astype(np.float32),
        (rng.randn(cin) * 0.01).astype(np.float32),
    )]
    if fused:
        body = functools.partial(fused_bottleneck, tile_rows=tile_rows,
                                 im2col=im2col)
    else:
        body = bottleneck_reference

    @jax.jit
    def run(x):
        def step(c, _):
            return body(c, *params).astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(step, x.astype(jnp.bfloat16), None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    return run


def stem_chain(rng, n, impl="conv"):
    """Dependent repetitions of the stem conv (7x7/2, 3->64) + 3x3/2
    maxpool at 512x832 — shape changes, so feed a scalar of the output
    back into the input to keep iterations dependent. impl: "conv"
    (direct lowering) | "s2d" (layers.s2d_conv7x7s2)."""
    from smap_tpu.models.layers import s2d_conv7x7s2

    w = jax.device_put((rng.randn(7, 7, 3, 64) * 0.05).astype(jnp.bfloat16))

    @jax.jit
    def run(x):
        def step(c, _):
            if impl == "s2d":
                y = s2d_conv7x7s2(c, w)
            else:
                y = jax.lax.conv_general_dilated(
                    c, w, (2, 2), [(3, 3), (3, 3)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
            return c * (0.99 + 0.01 * jnp.tanh(jnp.mean(
                y.astype(jnp.float32)).astype(jnp.bfloat16))), ()
        y, _ = jax.lax.scan(step, x.astype(jnp.bfloat16), None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    return run


def full_forward(folded):
    import dataclasses

    from smap_tpu.config import Config
    from smap_tpu.models.quantize import fold_bn_variables
    from smap_tpu.models.smap import SMAP

    cfg = Config()
    mcfg = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    model = SMAP(mcfg)
    x0 = jnp.zeros((BATCH, *cfg.input_shape, 3), jnp.bfloat16)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    if folded:
        v = jax.jit(fold_bn_variables)(v)
        model = SMAP(dataclasses.replace(mcfg, quantized="folded"))

    # v as an ARGUMENT, not a closure constant: captured arrays embed in
    # the HLO and the ~160 MB upload blows the relay's request limit.
    @jax.jit
    def fwd(v, x):
        outs = model.apply(v, x, method=SMAP.infer)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    return (lambda x: fwd(v, x)), cfg.input_shape


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    results = {}

    # 1. Per-section bottom-up budget: one identity block chained, at each
    # ResNet layer's real shape. n_model = blocks of that shape in the
    # 3-stage model (3 stages x layer depth, minus the 3 downsample
    # blocks whose cost is close enough to the identity ones).
    n = 12
    sections = [
        # tag, h, w, cin, cm, n_model
        ("L1 128x208 256/64", 128, 208, 256, 64, 9),
        ("L2 64x104 512/128", 64, 104, 512, 128, 12),
        ("L3 32x52 1024/256", 32, 52, 1024, 256, 18),
        ("L4 16x26 2048/512", 16, 26, 2048, 512, 9),
    ]
    for tag, h, w, cin, cm, _ in sections:
        tflop = 2 * BATCH * h * w * cm * (cin + 9 * cm + cin) * n / 1e12
        streams = [jax.device_put(rng.randn(BATCH, h, w, cin)
                                  .astype(jnp.bfloat16))
                   for _ in range(ITERS + 1)]
        jax.block_until_ready(streams)
        results[f"{tag} unfused"] = measure(
            f"{tag} unfused x{n}", block_chain(rng, n, cin, cm, False),
            streams, tflop)
        if tag.startswith("L1"):
            # Best fused variant from the g2 sweep (t8m 28.5 / t8i 25.6 /
            # t16i 25.1 ms vs 17.0 unfused; t16m VMEM-OOMs) — re-certify
            # only t16i here.
            for tile, i2c in ((16, True),):
                vtag = f"{tag} fused t{tile}{'i' if i2c else 'm'}"
                results[vtag] = measure(
                    vtag, block_chain(rng, n, cin, cm, True, tile, i2c),
                    streams, tflop)
        del streams

    # 2. Stem (7x7/2 conv + maxpool at 512x832x3).
    n_stem = 12
    streams = [jax.device_put(rng.randn(BATCH, 512, 832, 3)
                              .astype(jnp.bfloat16))
               for _ in range(ITERS + 1)]
    jax.block_until_ready(streams)
    stem_tflop = 2 * BATCH * 256 * 416 * 49 * 3 * 64 * n_stem / 1e12
    for impl in ("conv", "s2d"):
        results[f"stem {impl}"] = measure(
            f"stem {impl} x{n_stem}", stem_chain(rng, n_stem, impl),
            streams, stem_tflop)
    del streams

    # 3. Full forward, plain vs folded (compile-heavy; last).
    for folded in (False, True):
        run, in_shape = full_forward(folded)
        streams = [jax.device_put(rng.randn(BATCH, *in_shape, 3)
                                  .astype(jnp.bfloat16))
                   for _ in range(ITERS + 1)]
        jax.block_until_ready(streams)
        tag = f"full infer b16 {'folded' if folded else 'plain'}"
        results[tag] = measure(tag, run, streams, FWD_TFLOP)
        del streams

    # Bottom-up accounting: ms attributable to each section in the model.
    acct = {}
    for tag, h, w, cin, cm, n_model in sections:
        ms = results.get(f"{tag} unfused")
        if ms:
            acct[tag] = round(ms / n * n_model, 1)
    # The stem runs ONCE per forward (SMAP.__call__ chains stages via
    # cross_conv), so its in-model attribution is x1.
    for impl in ("conv", "s2d"):
        if results.get(f"stem {impl}"):
            acct[f"stem {impl}"] = round(results[f"stem {impl}"] / n_stem, 1)
    print("SECTION_ACCOUNT(ms in model)", acct, flush=True)
    print("RESULT", {k: (round(v, 1) if v else None)
                     for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
