"""Decompose the decoder/heads residual (~15.4 ms of the 60 ms forward,
docs/perf_notes.md round-4 section budget): per-stage UpsampleModule
cost split by role — the skip-generating stage-0/1 decoder, the
last-stage decoder with the infer head set, the bilinear resize chain,
and the finest-scale head block — all at the deployment shape (batch 16,
512x832 input, bf16).

Run on TPU twice: python scripts/probes/_decoder_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 6
BATCH = 16
N = 12      # dependent reps per call

OFF = (False, False, False)
LAST_HEADS = (OFF, (True, False, False), (True, False, False),
              (True, True, True))
SHAPES = [(BATCH, 16, 26, 2048), (BATCH, 32, 52, 1024),
          (BATCH, 64, 104, 512), (BATCH, 128, 208, 256)]


def measure(tag, fn, streams):
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(fn(streams[0]))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
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
    print(f"{tag}: {win_ms:.1f} ms/call ({win_ms/N:.2f} ms/op; compile "
          f"{compile_s:.0f}s)", flush=True)
    return win_ms


def decoder_chain(mode):
    """mode: 'skipgen' (stage-0/1 role: no heads, skip1/skip2 +
    cross_conv) | 'heads' (last-stage role: infer head set, no skips)."""
    from smap_tpu.models.smap import UpsampleModule

    kw = dict(output_shape=(128, 208), kpt_paf_channels=43,
              depth_channels=14, chl_num=256, dtype=jnp.bfloat16)
    if mode == "skipgen":
        mod = UpsampleModule(gen_skip=True, gen_cross_conv=True,
                             head_spec=(OFF,) * 4, **kw)
    else:
        mod = UpsampleModule(gen_skip=False, gen_cross_conv=False,
                             head_spec=LAST_HEADS, **kw)
    zs = [jnp.zeros(s, jnp.bfloat16) for s in SHAPES]
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), *zs)
    jax.block_until_ready(v)

    @jax.jit
    def run(xs):
        def step(carry, _):
            outs = mod.apply(v, *carry, train=False)
            leaves = jax.tree_util.tree_leaves(outs)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            f = (0.99 + 0.01 * jnp.tanh(s / 1e6)).astype(jnp.bfloat16)
            return tuple(x * f for x in carry), ()
        carry, _ = jax.lax.scan(step, xs, None, length=N)
        return jnp.sum(carry[0].astype(jnp.float32))

    return run


def resize_chain():
    """The decoder's 256-ch align_corners resize ladder alone:
    (16,26) -> (32,52) -> (64,104) -> (128,208)."""
    from smap_tpu.models.layers import resize_bilinear

    @jax.jit
    def run(x):
        def step(c, _):
            y = resize_bilinear(c, (32, 52))
            y = resize_bilinear(y, (64, 104))
            y = resize_bilinear(y, (128, 208))
            f = (0.99 + 0.01 * jnp.tanh(jnp.mean(y.astype(jnp.float32))
                                        / 1e2)).astype(c.dtype)
            return c * f, ()
        c, _ = jax.lax.scan(step, x, None, length=N)
        return jnp.sum(c.astype(jnp.float32))

    return run


def head_block(rng):
    """Unit-3's three heads at the finest scale: per head 1x1 256->256
    (+BN-affine+relu folded into init'd consts) then 3x3 256->{43,14,1};
    measured as raw convs (BN affine is XLA-fused anyway)."""
    ws = {}
    for name, ch in (("res", 43), ("res_d", 14), ("res_rd", 1)):
        ws[name] = (
            jax.device_put((rng.randn(1, 1, 256, 256) * 0.05)
                           .astype(jnp.bfloat16)),
            jax.device_put((rng.randn(3, 3, 256, ch) * 0.05)
                           .astype(jnp.bfloat16)))

    @jax.jit
    def run(x):
        def step(c, _):
            acc = 0.0
            for w1, w2 in ws.values():
                h = jax.lax.conv_general_dilated(
                    c, w1, (1, 1), [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jnp.maximum(h, 0.0)
                h = jax.lax.conv_general_dilated(
                    h, w2, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                acc = acc + jnp.sum(h.astype(jnp.float32))
            f = (0.99 + 0.01 * jnp.tanh(acc / 1e6)).astype(c.dtype)
            return c * f, ()
        c, _ = jax.lax.scan(step, x, None, length=N)
        return jnp.sum(c.astype(jnp.float32))

    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    results = {}

    # Full-decoder variants (the flax modules themselves). Streams are
    # (x4, x3, x2, x1) tuples; ~409 MB each.
    streams = [tuple(jax.device_put(rng.randn(*s).astype(jnp.bfloat16))
                     for s in SHAPES) for _ in range(ITERS + 1)]
    jax.block_until_ready(streams)
    for mode in ("skipgen", "heads"):
        results[f"dec {mode}"] = measure(
            f"decoder {mode} x{N}", decoder_chain(mode), streams)
    del streams

    xs = [jax.device_put(rng.randn(BATCH, 16, 26, 256).astype(jnp.bfloat16))
          for _ in range(ITERS + 1)]
    jax.block_until_ready(xs)
    results["resize chain"] = measure(f"resize chain x{N}", resize_chain(),
                                      xs)
    del xs

    xf = [jax.device_put(rng.randn(BATCH, 128, 208, 256)
                         .astype(jnp.bfloat16)) for _ in range(ITERS + 1)]
    jax.block_until_ready(xf)
    results["head block"] = measure(f"unit3 3-head block x{N}",
                                    head_block(rng), xf)
    del xf

    acct = {}
    if results.get("dec skipgen"):
        acct["dec skipgen x2"] = round(results["dec skipgen"] / N * 2, 1)
    if results.get("dec heads"):
        acct["dec heads x1"] = round(results["dec heads"] / N, 1)
    print("SECTION_ACCOUNT(ms in model)", acct, flush=True)
    print("RESULT", {k: (round(v / N, 2) if v else None)
                     for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
