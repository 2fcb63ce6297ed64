"""Post-training int8 quantization for the serving forward (opt-in).

TPU-native serving accelerator with no reference analogue (the reference
serves fp32 torch, exps/stage3_root2/test.py): the v5e MXU runs int8 at
394 TOPS — 2x its bf16 rate — so an int8 forward roughly halves the
dominant serving-compute term. The scheme is standard dynamic
post-training quantization, arranged for XLA fusion:

* BatchNorm is FOLDED into each conv's kernel/bias (inference-only;
  running stats), removing BN from the graph entirely.
* Weights: per-output-channel symmetric int8 (scale = absmax/127),
  computed ONCE here — not per call — so no HBM pass over the 160 MB
  parameter set at serving time.
* Activations: per-tensor dynamic symmetric int8 computed on device
  inside the jit (one absmax reduction + round per conv input; XLA
  fuses these into the surrounding elementwise work).
* The conv itself runs int8 x int8 -> int32 on the MXU
  (lax.conv_general_dilated with preferred_element_type=int32), then
  dequantizes with the folded scales and adds the folded bias.

Use: ``qvars = quantize_variables(variables)`` and run a model built
with ``ModelConfig(quantized=True)`` — or simply
``SMAPInference(variables, cfg, quantized=True)`` which does both.
Accuracy: weights keep 8 bits per channel and activations ~7 effective
bits; tests/test_quantize.py pins the map-level error and the engine
path. This mode intentionally trades exact reference parity for speed —
it is NOT used by parity tests or the golden corpus.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

BN_EPS = 1e-5   # matches nn.BatchNorm epsilon in smap_tpu.models.layers


def _fold_and_quantize_conv(conv: Dict[str, Any], bn: Dict[str, Any],
                            bn_stats: Dict[str, Any]) -> Dict[str, Any]:
    kernel = conv["kernel"].astype(jnp.float32)
    bias = conv["bias"].astype(jnp.float32)
    if bn is not None:
        inv = bn["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
        kernel = kernel * inv            # broadcasts over [kh,kw,ci,co]
        bias = bn["bias"] + (bias - bn_stats["mean"]) * inv
    scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                        1e-8) / 127.0    # per-output-channel
    kq = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": kq, "kernel_scale": scale.astype(jnp.float32),
            "bias": bias.astype(jnp.float32)}


def quantize_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """f32 SMAP variables -> int8 serving variables (BN folded away).

    Walks the Flax tree; every ``{"conv": {kernel, bias}[, "bn": ...]}``
    block becomes ``{"conv": {kernel_q, kernel_scale, bias}}``. The
    result has only a "params" collection (batch_stats are consumed by
    the fold).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        s = s if isinstance(s, dict) else {}
        if "conv" in p and isinstance(p["conv"], dict) \
                and "kernel" in p["conv"]:
            # This node IS a ConvBnRelu block (conv + optional bn).
            return {"conv": _fold_and_quantize_conv(
                p["conv"], p.get("bn"), s.get("bn"))}
        return {k: walk(v, s.get(k, {})) if isinstance(v, dict) else v
                for k, v in p.items()}

    return {"params": walk(params, stats)}
