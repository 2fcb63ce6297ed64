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
  fuses these into the surrounding elementwise work) — OR frozen
  per-conv scales from :func:`calibrate_activation_scales`
  (``ModelConfig(quantized="static")``), which removes every per-call
  reduction from the serving graph at the cost of clipping inputs that
  exceed the calibration range.
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

import dataclasses
from typing import Any, Dict, Iterable, Union

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5   # matches nn.BatchNorm epsilon in smap_tpu.models.layers


def _fold_conv(conv: Dict[str, Any], bn: Dict[str, Any],
               bn_stats: Dict[str, Any]):
    """Fold inference BatchNorm (running stats) into (kernel, bias), f32."""
    kernel = conv["kernel"].astype(jnp.float32)
    bias = conv["bias"].astype(jnp.float32)
    if bn is not None:
        inv = bn["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
        kernel = kernel * inv            # broadcasts over [kh,kw,ci,co]
        bias = bn["bias"] + (bias - bn_stats["mean"]) * inv
    return kernel, bias


def _fold_and_quantize_conv(conv: Dict[str, Any], bn: Dict[str, Any],
                            bn_stats: Dict[str, Any]) -> Dict[str, Any]:
    kernel, bias = _fold_conv(conv, bn, bn_stats)
    scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                        1e-8) / 127.0    # per-output-channel
    kq = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": kq, "kernel_scale": scale.astype(jnp.float32),
            "bias": bias.astype(jnp.float32)}


def fold_bn_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """f32 SMAP variables -> BN-folded full-precision serving variables.

    The bf16 counterpart of :func:`quantize_variables`: every
    ``{"conv": {kernel, bias}[, "bn": ...]}`` block becomes
    ``{"conv": {kernel, bias}}`` with the inference BatchNorm affine
    folded in; batch_stats are consumed. The result runs under
    ``ModelConfig(quantized="folded")`` — the serving mode whose eligible
    bottleneck blocks execute as the fused Pallas kernel
    (smap_tpu.ops.fused_block), which requires BN-free conv+bias blocks.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        s = s if isinstance(s, dict) else {}
        if "conv" in p and isinstance(p["conv"], dict) \
                and "kernel" in p["conv"]:
            kernel, bias = _fold_conv(p["conv"], p.get("bn"), s.get("bn"))
            return {"conv": {"kernel": kernel, "bias": bias}}
        return {k: walk(v, s.get(k, {})) if isinstance(v, dict) else v
                for k, v in p.items()}

    return {"params": walk(params, stats)}


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


def check_static_scales(variables: Dict[str, Any]) -> None:
    """Reject uncalibrated static-int8 variables loudly.

    A static model built from ``model.init`` (or from
    :func:`quantize_variables` without :func:`calibrate_activation_scales`)
    carries the 0-sentinel / missing ``act_scale`` and would otherwise
    serve garbage silently. Called by ``SMAPInference`` before serving
    ``quantized="static"`` variables.
    """
    bad, found = [], [0]

    def walk(p, path):
        for k, v in p.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == "act_scale":
                found[0] += 1
                a = np.asarray(v)
                if not np.all(np.isfinite(a)) or np.any(a <= 0):
                    bad.append("/".join(path))

    walk(variables["params"], ())
    if not found[0]:
        raise ValueError(
            "static-int8 variables carry no act_scale parameters; run "
            "quantize.calibrate_activation_scales on them first")
    if bad:
        raise ValueError(
            f"static-int8 act_scale is non-positive/non-finite (i.e. "
            f"uncalibrated) for conv blocks: {bad[:5]}"
            f"{' ...' if len(bad) > 5 else ''}; run "
            f"quantize.calibrate_activation_scales on these variables")


def calibrate_activation_scales(qvars: Dict[str, Any], model_cfg,
                                batches: Union[Iterable, Any],
                                ) -> Dict[str, Any]:
    """Freeze per-conv activation scales from calibration batches.

    Runs the DYNAMIC-quant serving graph (``SMAP.infer``) over the given
    preprocessed f32 image batches with the ``intermediates`` collection
    mutable — each conv sows its observed activation abs-max
    (`smap_tpu.models.layers.Conv2D`) — takes the elementwise max across
    batches, and writes ``act_scale = max(absmax, 1e-6) / 127`` into each
    conv's parameter block. The result runs under
    ``ModelConfig(quantized="static")``: free of the per-conv abs-max
    reductions that serialize between convs at serving time
    (docs/perf_notes.md round-3 item 9). With a SINGLE calibration batch
    the static graph is bit-identical to the dynamic graph on that batch
    (each frozen scale equals the dynamic per-call scale); with multiple
    batches the frozen scale is the max ACROSS batches, so static outputs
    on any one batch differ slightly from that batch's own dynamic run.
    Inputs hotter than the calibration range clip at +-127 (standard
    post-training static quantization behavior); calibrate on
    representative frames.

    Args:
      qvars: output of :func:`quantize_variables`.
      model_cfg: the ``ModelConfig`` of the model being served (its
        ``quantized`` field is overridden internally).
      batches: one [B, H, W, 3] float32 array (already normalized — the
        serving engine's device-side normalization applied) or an
        iterable of them.

    Returns:
      New variables dict for the ``quantized="static"`` model. Convs the
      serving graph never executes (statically masked heads) carry no
      ``act_scale`` — the static graph never reads them either.
    """
    import jax

    from smap_tpu.models.smap import SMAP

    model = SMAP(dataclasses.replace(model_cfg, quantized=True))

    @jax.jit
    def smap_calibration_forward(v, x):
        _, mut = model.apply(v, x, method=SMAP.infer,
                             mutable=["intermediates"])
        return mut["intermediates"]

    if isinstance(batches, (np.ndarray, jnp.ndarray)):
        batches = [batches]
    agg = None
    for x in batches:
        inter = jax.device_get(
            smap_calibration_forward(qvars, jnp.asarray(x, jnp.float32)))
        agg = inter if agg is None else jax.tree.map(np.maximum, agg, inter)
    if agg is None:
        raise ValueError("calibration needs at least one batch")

    def walk(p, i):
        i = i if isinstance(i, dict) else {}
        if "kernel_q" in p:
            out = dict(p)
            absmax = i.get("act_absmax")
            if absmax is not None:
                if isinstance(absmax, (tuple, list)):   # sow default: tuple
                    # Max over ALL sow entries: a module applied more than
                    # once per forward (e.g. shared weights or an in-graph
                    # flip) sows one absmax per call, and dropping the
                    # later ones would under-calibrate that conv.
                    absmax = np.max([np.float32(a) for a in absmax])
                # Same op chain (and dtypes) as the dynamic graph's s_x in
                # layers.Conv2D — f32 max then multiply-by-reciprocal — so
                # single-batch calibration reproduces the dynamic scale
                # bit-exactly.
                out["act_scale"] = jnp.asarray(
                    np.maximum(np.float32(absmax), np.float32(1e-6))
                    * np.float32(1.0 / 127.0), jnp.float32)
            return out
        return {k: walk(v, i.get(k, {})) if isinstance(v, dict) else v
                for k, v in p.items()}

    return {"params": walk(qvars["params"], agg)}
