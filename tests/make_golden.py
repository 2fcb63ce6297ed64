"""Regenerate the golden decode corpus (tests/golden/decode_corpus.json).

The corpus is the checkpoint-parity PROXY mandated by VERDICT r2 item 5:
with no pretrained .pth and no MuPoTS data in this environment, what can
be frozen against regression is the full decode chain's exact behavior —
deterministic rendered scenes (tests/scenes.py) pushed through the
complete jitted post-processing pipeline at the reference's full 127-peak
capacity in float32 (extensions/association.cpp:20), with the resulting
poses committed to the repo. tests/test_golden.py diffs every future
run against these values, so any numerics change to NMS / PAF scoring /
association / depth chaining / back-projection is caught even though the
absolute PCK gate (reference exps/stage3_root2/test.py:115 ->
lib/eval/mupots_smap.m) cannot run here. The day real artifacts land,
run the one-command recipe in README.md ("Checkpoint-parity gate").

Run: JAX_PLATFORMS=cpu python tests/make_golden.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden", "decode_corpus.json")
# (seed, num_people) per scene: singles, pairs, a crowd, and tall-camera
SCENES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 3)]


NET_W, NET_H = 832, 512
STRIDE = 4
IMG_W, IMG_H = 1920, 1080


def _scene_inputs():
    """Yield (seed, num_people, info, out2d, paf_z, rd) per corpus scene."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from scenes import make_scene, render_outputs

    from smap_tpu.ops.postprocess import ScaleInfo

    out_w, out_h = NET_W // STRIDE, NET_H // STRIDE
    scale = min(NET_W / IMG_W, NET_H / IMG_H)
    pad_y = (NET_H - IMG_H * scale) // 2
    for seed, num_people in SCENES:
        rng = np.random.RandomState(seed)
        K, people = make_scene(rng, num_people=num_people)
        out2d, paf_z, rd = render_outputs(people, K, IMG_W, IMG_H, out_h,
                                          out_w, STRIDE, scale, 0.0, pad_y)
        info = ScaleInfo(
            scale=jnp.asarray([scale], jnp.float32),
            img_w=jnp.asarray([float(IMG_W)], jnp.float32),
            img_h=jnp.asarray([float(IMG_H)], jnp.float32),
            fx=jnp.asarray([K[0, 0]], jnp.float32),
            fy=jnp.asarray([K[1, 1]], jnp.float32),
            cx=jnp.asarray([K[0, 2]], jnp.float32),
            cy=jnp.asarray([K[1, 2]], jnp.float32))
        yield seed, num_people, info, out2d, paf_z, rd


def _record(seed, num_people, res):
    n = int(np.asarray(res.count)[0])
    return {
        "seed": seed,
        "num_people": num_people,
        "count": n,
        "bodies_2d": np.round(np.asarray(res.bodies_2d)[0, :n]
                              .astype(float), 4).tolist(),
        "bodies_3d": np.round(np.asarray(res.bodies_3d)[0, :n]
                              .astype(float), 4).tolist(),
        "root_depth": np.round(np.asarray(res.root_depth)[0, :n]
                               .astype(float), 4).tolist(),
    }


def decode_scenes():
    """Render each scene and decode it with the full jitted pipeline."""
    import jax.numpy as jnp

    from smap_tpu.config import PostProcessConfig
    from smap_tpu.ops.postprocess import postprocess_batch

    cfg = PostProcessConfig(max_peaks=127, assoc_peaks=127)
    records = []
    for seed, num_people, info, out2d, paf_z, rd in _scene_inputs():
        res = postprocess_batch(
            jnp.asarray(out2d[None]), jnp.asarray(paf_z[None]),
            jnp.asarray(rd[None]), info, cfg,
            net_w=float(NET_W), net_h=float(NET_H), stride=STRIDE)
        records.append(_record(seed, num_people, res))
    return records


def decode_variant_scenes():
    """Serving-path variants pinned alongside the base corpus
    (VERDICT r3 item 6): the capacity-8 ladder rung, the flip-TTA merged
    decode, and RefineNet-in-loop lifting.

    * "rung8": the exact post program the adaptive ladder serves typical
      scenes with (assoc_peaks=8; reference behavior at capacity 127,
      extensions/association.cpp:20, is truncation-neutral while counts
      fit — every corpus scene does).
    * "flip_tta": the reference's flip test-time augmentation
      (test.py:55-70). The flipped-forward maps are constructed as a
      perfectly L/R-equivariant network would emit them on the mirrored
      image — W-flip + FLIP_ORDER/PAF channel permutation + x-PAF sign —
      so the variant freezes flip_tta_merge's permutation/sign/halving
      numerics plus the decode of the merged (keypoints-summed) maps.
    * "refine": RefineNet lifting in the decode loop
      (test_util.py:102-131) with deterministically-seeded random MLP
      weights — freezes build_refine_input / forward / apply_refinement.
    """
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import (FLIP_ORDER, NUM_JOINTS, PAF_FLIP_CHANNEL,
                                 ROOT_IDX, PostProcessConfig, RefineNetConfig)
    from smap_tpu.models.refinenet import RefineNet
    from smap_tpu.ops.postprocess import flip_tta_merge, postprocess_batch
    from smap_tpu.ops.refine import apply_refinement, build_refine_input

    full = PostProcessConfig(max_peaks=127, assoc_peaks=127)
    rung8 = PostProcessConfig(max_peaks=127, assoc_peaks=8)

    refine_model = RefineNet(RefineNetConfig())
    refine_vars = jax.jit(refine_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, NUM_JOINTS * 5), jnp.float32))

    # x-direction PAF channels negate under mirroring (flip_tta_merge).
    nch = NUM_JOINTS + len(PAF_FLIP_CHANNEL)
    sign = np.ones((nch,), np.float32)
    for i in range(NUM_JOINTS, nch):
        if (i - NUM_JOINTS) % 2 == 0:
            sign[i] = -1.0
    perm = list(FLIP_ORDER) + [NUM_JOINTS + c for c in PAF_FLIP_CHANNEL]

    variants = {"rung8": [], "flip_tta": [], "refine": []}
    for seed, num_people, info, out2d, paf_z, rd in _scene_inputs():
        args = (jnp.asarray(out2d[None]), jnp.asarray(paf_z[None]),
                jnp.asarray(rd[None]), info)
        kw = dict(net_w=float(NET_W), net_h=float(NET_H), stride=STRIDE)

        res = postprocess_batch(*args, rung8, **kw)
        variants["rung8"].append(_record(seed, num_people, res))

        # Ideal equivariant flipped forward: net(flip(img)) =
        # flip_W((net(img) * sign)[..., perm]).
        flipped = (out2d * sign)[..., perm][:, ::-1, :]
        merged = flip_tta_merge(jnp.asarray(out2d[None]),
                                jnp.asarray(flipped[None]),
                                FLIP_ORDER, PAF_FLIP_CHANNEL)
        res = postprocess_batch(merged, jnp.asarray(paf_z[None]),
                                jnp.asarray(rd[None]), info, full, **kw)
        variants["flip_tta"].append(_record(seed, num_people, res))

        res = postprocess_batch(*args, full, **kw)

        def refine_one(b2d, b3d):
            feat = build_refine_input(b2d, b3d, root_idx=ROOT_IDX)
            pred = refine_model.apply(refine_vars, feat)
            return apply_refinement(pred, b3d, root_idx=ROOT_IDX)

        refined = jax.jit(jax.vmap(refine_one))(res.bodies_2d,
                                                res.bodies_3d)
        variants["refine"].append(
            _record(seed, num_people, res._replace(bodies_3d=refined)))
    return variants


def decode_int8_static():
    """int8-static serving pinned END TO END (VERDICT r4 item 4): the
    exact serve.py --int8-static construction (BN fold + per-channel int8
    weights + activation scales frozen from one calibration batch,
    smap_tpu/models/quantize.py) driven through the full engine —
    quantized forward -> post-processing -> back-projection — on a
    deterministic seeded model + input. The companion full-precision
    "folded" decode of the SAME weights/input rides alongside so the
    corpus itself documents the int8-vs-fp decode delta.

    Random-init weights make every heatmap pixel a local max (a synthetic
    crowd, the bench's sparsity note inverted); the decode truncates at
    the configured capacities — harsh and fully deterministic.

    Returns {"int8_static": [record], "int8_folded_ref": [record]}.
    """
    import jax
    import jax.numpy as jnp

    # The axon plugin pre-imports jax and pins 'axon,cpu' before env vars
    # are read; re-apply the CPU pin through the config API (same landmine
    # as _scene_inputs / tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import SMAPInference
    from smap_tpu.models.smap import SMAP

    input_shape, out = (64, 96), (16, 24)
    cfg = Config(model=ModelConfig(stage_num=3, output_shape=out,
                                   compute_dtype="float32"),
                 post=PostProcessConfig(max_peaks=31, assoc_peaks=8),
                 input_shape=input_shape, output_shape=out)
    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, *input_shape, 3), jnp.float32))

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (1, *input_shape, 3), np.uint8)
    scale = min(input_shape[1] / 640.0, input_shape[0] / 360.0)
    scales = [{"scale": scale, "img_width": 640.0, "img_height": 360.0,
               "f_x": 500.0, "f_y": 500.0, "cx": 320.0, "cy": 180.0}]

    out = {}
    for name, quant in (("int8_static", "static"),
                        ("int8_folded_ref", "folded")):
        engine = SMAPInference(
            variables, cfg, quantized=quant,
            calibration_batches=[img] if quant == "static" else None)
        res = engine.run_batch(img, scales)
        out[name] = [_record(5, 0, res)]
    return out


def main():
    records = decode_scenes()
    variants = decode_variant_scenes()
    variants.update(decode_int8_static())
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump({"config": "f32, max_peaks=127, assoc_peaks=127, "
                             "512x832 net, stride 4; variants: rung8 "
                             "(assoc_peaks=8), flip_tta (merged maps), "
                             "refine (seeded random RefineNet), "
                             "int8_static / int8_folded_ref (seeded "
                             "64x96 model, engine-level quantized "
                             "serving decode)",
                   "scenes": records,
                   "variants": variants}, f, indent=1)
    counts = [r["count"] for r in records]
    print(f"wrote {GOLDEN_PATH}: {len(records)} scenes, counts={counts}, "
          f"variants={sorted(variants)}")


if __name__ == "__main__":
    main()
