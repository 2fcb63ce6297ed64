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


def decode_scenes():
    """Render each scene and decode it with the full jitted pipeline."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from scenes import make_scene, render_outputs

    from smap_tpu.config import PostProcessConfig
    from smap_tpu.ops.postprocess import ScaleInfo, postprocess_batch

    img_w, img_h = 1920, 1080
    net_w, net_h = 832, 512
    stride = 4
    out_w, out_h = net_w // stride, net_h // stride
    scale = min(net_w / img_w, net_h / img_h)
    pad_y = (net_h - img_h * scale) // 2
    cfg = PostProcessConfig(max_peaks=127, assoc_peaks=127)

    records = []
    for seed, num_people in SCENES:
        rng = np.random.RandomState(seed)
        K, people = make_scene(rng, num_people=num_people)
        out2d, paf_z, rd = render_outputs(people, K, img_w, img_h, out_h,
                                          out_w, stride, scale, 0.0, pad_y)
        info = ScaleInfo(
            scale=jnp.asarray([scale], jnp.float32),
            img_w=jnp.asarray([float(img_w)], jnp.float32),
            img_h=jnp.asarray([float(img_h)], jnp.float32),
            fx=jnp.asarray([K[0, 0]], jnp.float32),
            fy=jnp.asarray([K[1, 1]], jnp.float32),
            cx=jnp.asarray([K[0, 2]], jnp.float32),
            cy=jnp.asarray([K[1, 2]], jnp.float32))
        res = postprocess_batch(
            jnp.asarray(out2d[None]), jnp.asarray(paf_z[None]),
            jnp.asarray(rd[None]), info, cfg,
            net_w=float(net_w), net_h=float(net_h), stride=stride)
        n = int(np.asarray(res.count)[0])
        records.append({
            "seed": seed,
            "num_people": num_people,
            "count": n,
            "bodies_2d": np.round(np.asarray(res.bodies_2d)[0, :n]
                                  .astype(float), 4).tolist(),
            "bodies_3d": np.round(np.asarray(res.bodies_3d)[0, :n]
                                  .astype(float), 4).tolist(),
            "root_depth": np.round(np.asarray(res.root_depth)[0, :n]
                                   .astype(float), 4).tolist(),
        })
    return records


def main():
    records = decode_scenes()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump({"config": "f32, max_peaks=127, assoc_peaks=127, "
                             "512x832 net, stride 4",
                   "scenes": records}, f, indent=1)
    counts = [r["count"] for r in records]
    print(f"wrote {GOLDEN_PATH}: {len(records)} scenes, counts={counts}")


if __name__ == "__main__":
    main()
