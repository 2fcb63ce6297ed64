"""Integration tests: full jitted post-processing pipeline and inference API."""

import dataclasses

import numpy as np
import pytest

from oracle import (associate_oracle, gen_3d_pose_oracle, generate_relz_oracle,
                    nms_oracle, paf_score_oracle)
from test_ops import _synthetic_heatmaps


def _scale_info(scales):
    import jax.numpy as jnp
    from smap_tpu.ops.postprocess import ScaleInfo

    return ScaleInfo(
        scale=jnp.asarray([s["scale"] for s in scales], jnp.float32),
        img_w=jnp.asarray([s["img_width"] for s in scales], jnp.float32),
        img_h=jnp.asarray([s["img_height"] for s in scales], jnp.float32),
        fx=jnp.asarray([s["f_x"] for s in scales], jnp.float32),
        fy=jnp.asarray([s["f_y"] for s in scales], jnp.float32),
        cx=jnp.asarray([s["cx"] for s in scales], jnp.float32),
        cy=jnp.asarray([s["cy"] for s in scales], jnp.float32))


def test_postprocess_batch_matches_oracle_chain(rng):
    import cv2
    import jax.numpy as jnp

    from smap_tpu.config import PostProcessConfig
    from smap_tpu.ops.postprocess import postprocess_batch

    H, W = 64, 104
    stride = 4
    net_h, net_w = H * stride, W * stride
    batch = 2
    cfg = PostProcessConfig(max_peaks=31)

    out2d = np.zeros((batch, H, W, 43), np.float32)
    out3d = np.zeros((batch, H, W, 14), np.float32)
    outrd = np.zeros((batch, H, W, 1), np.float32)
    scales = []
    for b in range(batch):
        hm, pafs, rdm, _, _ = _synthetic_heatmaps(
            np.random.RandomState(10 + b), num_people=3, h=H, w=W)
        # network-scale maps: heatmaps x255, PAF xy x127 (see test.py:111-112)
        out2d[b, ..., :15] = hm.transpose(1, 2, 0) * 255.0
        out2d[b, ..., 15:] = pafs.transpose(1, 2, 0) * 127.0
        out3d[b] = np.random.RandomState(20 + b).randn(H, W, 14) * 3
        outrd[b, ..., 0] = rdm
        scales.append({"scale": min(net_w / 1920, net_h / 1080),
                       "img_width": 1920.0, "img_height": 1080.0,
                       "net_width": float(net_w), "net_height": float(net_h),
                       "f_x": 1500.0, "f_y": 1490.0,
                       "cx": 960.0, "cy": 540.0})

    res = postprocess_batch(jnp.asarray(out2d), jnp.asarray(out3d),
                            jnp.asarray(outrd), _scale_info(scales), cfg,
                            net_w=float(net_w), net_h=float(net_h),
                            stride=stride)

    for b in range(batch):
        hm = out2d[b, ..., :15].transpose(2, 0, 1) / 255.0
        pafs = out2d[b, ..., 15:].transpose(2, 0, 1) / 127.0
        rdm = outrd[b, ..., 0]
        ref_peaks, ref_counts = nms_oracle(hm, max_peaks=31)
        ref_table = paf_score_oracle(pafs, ref_peaks, ref_counts, max_peaks=31)
        ref_bodies, _ = associate_oracle(ref_peaks, ref_counts, ref_table, rdm)
        n = int(np.asarray(res.count)[b])
        assert n == len(ref_bodies)
        if n == 0:
            continue
        ref_bodies = ref_bodies.copy()
        ref_bodies[:, :, :2] *= stride
        paf_up = cv2.resize(out3d[b], (net_w, net_h),
                            interpolation=cv2.INTER_NEAREST)
        rd_up = cv2.resize(rdm, (net_w, net_h),
                           interpolation=cv2.INTER_NEAREST)
        ref_roots = generate_relz_oracle(ref_bodies, paf_up, rd_up, scales[b])
        ref_3d = gen_3d_pose_oracle(ref_bodies, ref_roots, scales[b])

        got2d = np.asarray(res.bodies_2d)[b, :n]
        got3d = np.asarray(res.bodies_3d)[b, :n]
        np.testing.assert_allclose(got2d, ref_bodies, atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.root_depth)[b, :n],
                                   ref_roots, rtol=1e-4)
        np.testing.assert_allclose(got3d, ref_3d, atol=5e-3, rtol=1e-3)


def test_flip_tta_merge_matches_reference_loop(rng):
    import jax.numpy as jnp

    from smap_tpu.config import FLIP_ORDER, PAF_FLIP_CHANNEL
    from smap_tpu.ops.postprocess import flip_tta_merge

    B, H, W, C = 2, 8, 12, 43
    kpt_num = 15
    out = rng.randn(B, C, H, W).astype(np.float32)
    out_flip = rng.randn(B, C, H, W).astype(np.float32)

    # Reference loop (test.py:58-70), NCHW.
    ref = out.copy()
    flipped = out_flip[:, :, :, ::-1]
    pair = list(FLIP_ORDER) + [c + kpt_num for c in PAF_FLIP_CHANNEL]
    for i in range(len(pair)):
        if i >= kpt_num and (i - kpt_num) % 2 == 0:
            ref[:, i] += flipped[:, pair[i]] * -1
        else:
            ref[:, i] += flipped[:, pair[i]]
    ref[:, kpt_num:] *= 0.5

    got = flip_tta_merge(
        jnp.asarray(out.transpose(0, 2, 3, 1)),
        jnp.asarray(out_flip.transpose(0, 2, 3, 1)),
        FLIP_ORDER, PAF_FLIP_CHANNEL)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_inference_smoke(tmp_path, rng):
    """Random-weight end-to-end: images dir -> result JSON structure."""
    import cv2
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import run_inference
    from smap_tpu.models.smap import SMAP

    cfg = Config(model=ModelConfig(output_shape=(64, 104),
                                   compute_dtype="float32"),
                 post=PostProcessConfig(max_peaks=31),
                 input_shape=(256, 416), output_shape=(64, 104))
    model = SMAP(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 416, 3), jnp.float32))

    for i in range(3):
        img = (rng.rand(300, 500, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"img{i}.jpg"), img)

    result = run_inference(str(tmp_path), variables, cfg, batch_size=2)
    assert result["model_pattern"] == "MIX"
    assert len(result["3d_pairs"]) == 3
    for pair in result["3d_pairs"]:
        assert set(pair) >= {"pred_2d", "pred_3d", "root_d", "image_path"}
        n = len(pair["pred_2d"])
        assert len(pair["pred_3d"]) == n
        for person in pair["pred_3d"]:
            assert len(person) == 15 and len(person[0]) == 4


@pytest.mark.slow
def test_uint8_input_matches_host_normalized(rng):
    """Feeding letterboxed uint8 (device-side normalize, the serving path)
    must match host-side normalize_image + f32 feed."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.data.preprocess import normalize_image
    from smap_tpu.inference import SMAPInference

    cfg = Config(model=ModelConfig(stage_num=1, output_shape=(16, 32),
                                   compute_dtype="float32"),
                 post=PostProcessConfig(max_peaks=15),
                 input_shape=(64, 128), output_shape=(16, 32))
    from smap_tpu.models.smap import SMAP

    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 128, 3), jnp.float32))
    engine = SMAPInference(variables, cfg)

    u8 = (rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
    f32 = np.stack([normalize_image(im) for im in u8])
    maps_u8 = engine._jit_forward(variables, jnp.asarray(u8))
    maps_f32 = engine._jit_forward(variables, jnp.asarray(f32))
    # Host and device normalize differ by ~1 ulp on the inputs; map outputs
    # scale with the x255/x127 label encoding, so allow amplified fp noise.
    for a, b in zip(maps_u8, maps_f32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=0)


def test_i420_to_bgr_matches_cv2(rng):
    """Device I420 -> BGR conversion matches cv2.cvtColor(YUV2BGR_I420)
    within +-1 uint8 step (float math vs cv2's fixed-point rounding)."""
    import cv2
    import jax.numpy as jnp

    from smap_tpu.data.preprocess import bgr_to_i420, i420_to_bgr

    bgr = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    packed = bgr_to_i420(bgr)
    assert packed.shape == (96, 96)
    ref = cv2.cvtColor(packed, cv2.COLOR_YUV2BGR_I420).astype(np.int32)
    got = np.asarray(jnp.round(i420_to_bgr(jnp.asarray(packed)))
                     ).astype(np.int32)
    assert np.abs(got - ref).max() <= 1


def test_i420_input_matches_bgr_path(rng):
    """Feeding packed I420 (the video-serving wire format) must match the
    uint8-BGR path on the same decoded frames up to the +-1 conversion
    rounding."""
    import cv2
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.data.preprocess import bgr_to_i420
    from smap_tpu.inference import SMAPInference

    cfg = Config(model=ModelConfig(stage_num=1, output_shape=(16, 32),
                                   compute_dtype="float32"),
                 post=PostProcessConfig(max_peaks=15),
                 input_shape=(64, 128), output_shape=(16, 32))
    from smap_tpu.models.smap import SMAP

    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 128, 3), jnp.float32))
    engine = SMAPInference(variables, cfg)

    # Chroma-smooth frames (4:2:0 is exact only for smooth chroma).
    base = (rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
    base = np.stack([cv2.GaussianBlur(im, (7, 7), 3) for im in base])
    packed = np.stack([bgr_to_i420(im) for im in base])
    # Reference: the float conversion normalized on host and fed as f32 —
    # isolates the device path's transfer+fuse exactness. (cv2's own
    # rounded-uint8 decode differs by up to one quantization step, which a
    # random-weight conv stack amplifies; cv2-consistency of the conversion
    # itself is test_i420_to_bgr_matches_cv2.)
    from smap_tpu.config import PIXEL_MEANS_BGR, PIXEL_STDS_BGR
    from smap_tpu.data.preprocess import i420_to_bgr

    host_f32 = ((np.asarray(i420_to_bgr(jnp.asarray(packed))) / 255.0
                 - np.asarray(PIXEL_MEANS_BGR, np.float32))
                / np.asarray(PIXEL_STDS_BGR, np.float32))
    maps_i420 = engine._jit_forward(variables, jnp.asarray(packed))
    maps_f32 = engine._jit_forward(variables, jnp.asarray(host_f32))
    for a, b in zip(maps_i420, maps_f32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=0)


@pytest.mark.slow
def test_inference_flip_and_refine(rng):
    """Engine with flip-TTA and RefineNet lifting enabled."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import SMAPInference
    from smap_tpu.models.refinenet import RefineNet
    from smap_tpu.models.smap import SMAP

    cfg = Config(model=ModelConfig(output_shape=(32, 52),
                                   compute_dtype="float32"),
                 post=PostProcessConfig(max_peaks=15),
                 input_shape=(128, 208), output_shape=(32, 52))
    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 208, 3), jnp.float32))
    refine = RefineNet(cfg.refine)
    refine_vars = jax.jit(lambda k, x: refine.init(k, x))(
        jax.random.PRNGKey(1), jnp.zeros((2, 75), jnp.float32))

    engine = SMAPInference(variables, cfg, refine_variables=refine_vars,
                           do_flip=True)
    imgs = rng.randn(2, 128, 208, 3).astype(np.float32)
    scales = [{"scale": 0.25, "img_width": 832.0, "img_height": 512.0,
               "f_x": 800.0, "f_y": 800.0, "cx": 416.0, "cy": 256.0}
              for _ in range(2)]
    res = engine.run_batch(imgs, scales)
    assert np.asarray(res.bodies_3d).shape == (2, 15, 15, 4)
    assert np.all(np.isfinite(np.asarray(res.bodies_3d)))
    # refined rows have score in {0, 1}
    scores = np.asarray(res.bodies_3d)[..., 3]
    assert set(np.unique(scores)).issubset({0.0, 1.0})


def test_assoc_peaks_truncation_neutral(rng):
    """assoc_peaks < max_peaks is result-identical while peak counts fit."""
    import jax.numpy as jnp

    from smap_tpu.config import PostProcessConfig
    from smap_tpu.ops.postprocess import postprocess_batch

    H, W = 64, 104
    hm, pafs, rdm, _, _ = _synthetic_heatmaps(
        np.random.RandomState(42), num_people=4, h=H, w=W)
    out2d = np.concatenate([hm.transpose(1, 2, 0) * 255.0,
                            pafs.transpose(1, 2, 0) * 127.0], -1)[None]
    out3d = np.random.RandomState(7).randn(1, H, W, 14).astype(np.float32)
    outrd = rdm[None, ..., None]
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}]
    info = _scale_info(scales)

    full = postprocess_batch(jnp.asarray(out2d), jnp.asarray(out3d),
                             jnp.asarray(outrd), info,
                             PostProcessConfig(max_peaks=127,
                                               assoc_peaks=127))
    trunc = postprocess_batch(jnp.asarray(out2d), jnp.asarray(out3d),
                              jnp.asarray(outrd), info,
                              PostProcessConfig(max_peaks=127,
                                                assoc_peaks=32))
    n = int(np.asarray(full.count)[0])
    assert n == int(np.asarray(trunc.count)[0])
    np.testing.assert_allclose(np.asarray(trunc.bodies_3d)[0, :n],
                               np.asarray(full.bodies_3d)[0, :n],
                               rtol=1e-5, atol=1e-5)
    # Nothing truncated -> no overflow on either path.
    assert not bool(np.asarray(trunc.overflow)[0])
    assert not bool(np.asarray(full.overflow)[0])


def _crowded_maps(h=64, w=104, extra_grid=6):
    """Synthetic maps where one joint channel has a dense grid of spurious
    peaks (a crowd/noise scenario exceeding small assoc_peaks caps)."""
    hm, pafs, rdm, _, _ = _synthetic_heatmaps(
        np.random.RandomState(3), num_people=3, h=h, w=w)
    # Spray isolated local maxima (3px spacing keeps each a strict 3x3 max)
    # on the head-top channel, scores below the true peaks'.
    for yy in range(30, 30 + 3 * extra_grid, 3):
        for xx in range(40, 40 + 3 * extra_grid, 3):
            if hm[1, yy - 2:yy + 3, xx - 2:xx + 3].max() < 0.3:
                hm[1, yy, xx] = 0.35
    out2d = np.concatenate([hm.transpose(1, 2, 0) * 255.0,
                            pafs.transpose(1, 2, 0) * 127.0], -1)[None]
    out3d = np.random.RandomState(8).randn(1, h, w, 14).astype(np.float32)
    outrd = rdm[None, ..., None].astype(np.float32)
    return out2d.astype(np.float32), out3d, outrd


def test_overflow_flag_on_crowded_scene():
    """>assoc_peaks peaks in one channel must raise PoseResults.overflow
    (silent-divergence guard for extensions/association.cpp:20 semantics)."""
    import jax.numpy as jnp

    from smap_tpu.config import PostProcessConfig
    from smap_tpu.ops.postprocess import postprocess_batch

    out2d, out3d, outrd = _crowded_maps()
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}]
    info = _scale_info(scales)

    trunc = postprocess_batch(jnp.asarray(out2d), jnp.asarray(out3d),
                              jnp.asarray(outrd), info,
                              PostProcessConfig(max_peaks=127, assoc_peaks=8))
    full = postprocess_batch(jnp.asarray(out2d), jnp.asarray(out3d),
                             jnp.asarray(outrd), info,
                             PostProcessConfig(max_peaks=127, assoc_peaks=127))
    assert bool(np.asarray(trunc.overflow)[0])
    assert not bool(np.asarray(full.overflow)[0])


def test_mesh_sharded_serving_matches_single_device(rng):
    """SMAPInference(mesh=...) shards the batch over the 8-device CPU mesh
    (forward + postproc per shard, params replicated) and must match the
    unsharded engine."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import SMAPInference
    from smap_tpu.parallel.mesh import make_mesh

    cfg = Config(model=ModelConfig(stage_num=1, output_shape=(16, 32),
                                   compute_dtype="float32"),
                 post=PostProcessConfig(max_peaks=15),
                 input_shape=(64, 128), output_shape=(16, 32))
    from smap_tpu.models.smap import SMAP

    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 128, 3), jnp.float32))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = SMAPInference(variables, cfg, mesh=mesh)
    plain = SMAPInference(variables, cfg)

    imgs = (rng.rand(8, 64, 128, 3) * 255).astype(np.uint8)
    scales = [{"scale": 0.25, "img_width": 512.0, "img_height": 256.0,
               "f_x": 500.0, "f_y": 500.0, "cx": 256.0, "cy": 128.0}
              for _ in range(8)]
    res_s = sharded.run_batch(imgs, scales)
    res_p = plain.run_batch(imgs, scales)
    assert int(np.asarray(res_s.count).sum()) == int(
        np.asarray(res_p.count).sum())
    np.testing.assert_allclose(np.asarray(res_s.bodies_3d),
                               np.asarray(res_p.bodies_3d),
                               rtol=1e-4, atol=1e-3)
    with pytest.raises(ValueError):
        sharded.run_batch(imgs[:5], scales[:5])

    # The serve-CLI combination: mesh sharding + adaptive ladder through
    # the pipelined run_stream (counts reduce globally across shards; the
    # rung program runs per shard).
    laddered = SMAPInference(variables, cfg, mesh=mesh,
                             adaptive_capacities=(4, 8))
    outs = list(laddered.run_stream([(imgs, scales), None, (imgs, scales)]))
    assert len(outs) == 2
    counts_p = np.asarray(res_p.count)
    for got in outs:
        counts_g = np.asarray(got.count)
        np.testing.assert_array_equal(counts_g, counts_p)
        for i, n in enumerate(counts_p.astype(int)):
            np.testing.assert_allclose(
                np.asarray(got.bodies_3d)[i, :n],
                np.asarray(res_p.bodies_3d)[i, :n],
                rtol=1e-4, atol=1e-3)


def test_adaptive_capacity_ladder():
    """SMAPInference(adaptive_capacities=...) picks the smallest rung that
    fits the batch's peak counts, escalates on crowds, and matches the
    full-capacity program at every rung."""
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import SMAPInference
    from smap_tpu.ops.postprocess import postprocess_batch

    H, W = 64, 104
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}]
    info = _scale_info(scales)
    post = PostProcessConfig(max_peaks=127, assoc_peaks=16)
    cfg = Config(model=ModelConfig(output_shape=(H, W),
                                   compute_dtype="float32"),
                 post=post, input_shape=(H * 4, W * 4), output_shape=(H, W))
    engine = SMAPInference({}, cfg, adaptive_capacities=(8, 16, 48))
    images = np.zeros((1, H * 4, W * 4, 3), np.float32)

    def feed(maps):
        engine._jit_forward = lambda variables, images: tuple(
            jnp.copy(m) for m in maps)

    def wide_ref(maps, capacity=127):
        return postprocess_batch(*maps, info,
                                 PostProcessConfig(max_peaks=127,
                                                   assoc_peaks=capacity),
                                 net_w=float(W * 4), net_h=float(H * 4))

    # Sparse scene (4 people). The rung is SPECULATIVE: the cold engine
    # runs the first batch at the top rung (48) — never escalating — and
    # only then learns the scene is sparse.
    hm, pafs, rdm, _, _ = _synthetic_heatmaps(
        np.random.RandomState(42), num_people=4, h=H, w=W)
    sparse = (jnp.asarray(np.concatenate(
                  [hm.transpose(1, 2, 0) * 255.0,
                   pafs.transpose(1, 2, 0) * 127.0], -1)[None],
              ),
              jnp.asarray(np.random.RandomState(7).randn(
                  1, H, W, 14).astype(np.float32)),
              jnp.asarray(rdm[None, ..., None]))
    feed(sparse)
    res = engine.run_batch(images, scales)
    assert set(engine._post_cache) == {(48, False)}
    assert engine._spec_cap == 8          # learned from the observed count
    ref = wide_ref(sparse)
    n = int(np.asarray(ref.count)[0])
    assert int(np.asarray(res.count)[0]) == n
    np.testing.assert_allclose(np.asarray(res.bodies_3d)[0, :n],
                               np.asarray(ref.bodies_3d)[0, :n],
                               rtol=1e-4, atol=1e-3)

    # Steady state: the next sparse batch runs on the 8-rung program.
    res = engine.run_batch(images, scales)
    assert (8, False) in engine._post_cache
    assert int(np.asarray(res.count)[0]) == n
    np.testing.assert_allclose(np.asarray(res.bodies_3d)[0, :n],
                               np.asarray(ref.bodies_3d)[0, :n],
                               rtol=1e-4, atol=1e-3)

    # Crowded channel (>48 peaks) arriving while the speculation sits at
    # the 8-rung: the mis-speculation is detected (count > rung) and the
    # batch re-runs past the ladder at max_peaks.
    out2d, out3d, outrd = _crowded_maps(H, W, extra_grid=8)
    crowded = tuple(map(jnp.asarray, (out2d, out3d, outrd)))
    feed(crowded)
    res = engine.run_batch(images, scales)
    assert (127, False) in engine._post_cache
    assert engine._spec_cap == 127
    ref = wide_ref(crowded)
    assert int(np.asarray(res.count)[0]) == int(np.asarray(ref.count)[0])
    assert not bool(np.asarray(res.overflow)[0])


def test_run_stream_matches_run_batch():
    """The pipelined run_stream yields, in order, the same resolved results
    as per-batch run_batch — including across a sparse->crowded->sparse rung
    switch — with and without the adaptive ladder."""
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import SMAPInference

    H, W = 64, 104
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}]
    post = PostProcessConfig(max_peaks=127, assoc_peaks=16)
    cfg = Config(model=ModelConfig(output_shape=(H, W),
                                   compute_dtype="float32"),
                 post=post, input_shape=(H * 4, W * 4), output_shape=(H, W))
    images = np.zeros((1, H * 4, W * 4, 3), np.float32)

    hm, pafs, rdm, _, _ = _synthetic_heatmaps(
        np.random.RandomState(42), num_people=4, h=H, w=W)
    sparse = (jnp.asarray(np.concatenate(
                  [hm.transpose(1, 2, 0) * 255.0,
                   pafs.transpose(1, 2, 0) * 127.0], -1)[None]),
              jnp.asarray(np.random.RandomState(7).randn(
                  1, H, W, 14).astype(np.float32)),
              jnp.asarray(rdm[None, ..., None]))
    crowded = tuple(map(jnp.asarray, _crowded_maps(H, W, extra_grid=8)))
    sequence = [sparse, sparse, crowded, sparse]

    def make_engine(**kw):
        engine = SMAPInference({}, cfg, **kw)
        feeds = iter(sequence)
        engine._jit_forward = lambda variables, images: tuple(
            jnp.copy(m) for m in next(feeds))
        return engine

    for kw in ({"adaptive_capacities": (8, 16, 48)}, {}):
        ref_engine = make_engine(**kw)
        refs = [ref_engine.run_batch(images, scales) for _ in sequence]
        stream_engine = make_engine(**kw)
        outs = list(stream_engine.run_stream(
            (images, scales) for _ in sequence))
        assert len(outs) == len(refs)
        for got, want in zip(outs, refs):
            # Tables are capacity-shaped ([B, K, 15, 4]; K = the rung that
            # served the batch, which may differ between the two engines'
            # speculation histories) — compare the valid rows.
            n = int(np.asarray(want.count)[0])
            assert int(np.asarray(got.count)[0]) == n
            np.testing.assert_allclose(np.asarray(got.bodies_3d)[0, :n],
                                       np.asarray(want.bodies_3d)[0, :n],
                                       rtol=1e-4, atol=1e-3)


def test_run_stream_flush_sentinel():
    """A None item flushes the in-flight slot: the pending result is
    resolved and yielded immediately (no further batch needs to arrive),
    and results/ordering are unaffected."""
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import SMAPInference

    H, W = 64, 104
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}]
    post = PostProcessConfig(max_peaks=127, assoc_peaks=16)
    cfg = Config(model=ModelConfig(output_shape=(H, W),
                                   compute_dtype="float32"),
                 post=post, input_shape=(H * 4, W * 4), output_shape=(H, W))
    images = np.zeros((1, H * 4, W * 4, 3), np.float32)

    hm, pafs, rdm, _, _ = _synthetic_heatmaps(
        np.random.RandomState(42), num_people=4, h=H, w=W)
    sparse = (jnp.asarray(np.concatenate(
                  [hm.transpose(1, 2, 0) * 255.0,
                   pafs.transpose(1, 2, 0) * 127.0], -1)[None]),
              jnp.asarray(np.random.RandomState(7).randn(
                  1, H, W, 14).astype(np.float32)),
              jnp.asarray(rdm[None, ..., None]))

    def make_engine(**kw):
        engine = SMAPInference({}, cfg, **kw)
        engine._jit_forward = lambda variables, x: tuple(
            jnp.copy(m) for m in sparse)
        return engine

    for kw in ({"adaptive_capacities": (8, 16, 48)}, {}):
        engine = make_engine(**kw)
        ref = engine.run_batch(images, scales)
        n = int(np.asarray(ref.count)[0])

        engine = make_engine(**kw)
        consumed = []
        feed = [(images, scales), None, None, (images, scales), None]

        def tracking(seq=feed):
            for item in seq:
                consumed.append(item is None)
                yield item

        stream = engine.run_stream(tracking())
        first = next(stream)
        # The first result arrived right after the flush — before the
        # second batch was ever pulled from the source (and the repeated
        # None on an already-empty slot is inert).
        assert consumed == [False, True]
        rest = list(stream)
        assert len(rest) == 1
        for got in [first, rest[0]]:
            assert int(np.asarray(got.count)[0]) == n
            np.testing.assert_allclose(np.asarray(got.bodies_3d)[0, :n],
                                       np.asarray(ref.bodies_3d)[0, :n],
                                       rtol=1e-4, atol=1e-3)


def test_overflow_fallback_matches_full_capacity():
    """SMAPInference(overflow_fallback=True) re-runs flagged batches at the
    127-peak capacity and matches the full-capacity program exactly."""
    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig, PostProcessConfig
    from smap_tpu.inference import SMAPInference
    from smap_tpu.ops.postprocess import postprocess_batch

    H, W = 64, 104
    out2d, out3d, outrd = _crowded_maps(H, W)
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}]
    info = _scale_info(scales)
    post = PostProcessConfig(max_peaks=127, assoc_peaks=8)
    cfg = Config(model=ModelConfig(output_shape=(H, W),
                                   compute_dtype="float32"),
                 post=post, input_shape=(H * 4, W * 4), output_shape=(H, W))

    engine = SMAPInference({}, cfg, overflow_fallback=True)
    # Bypass the network: feed the synthetic maps straight to post-processing.
    maps = (jnp.asarray(out2d), jnp.asarray(out3d), jnp.asarray(outrd))
    engine._jit_forward = lambda variables, images: tuple(
        jnp.copy(m) for m in maps)
    res = engine.run_batch(np.zeros((1, H * 4, W * 4, 3), np.float32), scales)

    wide = postprocess_batch(*maps, info,
                             PostProcessConfig(max_peaks=127,
                                               assoc_peaks=127),
                             net_w=float(W * 4), net_h=float(H * 4))
    assert not bool(np.asarray(res.overflow)[0])
    # jit-fused vs op-by-op execution reassociates float math (back-project
    # fma differences ~1e-5 rel); the gate is identical association
    # decisions and coordinates equal to fp noise.
    np.testing.assert_allclose(np.asarray(res.bodies_3d),
                               np.asarray(wide.bodies_3d), rtol=1e-4,
                               atol=1e-3)
    assert int(np.asarray(res.count)[0]) == int(np.asarray(wide.count)[0])

    # Without the fallback the truncated result must carry the flag.
    engine2 = SMAPInference({}, cfg)
    engine2._jit_forward = lambda variables, images: tuple(
        jnp.copy(m) for m in maps)
    res2 = engine2.run_batch(np.zeros((1, H * 4, W * 4, 3), np.float32),
                             scales)
    assert bool(np.asarray(res2.overflow)[0])
