"""Inference API: images -> multi-person absolute 3D poses.

TPU-native replacement for the reference's test driver
(``exps/stage3_root2/test.py:25-152`` in zju3dv/SMAP). The whole pipeline —
SMAP forward (optionally with flip-TTA), peak extraction, association,
depth chaining, back-projection and RefineNet lifting — is one jitted
function executed per batch; the host only decodes images and serializes
the result JSON (same schema as the reference).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import (Config, NUM_JOINTS, PAF_FLIP_CHANNEL, FLIP_ORDER,
                             PIXEL_MEANS_BGR, PIXEL_STDS_BGR, ROOT_IDX)
from smap_tpu.models.refinenet import RefineNet
from smap_tpu.models.smap import SMAP
from smap_tpu.ops.postprocess import (PoseResults, ScaleInfo, flip_tta_merge,
                                      postprocess_batch)
from smap_tpu.ops.refine import apply_refinement, build_refine_input


def prepare_images(images: jnp.ndarray) -> jnp.ndarray:
    """Wire format -> normalized float32 BGR, on device (jit-traceable).

    Accepts packed planar I420 ``[B, 3H/2, W] uint8`` (the video wire
    format), letterboxed ``[B, H, W, 3] uint8``, or already-normalized
    float32 (returned unchanged). The chroma upsample / BT.601 conversion
    and the ``(x/255 - mean)/std`` normalization fuse into whatever jit
    this is traced inside (the serving forward, or the calibration
    forward for static int8).
    """
    if images.ndim == 3:
        from smap_tpu.data.preprocess import i420_to_bgr

        means = jnp.asarray(PIXEL_MEANS_BGR, jnp.float32)
        stds = jnp.asarray(PIXEL_STDS_BGR, jnp.float32)
        return (i420_to_bgr(images) / 255.0 - means) / stds
    if images.dtype == jnp.uint8:
        means = jnp.asarray(PIXEL_MEANS_BGR, jnp.float32)
        stds = jnp.asarray(PIXEL_STDS_BGR, jnp.float32)
        return (images.astype(jnp.float32) / 255.0 - means) / stds
    return images


class SMAPInference:
    """Batched, jit-compiled inference pipeline.

    By default the pipeline runs as TWO jitted programs — model forward,
    then post-processing. The seam sits at the (small) network-output
    maps, letting XLA pick layouts for each half independently, and is
    what makes the overflow fallback and the adaptive capacity ladder
    possible (the post program is swapped per batch). Async dispatch
    overlaps the two programs' floors in a pipelined serving loop
    (docs/perf_notes.md "dispatch-floor finding"). ``fused=True``
    restores the single-program variant for A/B benching.

    Args:
      variables: SMAP Flax variables ({'params', 'batch_stats'}).
      cfg: framework Config.
      refine_variables: optional RefineNet variables; enables lifting.
      do_flip: horizontal flip test-time augmentation (test.py:55-70).
      fused: compile model forward + post-processing as one program.
      overflow_fallback: when an image's per-joint peak count exceeds
        ``cfg.post.assoc_peaks`` (PoseResults.overflow), re-run the batch's
        post-processing at the reference's full 127-peak capacity
        (extensions/association.cpp:20) so crowded scenes never silently
        diverge. The wide program compiles lazily on first overflow.
        Requires the split pipeline (``fused=False``).
      mesh: optional ``jax.sharding.Mesh`` for single-process multi-chip
        serving: the batch axis is sharded over the mesh's ``data`` axis
        (each chip runs forward + post-processing on its shard; no
        cross-chip communication is needed — the pipeline is
        embarrassingly batch-parallel), parameters are replicated once at
        construction. Batch size must be divisible by the mesh size.
        This is the serving counterpart of the SPMD train step
        (smap_tpu/parallel/mesh.py); the reference's analogue is one
        process per GPU with a contiguous eval shard
        (lib/utils/dataloader.py:79-85).
      adaptive_capacities: optional ascending peak capacities, e.g.
        ``(8, 16, 40)``. Post-processing cost is quadratic in the peak
        capacity (the PAF score table is [L, K, K]), but XLA programs are
        static-shape, so dynamic peak counts are served by a LADDER of
        compiled programs. The rung is SPECULATIVE: each batch's post
        runs immediately at the capacity implied by previous batches'
        peak counts (no host sync between forward and post dispatch), a
        dense on-device count rides alongside, and a mis-speculation —
        the count exceeding the rung, which is exactly the program's own
        overflow condition — re-runs that batch at a rung that fits
        (escalating to the full ``max_peaks`` program above the top
        rung). Results are identical to the full-capacity program at
        every rung — truncation is neutral while counts fit
        (tests/test_inference.py). Typical scenes (<= 8 peaks/joint)
        skip ~25x of the capacity-40 PAF sampling FLOPs. Each rung
        compiles lazily on first use; ladder programs do not donate the
        network maps (escalation may re-read them). ``run_batch``
        resolves each batch before returning; ``run_stream`` defers
        resolution one batch for full cross-batch device overlap.
        Requires the split pipeline; mutually exclusive with
        overflow_fallback (the ladder already escalates).
      quantized: int8 serving forward — folds BatchNorm and pre-quantizes
        the weights once (smap_tpu.models.quantize), then runs convs
        int8 x int8 -> int32 on the MXU (2x the bf16 rate on v5e).
        ``True`` = dynamic per-tensor activation quantization (one
        on-device abs-max reduction per conv input). ``"static"`` =
        frozen per-conv activation scales calibrated from
        ``calibration_batches``, removing every per-call reduction from
        the serving graph (inputs hotter than the calibration range clip
        at +-127 — calibrate on representative frames). ``"folded"`` =
        full-precision bf16 with BatchNorm folded into the conv weights
        and the HBM-bound stride-1 bottleneck blocks fused into single
        Pallas kernels (smap_tpu.ops.fused_block) — no quantization
        loss, just the BN-fold reassociation (tests/test_fused_block.py
        bounds it). The int8 modes are an opt-in speed/accuracy trade
        (tests/test_quantize.py pins the error).
        If ``cfg.model.quantized`` is already set, the variables are
        expected to be pre-quantized (and, for "static", pre-calibrated:
        uncalibrated scales are rejected loudly at construction).
      calibration_batches: for ``quantized="static"`` only — one batch
        or an iterable of batches in ANY run_batch input format (f32
        normalized, letterboxed uint8, or packed I420); used once at
        construction to freeze the per-conv activation scales.
    """

    def __init__(self, variables, cfg: Config = Config(),
                 refine_variables=None, do_flip: bool = False,
                 fused: bool = False, overflow_fallback: bool = False,
                 adaptive_capacities=None, mesh=None,
                 quantized=False, calibration_batches=None):
        if fused and (overflow_fallback or adaptive_capacities):
            raise ValueError("overflow_fallback/adaptive_capacities require "
                             "the split (fused=False) pipeline")
        if overflow_fallback and adaptive_capacities:
            raise ValueError("adaptive_capacities already escalates; don't "
                             "combine it with overflow_fallback")
        if quantized and not cfg.model.quantized:
            # Serving weight transform, applied once (jitted — eager
            # op-by-op transforms are pathological on the tunneled
            # runtime): int8 modes fold BN + pre-quantize weights;
            # "folded" folds BN only (full precision) and routes the
            # HBM-bound bottleneck blocks through the fused Pallas kernel
            # (smap_tpu.ops.fused_block).
            import dataclasses

            from smap_tpu.models.quantize import (calibrate_activation_scales,
                                                  fold_bn_variables,
                                                  quantize_variables)

            if quantized == "static" and calibration_batches is None:
                raise ValueError(
                    'quantized="static" needs calibration_batches '
                    "(or pass pre-calibrated variables with "
                    'cfg.model.quantized="static")')
            variables = jax.jit(fold_bn_variables if quantized == "folded"
                                else quantize_variables)(variables)
            if quantized == "static":
                if isinstance(calibration_batches, np.ndarray) or hasattr(
                        calibration_batches, "ndim"):
                    calibration_batches = [calibration_batches]
                # Calibration sees exactly what serving sees: the same
                # on-device wire-format conversion + normalization.
                prep = jax.jit(prepare_images)
                batches = [prep(jnp.asarray(b)) for b in calibration_batches]
                variables = calibrate_activation_scales(
                    variables, cfg.model, batches)
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model,
                                               quantized=quantized))
        if (quantized == "static" or cfg.model.quantized == "static"):
            from smap_tpu.models.quantize import check_static_scales

            # Loud rejection of uncalibrated static variables (act_scale
            # missing or still at the 0 init sentinel) — silently serving
            # scale-0 garbage is the failure mode this guards against.
            check_static_scales(variables)
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from smap_tpu.parallel.mesh import replicated

            variables = jax.device_put(variables, replicated(mesh))
            if refine_variables is not None:
                refine_variables = jax.device_put(refine_variables,
                                                  replicated(mesh))
        self.variables = variables
        self.refine_variables = refine_variables
        self.do_flip = do_flip
        self.fused = fused
        self.overflow_fallback = overflow_fallback
        self.adaptive_capacities = (tuple(sorted(adaptive_capacities))
                                    if adaptive_capacities else None)
        if self.adaptive_capacities:
            if self.adaptive_capacities[-1] > cfg.post.max_peaks:
                raise ValueError("adaptive capacity exceeds max_peaks")

            def smap_inference_peak_counts(out2d):
                from smap_tpu.ops.nms import _local_max_mask

                kpt = jnp.moveaxis(out2d.astype(jnp.float32), -1, 1)
                kpt = kpt[:, :NUM_JOINTS] / 255.0          # [B, J, H, W]
                mask = _local_max_mask(kpt, cfg.post.nms_threshold)
                counts = jnp.sum(mask, axis=(-2, -1))      # [B, J]
                return jnp.minimum(jnp.max(counts), cfg.post.max_peaks)

            self._jit_counts = jax.jit(smap_inference_peak_counts)
            # Speculative rung for the next batch (updated from observed
            # counts); start at the top rung so cold batches never escalate.
            self._spec_cap = self.adaptive_capacities[-1]
        self.model = SMAP(cfg.model)
        self.refine_model = RefineNet(cfg.refine)

        def smap_inference_forward(variables, images):
            return self._forward(variables, images)

        def smap_inference_postprocess(refine_variables, out2d, out3d, outrd,
                                       scale):
            return self._postprocess(refine_variables, out2d, out3d, outrd,
                                     scale, self.cfg.post)

        def smap_inference_pipeline(variables, refine_variables, images,
                                    scale):
            out2d, out3d, outrd = self._forward(variables, images)
            return self._postprocess(refine_variables, out2d, out3d, outrd,
                                     scale, self.cfg.post)

        # Variables packing: the tree is 1608 leaves and the tunneled TPU
        # runtime charges ~0.06 ms per argument/result handle per call
        # (scripts/probes/_handle_count_probe.py), i.e. ~90 ms/call of
        # pure marshaling on the forward — more than its compute. Pack the
        # tree into one flat vector per dtype and unpack INSIDE the jit
        # (static slices, fused by XLA, bit-identical maps). Multi-device
        # serving keeps the replicated tree (packing would need sharding
        # annotations, which are their own pathology on this runtime);
        # SMAP_TPU_PACK_VARS=0 disables for A/B.
        # Quantized (int8-leaf) trees stay unpacked: slicing int8 leaves
        # out of the packed flat vector crashes the tunneled runtime's
        # compiler ("Check failed: dim >= 0 (-1 vs. 0)", round-5 bench
        # validation) while the same packed program in bf16 compiles
        # fine; the packed form only buys sync-call marshaling anyway.
        has_int8 = any(getattr(leaf, "dtype", None) == jnp.int8
                       for leaf in jax.tree.leaves(variables))
        pack_on = (mesh is None and not has_int8
                   and int(os.environ.get("SMAP_TPU_PACK_VARS", "1")))
        if pack_on:
            from smap_tpu.utils.pack import pack_tree

            self._packed_vars, self._unpack_vars = pack_tree(variables)
        else:
            self._packed_vars = self._unpack_vars = None

        def _dispatch_on_packed(packed_fn, tree_fn):
            """Route calls made with ``self.variables`` through the packed
            program; any OTHER variables tree falls back to a lazily
            compiled tree-argument program (no callers do today, but the
            argument must keep meaning what it says)."""
            cell = []

            def dispatch(variables, *args):
                if variables is self.variables:
                    return packed_fn(self._packed_vars, *args)
                if not cell:
                    cell.append(jax.jit(tree_fn))
                return cell[0](variables, *args)

            return dispatch

        if fused:
            if pack_on:
                def smap_inference_pipeline_packed(packed, refine_variables,
                                                   images, scale):
                    return smap_inference_pipeline(
                        self._unpack_vars(packed), refine_variables, images,
                        scale)

                self._jit_fused = _dispatch_on_packed(
                    jax.jit(smap_inference_pipeline_packed),
                    smap_inference_pipeline)
            else:
                self._jit_fused = jax.jit(smap_inference_pipeline)
        else:
            if pack_on:
                def smap_inference_forward_packed(packed, images):
                    return smap_inference_forward(self._unpack_vars(packed),
                                                  images)

                self._jit_forward = _dispatch_on_packed(
                    jax.jit(smap_inference_forward_packed),
                    smap_inference_forward)
            else:
                self._jit_forward = jax.jit(smap_inference_forward)
            # The maps are one-shot intermediates: donate them so XLA can
            # reuse their buffers inside the post-processing program.
            self._jit_post = jax.jit(smap_inference_postprocess,
                                     donate_argnums=(1, 2, 3))
        self._post_cache = {}   # capacity -> lazily-jitted post program

    def _forward(self, variables, images: jnp.ndarray):
        # Wire-format conversion + normalization fuse into the forward
        # program (prepare_images): I420 moves 1.5 bytes/pixel over the
        # host->device link, uint8 3 — vs 12 for normalized f32; the
        # transfer link, not compute, bounds real serving pipelines.
        images = prepare_images(images)
        if self.do_flip:
            # One 2B-batch forward instead of two sequential applies: the
            # upright and W-flipped halves are independent, so batching
            # them keeps the MXU fed (reference runs them back to back,
            # test.py:50-56).
            b = images.shape[0]
            both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
            out2d2, out3d2, outrd2 = self.model.apply(variables, both,
                                                      method=SMAP.infer)
            out2d = flip_tta_merge(out2d2[:b], out2d2[b:], FLIP_ORDER,
                                   PAF_FLIP_CHANNEL)
            return out2d, out3d2[:b], outrd2[:b]
        return self.model.apply(variables, images, method=SMAP.infer)

    def _postprocess(self, refine_variables, out2d, out3d, outrd,
                     scale: ScaleInfo, post_cfg) -> PoseResults:
        net_h, net_w = self.cfg.input_shape
        results = postprocess_batch(out2d, out3d, outrd, scale,
                                    post_cfg, net_w=float(net_w),
                                    net_h=float(net_h), stride=self.cfg.stride)
        if refine_variables is not None:
            def refine_one(b2d, b3d):
                feat = build_refine_input(b2d, b3d, root_idx=ROOT_IDX)
                pred = self.refine_model.apply(refine_variables, feat)
                return apply_refinement(pred, b3d, root_idx=ROOT_IDX)

            refined = jax.vmap(refine_one)(results.bodies_2d,
                                           results.bodies_3d)
            results = results._replace(bodies_3d=refined)
        return results

    def _place(self, images, info: ScaleInfo):
        """Device placement: batch-sharded over the mesh when one is set."""
        images = jnp.asarray(images)
        if self.mesh is None:
            return images, info
        from smap_tpu.parallel.mesh import batch_sharding

        n = self.mesh.devices.size
        if images.shape[0] % n:
            raise ValueError(f"batch {images.shape[0]} not divisible by "
                             f"the {n}-device mesh")
        sh = batch_sharding(self.mesh)
        return (jax.device_put(images, sh),
                jax.tree.map(lambda a: jax.device_put(a, sh), info))

    def _make_scale_info(self, scales) -> ScaleInfo:
        if isinstance(scales, ScaleInfo):
            # Pre-built (device-resident) metadata: serving loops with fixed
            # camera intrinsics skip 7 tiny host->device transfers per batch
            # (each pays the tunnel's serialized-dispatch latency).
            return scales
        return ScaleInfo(
            scale=jnp.asarray([s["scale"] for s in scales], jnp.float32),
            img_w=jnp.asarray([s["img_width"] for s in scales], jnp.float32),
            img_h=jnp.asarray([s["img_height"] for s in scales], jnp.float32),
            fx=jnp.asarray([s["f_x"] for s in scales], jnp.float32),
            fy=jnp.asarray([s["f_y"] for s in scales], jnp.float32),
            cx=jnp.asarray([s["cx"] for s in scales], jnp.float32),
            cy=jnp.asarray([s["cy"] for s in scales], jnp.float32))

    def _post_program(self, capacity: int, donate: bool = True):
        """Post-processing program at peak capacity ``capacity`` (lazy).

        ``donate=False`` variants keep the network maps alive after the
        call — required by the speculative ladder, whose (rare) escalation
        re-runs the same maps at a higher capacity.
        """
        import dataclasses

        if donate and capacity == self.cfg.post.assoc_peaks:
            return self._jit_post
        key = (capacity, donate)
        if key not in self._post_cache:
            cap_cfg = dataclasses.replace(self.cfg.post,
                                          assoc_peaks=capacity)

            def smap_inference_postprocess_cap(refine_variables, out2d,
                                               out3d, outrd, scale):
                return self._postprocess(refine_variables, out2d, out3d,
                                         outrd, scale, cap_cfg)

            self._post_cache[key] = jax.jit(
                smap_inference_postprocess_cap,
                donate_argnums=(1, 2, 3) if donate else ())
        return self._post_cache[key]

    def _rung_for(self, n: int) -> int:
        """Smallest ladder capacity that fits ``n`` peaks (top = max_peaks)."""
        return next((c for c in self.adaptive_capacities if c >= n),
                    self.cfg.post.max_peaks)

    def _ladder_dispatch(self, maps, info):
        """Dispatch count + speculative-rung post WITHOUT any host sync.

        Returns (results, count_dev, cap): ``results`` were produced at
        capacity ``cap`` (the rung speculated from previous batches);
        ``count_dev`` is the device scalar of this batch's true max peak
        count. The caller resolves correctness later via
        :meth:`_ladder_resolve` — peak counts and the post programs'
        overflow flag agree by construction (same local-max mask and
        threshold), so ``count > cap`` is exactly the escalation
        condition.
        """
        count_dev = self._jit_counts(maps[0])
        cap = self._spec_cap
        results = self._post_program(cap, donate=False)(
            self.refine_variables, *maps, info)
        return results, count_dev, cap

    def _ladder_resolve(self, maps, info, results, count_dev, cap
                        ) -> PoseResults:
        """Fetch the batch's peak count, escalate if the speculative rung
        truncated, and update the speculation for subsequent batches."""
        n = int(count_dev)
        self._spec_cap = self._rung_for(n)
        if n > cap:   # mis-speculation: re-run at a rung that fits
            results = self._post_program(self._spec_cap, donate=False)(
                self.refine_variables, *maps, info)
        return results

    def run_batch(self, images: np.ndarray, scales: Sequence[Dict[str, float]]
                  ) -> PoseResults:
        """Run on a preprocessed batch.

        Args:
          images: [B, H, W, 3] — either normalized float32
            (data.preprocess.normalize_image) or letterboxed uint8, which
            is normalized on device inside the forward program (preferred
            for serving: 4x less host->device transfer) — or packed planar
            I420 [B, 3H/2, W] uint8 (data.preprocess.bgr_to_i420), the
            video wire format, converted + normalized on device (8x less
            transfer than f32).
          scales: per-image scale dicts.
        """
        images, info = self._place(images, self._make_scale_info(scales))
        if self.fused:
            return self._jit_fused(self.variables, self.refine_variables,
                                   images, info)
        maps = self._jit_forward(self.variables, images)
        if self.adaptive_capacities:
            # Speculative capacity ladder: post-processing is dispatched
            # IMMEDIATELY at the rung speculated from previous batches'
            # peak counts, so no host sync sits between the forward and
            # post dispatches (the device pipeline runs back-to-back and
            # the next batch's transfer overlaps). The count fetch below
            # then overlaps with the post program executing; a
            # mis-speculation (rare in steady state) re-runs at a rung
            # that fits. For full cross-batch overlap use run_stream.
            return self._ladder_resolve(maps, info,
                                        *self._ladder_dispatch(maps, info))
        if self.overflow_fallback:
            # Keep the maps alive for the potential wide re-run (the fast
            # program donates its inputs).
            results = self._jit_post(self.refine_variables,
                                     *jax.tree.map(jnp.copy, maps), info)
            if bool(jnp.any(results.overflow)):
                results = self._post_program(self.cfg.post.max_peaks)(
                    self.refine_variables, maps[0], maps[1], maps[2], info)
            return results
        return self._jit_post(self.refine_variables, *maps, info)

    def run_stream(self, batches):
        """Pipelined serving over an iterable of ``(images, scales)``.

        Yields one :class:`PoseResults` per input batch (in order) with ONE
        batch of latency: while batch ``i``'s forward/post execute on
        device, batch ``i+1``'s transfer and dispatches are already
        enqueued, so the host never drains the device pipeline — this is
        the ladder-compatible version of the bench's async loop. With the
        adaptive ladder, correctness resolution (count fetch + rare
        escalation) for batch ``i`` happens only after batch ``i+1`` has
        been dispatched, by which point the count is already computed.

        A ``None`` item is a FLUSH: the in-flight batch (if any) is
        resolved and yielded immediately instead of waiting for the next
        batch. Live sources (serve.py --watch, video capture) emit it on
        idle so result latency stays bounded when frames stop arriving;
        it costs the one overlapped slot, which an idle source wasn't
        going to fill anyway.

        Requires the split (``fused=False``) pipeline; works with or
        without ``adaptive_capacities``.
        """
        assert not self.fused, "run_stream needs the split pipeline"
        pending = None

        def resolve(item):
            return (self._ladder_resolve(*item)
                    if self.adaptive_capacities else item)

        for entry in batches:
            if entry is None:   # flush: drain the pipeline slot
                if pending is not None:
                    yield resolve(pending)
                    pending = None
                continue
            images, scales = entry
            images, info = self._place(images, self._make_scale_info(scales))
            maps = self._jit_forward(self.variables, images)
            if self.adaptive_capacities:
                results, count_dev, cap = self._ladder_dispatch(maps, info)
                item = (maps, info, results, count_dev, cap)
            else:
                item = self._jit_post(self.refine_variables, *maps, info)
            if pending is not None:
                yield resolve(pending)
            pending = item
        if pending is not None:
            yield resolve(pending)

    def run_batch_timed(self, images: np.ndarray,
                        scales: Sequence[Dict[str, float]]):
        """run_batch + per-stage wall times (split mode only).

        Returns (results, {"transfer_ms", "model_ms", "postproc_ms"}).
        ``transfer_ms`` is the synchronous host->device input transfer
        (overlapped with compute in the pipelined serving loop);
        ``model_ms`` is then pure forward compute.
        """
        import time

        assert not self.fused, "stage timing needs the split pipeline"
        t0 = time.perf_counter()
        x, info = self._place(images, self._make_scale_info(scales))
        x = jax.block_until_ready(x)
        t1 = time.perf_counter()
        maps = jax.block_until_ready(self._jit_forward(self.variables, x))
        t2 = time.perf_counter()
        results = jax.block_until_ready(
            self._jit_post(self.refine_variables, *maps, info))
        t3 = time.perf_counter()
        return results, {"transfer_ms": (t1 - t0) * 1e3,
                         "model_ms": (t2 - t1) * 1e3,
                         "postproc_ms": (t3 - t2) * 1e3}

    # ------------------------------------------------------------------
    # Result serialization (reference JSON schema, test_util.py:134-158)
    # ------------------------------------------------------------------

    @staticmethod
    def results_to_pairs(results: PoseResults, img_paths: Sequence[str],
                         gt_bodys: Optional[Sequence[np.ndarray]] = None,
                         ) -> List[Dict[str, Any]]:
        """Convert device results to the reference's '3d_pairs' items."""
        b2d = np.asarray(results.bodies_2d)
        b3d = np.asarray(results.bodies_3d)
        rdep = np.asarray(results.root_depth)
        counts = np.asarray(results.count)
        pairs = []
        for i, path in enumerate(img_paths):
            n = int(counts[i])
            pair = {
                "pred_2d": b2d[i, :n].tolist(),
                "pred_3d": b3d[i, :n].tolist(),
                "root_d": rdep[i, :n].tolist(),
                "image_path": path,
            }
            if gt_bodys is not None and gt_bodys[i] is not None:
                g = np.asarray(gt_bodys[i])
                pair["gt_3d"] = g[:, :, 4:].tolist()
                pair["gt_2d"] = g[:, :, :4].tolist()
            else:
                pair["gt_3d"] = []
                pair["gt_2d"] = []
            pairs.append(pair)
        return pairs


def run_labeled_inference(dataset, engine: "SMAPInference",
                          mode: str = "generate_result",
                          batch_size: int = 16, root_idx: int = ROOT_IDX,
                          shard: int = 0, num_shards: int = 1,
                          gather: bool = False) -> Dict[str, Any]:
    """Inference over a labeled JointDataset (reference 'generate_result' /
    'generate_train' modes, test.py:42-145).

    Persons whose GT root has visibility <= 1 are dropped (test.py:74-81);
    intrinsics come from the GT rows when present; predictions are
    GT-registered before serialization. ``shard``/``num_shards`` split the
    dataset contiguously per host (lib/utils/dataloader.py:79-85).
    ``gather=True`` merges every host's result shard via the picklable
    all-gather (reference: lib/utils/comm.py:47-87) so each process returns
    the full result set; a no-op when single-process.
    """
    from smap_tpu.evaluation.register import register_pred

    cfg = engine.cfg
    result = {"model_pattern": "MIX", "3d_pairs": []}
    n = len(dataset)
    per = -(-n // num_shards)
    indices = list(range(shard * per, min(n, (shard + 1) * per)))

    # Batches feed the pipelined run_stream: while batch i executes on
    # device, batch i+1's host prep (sample decode, intrinsics) and the
    # register_pred of batch i-1 overlap with it instead of serializing.
    import collections

    meta = collections.deque()

    def batches():
        for start in range(0, len(indices), batch_size):
            idx = indices[start:start + batch_size]
            samples = [dataset.get_eval_sample(i) for i in idx]
            imgs = np.stack([s[0] for s in samples])
            if len(idx) < batch_size:  # pad tail to the compiled shape
                imgs = np.concatenate(
                    [imgs,
                     np.zeros((batch_size - len(idx), *imgs.shape[1:]),
                              imgs.dtype)])
            scales, gt_list = [], []
            for s in samples:
                bodys, scale = s[1], dict(s[3])
                valid = bodys[bodys[:, root_idx, 3] > 1]
                gt_list.append(valid)
                if len(valid) and valid.shape[-1] >= 11:
                    scale.update(f_x=valid[0, 0, 7], f_y=valid[0, 0, 8],
                                 cx=valid[0, 0, 9], cy=valid[0, 0, 10])
                elif len(valid) and valid.shape[-1] >= 8:
                    # Narrow annotation rows carry only f_x at column 7
                    # (data_format.md: bodys rows are >= 8 wide when
                    # intrinsics are present at all); anything narrower
                    # falls through to the fx=fy=W default below.
                    scale.update(f_x=valid[0, 0, 7], f_y=valid[0, 0, 7],
                                 cx=scale["img_width"] / 2,
                                 cy=scale["img_height"] / 2)
                else:
                    scale.update(f_x=scale["img_width"],
                                 f_y=scale["img_width"],
                                 cx=scale["img_width"] / 2,
                                 cy=scale["img_height"] / 2)
                scales.append(scale)
            scales += [scales[-1]] * (batch_size - len(idx))
            meta.append((idx, samples, gt_list))
            yield imgs, scales

    for res in engine.run_stream(batches()):
        idx, samples, gt_list = meta.popleft()
        res_np = {k: np.asarray(v) for k, v in res._asdict().items()}
        for j, i in enumerate(idx):
            gt = gt_list[j]
            if len(gt) == 0:
                continue
            m = int(res_np["count"][j])
            new2, new3, newd = register_pred(
                res_np["bodies_2d"][j, :m], res_np["bodies_3d"][j, :m],
                res_np["root_depth"][j, :m], gt, root_idx=root_idx)
            if mode == "generate_train":
                for p in range(len(new3)):
                    if new3[p, root_idx, 3] != 0:
                        result["3d_pairs"].append({
                            "pred_3d": new3[p].tolist(),
                            "pred_2d": new2[p].tolist(),
                            "gt_3d": gt[p][:, 4:7].tolist(),
                            "root_d": float(newd[p])})
            else:
                result["3d_pairs"].append({
                    "pred_2d": new2.tolist(), "pred_3d": new3.tolist(),
                    "root_d": newd.tolist(), "image_path": samples[j][2],
                    "gt_3d": gt[:, :, 4:].tolist(),
                    "gt_2d": gt[:, :, :4].tolist()})
    if gather:
        from smap_tpu.parallel.distributed import all_gather_objects

        shards = all_gather_objects(result["3d_pairs"])
        result["3d_pairs"] = [p for s in shards for p in s]
    return result


def run_inference(image_dir: str, variables, cfg: Config = Config(),
                  refine_variables=None, do_flip: bool = False,
                  batch_size: int = 16, output_json: Optional[str] = None,
                  adaptive_capacities=None, data_parallel: bool = False
                  ) -> Dict[str, Any]:
    """Directory-of-images inference (reference 'run_inference' mode).

    Globs jpg/png/jpeg recursively (custom_dataset.py:16-18), letterboxes on
    the host, runs the jitted pipeline per batch, returns (and optionally
    writes) the result dict with the reference's JSON schema.
    """
    import cv2

    paths: List[str] = []
    for ext in ("jpg", "png", "jpeg"):
        paths.extend(glob.glob(os.path.join(image_dir, f"**/*.{ext}"),
                               recursive=True))
    paths.sort()
    mesh = None
    if data_parallel and len(jax.local_devices()) > 1:
        from smap_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.local_devices())
        if batch_size % mesh.devices.size:
            raise ValueError(f"--batch_size {batch_size} must be divisible "
                             f"by the {mesh.devices.size} local devices")
    engine = SMAPInference(variables, cfg, refine_variables, do_flip,
                           adaptive_capacities=adaptive_capacities,
                           mesh=mesh)

    from smap_tpu.data.preprocess import letterbox_image

    result = {"model_pattern": "MIX", "3d_pairs": []}
    # Pipelined: batch i+1's decode/letterbox overlaps batch i's device
    # execution (run_stream keeps one batch in flight).
    import collections

    meta = collections.deque()

    def batches():
        for start in range(0, len(paths), batch_size):
            chunk = paths[start:start + batch_size]
            imgs, scales = [], []
            for p in chunk:
                raw = cv2.imread(p, cv2.IMREAD_COLOR)
                # Host letterbox only; normalization runs on device inside
                # the forward jit (uint8 transfer is 4x smaller than
                # normalized f32 and the transfer link bounds serving
                # throughput).
                img, scale = letterbox_image(raw, cfg.input_shape)
                imgs.append(img)
                scales.append(scale)
            # Pad the tail batch to keep a single compiled shape.
            pad = batch_size - len(chunk)
            if pad:
                imgs.extend([np.zeros_like(imgs[0])] * pad)
                scales.extend([scales[-1]] * pad)
            meta.append(chunk)
            yield np.stack(imgs), scales

    for res in engine.run_stream(batches()):
        chunk = meta.popleft()
        names = [os.path.relpath(p, image_dir) for p in chunk]
        result["3d_pairs"].extend(
            engine.results_to_pairs(
                jax.tree.map(lambda a: a[:len(chunk)], res), names))
    if output_json:
        os.makedirs(os.path.dirname(output_json) or ".", exist_ok=True)
        with open(output_json, "w") as f:
            json.dump(result, f)
    return result
