"""Typed configuration for the SMAP-TPU framework.

Replaces the reference's easydict-based config stack
(``exps/stage3_root2/config.py:11-74`` and ``dataset/data_settings.py:11-71``
in zju3dv/SMAP) with frozen dataclasses so every constant is hashable and can
be closed over by ``jax.jit`` without retracing hazards.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Tuple

# ---------------------------------------------------------------------------
# Skeleton constants (mpi15 joint set)
# ---------------------------------------------------------------------------

# Joint order (reference: dataset/data_settings.py:15-21):
#   0-neck 1-head 2-pelvis
#   3-left_shoulder 4-left_elbow 5-left_wrist
#   6-left_hip 7-left_knee 8-left_ankle
#   9-right_shoulder 10-right_elbow 11-right_wrist
#   12-right_hip 13-right_knee 14-right_ankle
JOINT_NAMES: Tuple[str, ...] = (
    "neck", "head", "pelvis",
    "left_shoulder", "left_elbow", "left_wrist",
    "left_hip", "left_knee", "left_ankle",
    "right_shoulder", "right_elbow", "right_wrist",
    "right_hip", "right_knee", "right_ankle",
)

NUM_JOINTS = 15

# Left/right mirror permutation (reference: dataset/data_settings.py:22).
FLIP_ORDER: Tuple[int, ...] = (0, 1, 2, 9, 10, 11, 12, 13, 14, 3, 4, 5, 6, 7, 8)

# Limb (PAF) definition: 14 directed limbs (reference:
# dataset/data_settings.py:27-31, identical list hard-coded in
# extensions/association.cpp:23-25).
PAF_VECTOR: Tuple[Tuple[int, int], ...] = (
    (0, 1), (0, 2),
    (0, 9), (9, 10), (10, 11),
    (0, 3), (3, 4), (4, 5),
    (2, 12), (12, 13), (13, 14),
    (2, 6), (6, 7), (7, 8),
)

NUM_LIMBS = 14

# Channel permutation applied to the 28 PAF x/y channels when horizontally
# flipping (reference: dataset/data_settings.py:33-34).
PAF_FLIP_CHANNEL: Tuple[int, ...] = (
    0, 1, 2, 3, 10, 11, 12, 13, 14, 15, 4, 5, 6, 7, 8, 9,
    22, 23, 24, 25, 26, 27, 16, 17, 18, 19, 20, 21,
)

ROOT_IDX = 2  # pelvis (reference: dataset/data_settings.py:23)

# Statistical bone lengths (cm) used by the depth-aware association's adaptive
# distance prior (reference: extensions/association.cpp:27-31).
BONE_LENGTHS: Tuple[float, ...] = (
    26.42178982, 48.36980909,
    14.88291009, 31.28002332, 23.915707,
    14.97674918, 31.28002549, 23.91570732,
    12.4644364, 48.26604433, 39.03553194,
    12.4644364, 48.19076948, 39.03553252,
)

# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

INPUT_SHAPE: Tuple[int, int] = (512, 832)  # (height, width)
STRIDE = 4
OUTPUT_SHAPE: Tuple[int, int] = (INPUT_SHAPE[0] // STRIDE, INPUT_SHAPE[1] // STRIDE)

# BGR channel statistics (reference: exps/stage3_root2/config.py:34-35); the
# reference reads images with cv2 (BGR) and normalizes with these per-channel
# means/stds after scaling to [0, 1].
PIXEL_MEANS_BGR: Tuple[float, float, float] = (0.406, 0.456, 0.485)
PIXEL_STDS_BGR: Tuple[float, float, float] = (0.225, 0.224, 0.229)


@dataclasses.dataclass(frozen=True)
class SkeletonConfig:
    """mpi15 skeleton spec consumed by ops and data synthesis."""

    num_joints: int = NUM_JOINTS
    num_limbs: int = NUM_LIMBS
    root_idx: int = ROOT_IDX
    paf_vector: Tuple[Tuple[int, int], ...] = PAF_VECTOR
    flip_order: Tuple[int, ...] = FLIP_ORDER
    paf_flip_channel: Tuple[int, ...] = PAF_FLIP_CHANNEL
    bone_lengths: Tuple[float, ...] = BONE_LENGTHS

    @property
    def num_2d_channels(self) -> int:
        """Keypoint heatmaps + x/y PAF channels (43 for mpi15)."""
        return self.num_joints + 2 * self.num_limbs


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """SMAP backbone hyper-parameters (reference: exps/stage3_root2/config.py:40-46)."""

    stage_num: int = 3
    upsample_channels: int = 256
    # Base width of the ResNet-50 trunk: per-level bottleneck planes are
    # (w, 2w, 4w, 8w) and the stem / cross-stage conv emit w channels.
    # 64 = the reference's ResNet-50 (model/smap.py:95-154); smaller
    # values keep the full topology (all blocks, all collectives) at a
    # fraction of the FLOPs — used by the multi-chip dry run and fast
    # tests, never by the flagship.
    trunk_width: int = 64
    num_joints: int = NUM_JOINTS
    num_limbs: int = NUM_LIMBS
    output_shape: Tuple[int, int] = OUTPUT_SHAPE
    # bfloat16 matmul/conv compute with float32 params & batch stats.
    compute_dtype: str = "bfloat16"
    # Rematerialize each stage in the backward pass (the reference's
    # RUN_EFFICIENT per-conv torch.utils.checkpoint, config.py:64, expressed
    # as stage-level jax.checkpoint so XLA can still fuse within a stage).
    remat: bool = False
    # int8 serving forward (inference-only): BN folded, per-channel int8
    # weights (smap_tpu.models.quantize.quantize_variables), dynamic
    # per-tensor activation quantization, convs int8 x int8 -> int32.
    # Opt-in speed/accuracy trade — not used by parity tests or the
    # golden corpus. NOTE: measured ~9% slower than bf16 on the current
    # tunneled v5e runtime (no native int8 conv lowering there); see
    # docs/perf_notes.md round-3 item 9. "static" additionally freezes
    # the per-conv activation scales from calibration batches
    # (smap_tpu.models.quantize.calibrate_activation_scales), removing
    # every per-call abs-max reduction from the serving graph. "folded"
    # is the full-precision serving mode: BN folded into conv kernel/bias
    # (quantize.fold_bn_variables) and the HBM-bound stride-1 bottleneck
    # blocks executed as one fused Pallas kernel each
    # (smap_tpu.ops.fused_block; docs/perf_notes.md round-4).
    quantized: Any = False   # False | True (dynamic) | "static" | "folded"

    @property
    def kpt_paf_channels(self) -> int:
        return self.num_joints + 2 * self.num_limbs


@dataclasses.dataclass(frozen=True)
class PostProcessConfig:
    """Peak extraction + association constants.

    Mirrors the dapalib kernel parameters (reference:
    extensions/association.cpp:18-31,37-38 and
    extensions/gpu/bodyPartConnectorBase.cu:166-176).
    """

    max_peaks: int = 127
    # Candidate capacity for PAF scoring + association. The reference sizes
    # its CUDA grid at 127x127 pairs (association.cpp:20) because GPU
    # threads are free; on TPU the [L, K, K, S] line-sample gather scales
    # with K^2 and dominates post-processing. 40 candidates per joint is
    # 2x the reference's own MAX_PEOPLE=20 cap (config.py:30); results are
    # identical whenever per-joint peak counts stay below this cap
    # (tests/test_inference.py::test_assoc_peaks_truncation_neutral).
    assoc_peaks: int = 40
    nms_threshold: float = 0.2
    nms_offset: float = 0.5
    # PAF line-integral scoring.
    inter_threshold: float = 0.05
    inter_min_above_threshold: float = 0.95  # fraction of passing samples
    default_nms_threshold: float = 0.1
    # The CUDA kernel samples 5-25 points adaptively
    # (bodyPartConnectorBase.cu:19); we use a fixed count that is a multiple of
    # the VPU lane width's friendly sizes. 25 covers the reference's maximum.
    num_line_samples: int = 25
    # PAF map-sampling implementation: "auto" | "gather" | "onehot"
    # (smap_tpu.ops.paf). "auto" picks the MXU one-hot-matmul path on TPU
    # backends (scalar gathers serialize there) and the direct gather on CPU.
    paf_impl: str = "auto"
    # bf16 terms the f32 PAF maps are split into for the MXU sampling
    # matmuls (pallas/onehot impls). 3 terms (24 mantissa bits) reconstruct
    # f32 exactly — the reference's precision; 2 (~1e-5 rel error) or 1
    # (bf16, ~4e-3) trade exactness for proportionally fewer matmul FLOPs
    # in the postprocessing hot kernel (serving knob).
    paf_parts: int = 3
    # Depth read-out along limbs (reference: exps/stage3_root2/test_util.py:60).
    num_depth_samples: int = 10
    # Association.
    max_people: int = 20
    ds_scale: float = float(STRIDE)
    bone_factor: float = 1.2
    # Greedy-loop implementation: "auto" | "scan" | "pallas"
    # (smap_tpu.ops.association). "auto" = pallas VMEM kernel on TPU
    # backends, lax.scan on CPU.
    assoc_impl: str = "auto"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Solver + loss settings (reference: exps/stage3_root2/config.py:48-64)."""

    img_per_device: int = 2
    base_lr: float = 2e-4
    weight_decay: float = 8e-6
    max_iter: int = 192_000
    warmup_iters: int = 2400
    warmup_factor: float = 0.1
    checkpoint_period: int = 4800
    # Reference schedule is quoted for 8 GPUs; iteration counts rescale by
    # 8 / num_devices (reference: exps/stage3_root2/train.py:30-33).
    nominal_devices: int = 8
    # Loss.
    ohkm: bool = True
    topk: int = 8
    coarse_to_fine: bool = True
    with_mds: bool = True
    max_people: int = 20
    # Label synthesis.
    gaussian_kernels: Tuple[Tuple[int, int], ...] = (
        (15, 15), (11, 11), (9, 9), (7, 7), (5, 5))
    paf_line_width: float = 1.0
    # Augmentation (reference: dataset/data_settings.py:56-62).
    center_trans_max: float = 40.0
    rotate_max_deg: float = 10.0
    flip_prob: float = 0.5
    scale_min: float = 0.8
    scale_max: float = 1.1
    # Opt-in: compose rotate+scale+crop(+flip) into ONE warpAffine resample
    # instead of the reference's rotate-warp + resize chain — ~2x faster
    # host augmentation with identical joint geometry but numerics-visible
    # pixel differences (single INTER_LINEAR resample).
    composed_warp: bool = False
    # Run the optimizer update on one flattened parameter vector
    # (optax.flatten): bit-identical Adam math (pinned by
    # tests/test_train_step.py), and the opt_state shrinks from ~600
    # leaves to 2 — the standalone per-leaf Adam program measured 184
    # ms/call on this relay (arg-handle/launch-bound, not FLOPs;
    # docs/perf_notes.md round-5). Changes the opt_state checkpoint
    # layout, so checkpoints are not interchangeable across this flag.
    flatten_opt: bool = True


@dataclasses.dataclass(frozen=True)
class RefineNetConfig:
    """RefineNet MLP + solver (reference: exps/refinenet_root2/config.py)."""

    in_dim: int = 75      # 15 joints x (2D xy + root-relative XYZ)
    out_dim: int = 45     # 15 joints x XYZ
    hidden: Tuple[int, ...] = (160, 256, 256, 128)
    batch_size: int = 1024
    base_lr: float = 0.08
    num_epochs: int = 200
    lr_step: int = 30
    lr_gamma: float = 0.5


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level config bundle."""

    skeleton: SkeletonConfig = SkeletonConfig()
    model: ModelConfig = ModelConfig()
    post: PostProcessConfig = PostProcessConfig()
    train: TrainConfig = TrainConfig()
    refine: RefineNetConfig = RefineNetConfig()
    input_shape: Tuple[int, int] = INPUT_SHAPE
    output_shape: Tuple[int, int] = OUTPUT_SHAPE
    stride: int = STRIDE
    output_dir: str = dataclasses.field(
        default_factory=lambda: os.environ.get("SMAP_TPU_OUTPUT", "model_logs"))


def default_config() -> Config:
    return Config()
