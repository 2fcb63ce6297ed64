"""smap_tpu: TPU-native single-shot multi-person absolute 3D pose estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of zju3dv/SMAP
(ECCV 2020): a single-forward CNN predicting 2D keypoint heatmaps, part
affinity fields, part-relative depth maps and an absolute root-depth map for
all people in an image, with fully jit-compiled, batched post-processing
(peak NMS, PAF scoring, depth-aware greedy association, depth chaining and
back-projection) replacing the reference's CUDA/C++ "dapalib".
"""

from smap_tpu.config import Config, default_config

__version__ = "0.1.0"

__all__ = ["Config", "default_config", "__version__"]
