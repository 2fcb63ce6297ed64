from smap_tpu.ops.association import Bodies, associate
from smap_tpu.ops.nms import Peaks, extract_peaks
from smap_tpu.ops.paf import paf_scores

__all__ = ["Bodies", "Peaks", "associate", "extract_peaks", "paf_scores"]
