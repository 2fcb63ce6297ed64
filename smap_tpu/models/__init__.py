from smap_tpu.models.refinenet import RefineNet
from smap_tpu.models.smap import SMAP

__all__ = ["SMAP", "RefineNet"]
