from smap_tpu.data.datasets import (JointDataset, P2PDataset, epoch_indices,
                                    load_annotations, train_iterator)
from smap_tpu.data.preprocess import letterbox_image, normalize_image

__all__ = ["JointDataset", "P2PDataset", "epoch_indices", "load_annotations",
           "train_iterator", "letterbox_image", "normalize_image"]
