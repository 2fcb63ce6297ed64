"""Every public module imports cleanly (catches missing deps / circulars)."""

import importlib

import pytest

MODULES = [
    "smap_tpu",
    "smap_tpu.config",
    "smap_tpu.camera",
    "smap_tpu.losses",
    "smap_tpu.inference",
    "smap_tpu.models",
    "smap_tpu.models.layers",
    "smap_tpu.models.smap",
    "smap_tpu.models.refinenet",
    "smap_tpu.models.torch_convert",
    "smap_tpu.ops",
    "smap_tpu.ops.nms",
    "smap_tpu.ops.paf",
    "smap_tpu.ops.association",
    "smap_tpu.ops.depth",
    "smap_tpu.ops.postprocess",
    "smap_tpu.ops.refine",
    "smap_tpu.ops.pallas_kernels",
    "smap_tpu.data",
    "smap_tpu.data.datasets",
    "smap_tpu.data.labels",
    "smap_tpu.data.augmentation",
    "smap_tpu.data.preprocess",
    "smap_tpu.data.native",
    "smap_tpu.data.coco_convert",
    "smap_tpu.train",
    "smap_tpu.train.engine",
    "smap_tpu.train.solver",
    "smap_tpu.train.step",
    "smap_tpu.train.refine",
    "smap_tpu.parallel",
    "smap_tpu.parallel.mesh",
    "smap_tpu.parallel.distributed",
    "smap_tpu.evaluation",
    "smap_tpu.evaluation.mupots",
    "smap_tpu.evaluation.mupots_data",
    "smap_tpu.evaluation.convert",
    "smap_tpu.evaluation.register",
    "smap_tpu.evaluation.panoptic",
    "smap_tpu.utils.align",
    "smap_tpu.utils.cache",
    "smap_tpu.utils.metrics",
    "smap_tpu.utils.timer",
    "smap_tpu.utils.visualize",
]


@pytest.mark.parametrize("mod", MODULES)
def test_import(mod):
    importlib.import_module(mod)
