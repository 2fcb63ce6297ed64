"""Suffix-matching parameter alignment for partial checkpoint loading.

Equivalent of the reference's maskrcnn-benchmark-style loader
(``cvpack/torch_modeling/engine/checkpoint.py:50-89`` and
``lib/utils/model_serialization.py:8-78`` in zju3dv/SMAP): when restoring a
checkpoint whose keys are prefixed/renamed (e.g. backbone-only weights),
each model parameter is matched to the loaded entry whose flattened name is
the longest suffix match, shapes permitting; unmatched parameters keep
their current values and are reported.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

import numpy as np


def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Any:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    return tree


def align_and_update(target: Any, loaded: Any,
                     logger: logging.Logger = None) -> Tuple[Any, List[str]]:
    """Fill ``target`` (pytree of arrays) from ``loaded`` by suffix match.

    Returns (updated tree, list of unmatched target keys).
    """
    tflat = _flatten(target)
    lflat = _flatten(loaded)
    lkeys = {"/".join(k): v for k, v in lflat.items()}
    missing = []
    out = {}
    for path, value in tflat.items():
        name = "/".join(path)
        best = None
        for lname, lval in lkeys.items():
            if name == lname or name.endswith("/" + lname) \
                    or lname.endswith("/" + name):
                if np.shape(lval) == np.shape(value):
                    if best is None or len(lname) > len(best):
                        best = lname
        if best is not None:
            out[path] = np.asarray(lkeys[best])
        else:
            out[path] = value
            missing.append(name)
    if missing and logger is not None:
        logger.warning("unmatched parameters kept at init: %s",
                       ", ".join(missing[:20]))
    return _unflatten(out), missing
