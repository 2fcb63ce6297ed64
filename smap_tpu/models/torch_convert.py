"""PyTorch checkpoint <-> JAX pytree converters for SMAP / RefineNet
(both directions: reference .pth -> our variables, and export back).

Maps the reference's state_dict naming (``model/smap.py`` module tree in
zju3dv/SMAP, e.g. ``stage0.downsample.layer1.0.conv_bn_relu1.conv.weight``)
onto our Flax parameter tree. Weight layout conversions:

* Conv2d: torch OIHW -> flax HWIO.
* Linear: torch [out, in] -> flax [in, out].
* BatchNorm: weight/bias -> params scale/bias; running_mean/var ->
  batch_stats mean/var; ``num_batches_tracked`` dropped.

Only `numpy` + a torch-free ``torch.load`` shim are required at call time;
torch tensors are converted eagerly.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

_LAYER_IDX = re.compile(r"^(layer[1-4])\.(\d+)$")


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_smap_state_dict(state_dict: Mapping[str, Any]
                            ) -> Dict[str, Dict[str, Any]]:
    """Convert a reference SMAP state_dict to {'params':..., 'batch_stats':...}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        # torch Sequential index "layerX.N" -> our block name "layerX_N".
        merged = []
        i = 0
        while i < len(parts):
            if (i + 1 < len(parts) and parts[i].startswith("layer")
                    and _LAYER_IDX.match(parts[i] + "." + parts[i + 1])):
                merged.append(f"{parts[i]}_{parts[i + 1]}")
                i += 2
            else:
                merged.append(parts[i])
                i += 1
        *scope, module, leaf = merged
        arr = _to_numpy(value)
        path = tuple(scope) + (module,)
        if module == "conv":
            if leaf == "weight":
                _set(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
            else:
                _set(params, path + ("bias",), arr)
        elif module == "bn":
            if leaf == "weight":
                _set(params, path + ("scale",), arr)
            elif leaf == "bias":
                _set(params, path + ("bias",), arr)
            elif leaf == "running_mean":
                _set(stats, path + ("mean",), arr)
            elif leaf == "running_var":
                _set(stats, path + ("var",), arr)
            else:
                raise KeyError(f"unexpected bn leaf in {key}")
        else:
            raise KeyError(f"unexpected module in {key}")
    return {"params": params, "batch_stats": stats}


def convert_refinenet_state_dict(state_dict: Mapping[str, Any]
                                 ) -> Dict[str, Dict[str, Any]]:
    """Convert a reference RefineNet state_dict.

    Reference layout (model/refinenet.py:8-16): ``block.layerN.0`` = Linear,
    ``block.layerN.1`` = BatchNorm1d for N in 1..4; ``block.layer5`` = Linear.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "block":
            parts = parts[1:]
        layer = parts[0]  # layerN
        if layer == "layer5":
            leaf = parts[-1]
            if leaf == "weight":
                _set(params, ("layer5", "kernel"), arr.T)
            else:
                _set(params, ("layer5", "bias"), arr)
            continue
        sub, leaf = parts[1], parts[2]
        n = layer[len("layer"):]
        if sub == "0":  # Linear
            if leaf == "weight":
                _set(params, (layer, "kernel"), arr.T)
            else:
                _set(params, (layer, "bias"), arr)
        else:  # BatchNorm1d
            name = f"bn{n}"
            if leaf == "weight":
                _set(params, (name, "scale"), arr)
            elif leaf == "bias":
                _set(params, (name, "bias"), arr)
            elif leaf == "running_mean":
                _set(stats, (name, "mean"), arr)
            elif leaf == "running_var":
                _set(stats, (name, "var"), arr)
    return {"params": params, "batch_stats": stats}


def _flatten(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


_MERGED_LAYER = re.compile(r"^(layer[1-4])_(\d+)$")


def _unmerge(scope: Tuple[str, ...]) -> str:
    """Our block names back to torch Sequential dotted keys
    (``layer1_0`` -> ``layer1.0``)."""
    parts = []
    for p in scope:
        m = _MERGED_LAYER.match(p)
        parts.append(f"{m.group(1)}.{m.group(2)}" if m else p)
    return ".".join(parts)


def export_smap_state_dict(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`convert_smap_state_dict`: our
    {'params', 'batch_stats'} pytree -> a reference-layout state_dict of
    numpy arrays (torch OIHW conv kernels, ``num_batches_tracked`` zeros),
    loadable by the reference ``model/smap.py`` after ``torch.save``.
    """
    out: Dict[str, Any] = {}
    for path, arr in _flatten(variables["params"]):
        *scope, module, leaf = path
        key = _unmerge(tuple(scope) + (module,))
        if module == "conv":
            if leaf == "kernel":
                out[f"{key}.weight"] = arr.transpose(3, 2, 0, 1)
            else:
                out[f"{key}.bias"] = arr
        elif module == "bn":
            out[f"{key}.{'weight' if leaf == 'scale' else 'bias'}"] = arr
        else:
            raise KeyError(f"unexpected param module in {path}")
    for path, arr in _flatten(variables["batch_stats"]):
        *scope, module, leaf = path
        key = _unmerge(tuple(scope) + (module,))
        out[f"{key}.running_{'mean' if leaf == 'mean' else 'var'}"] = arr
        out[f"{key}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def export_refinenet_state_dict(variables: Mapping[str, Any]
                                ) -> Dict[str, Any]:
    """Inverse of :func:`convert_refinenet_state_dict` (reference layout:
    ``block.layerN.0`` Linear / ``block.layerN.1`` BatchNorm1d,
    ``block.layer5`` Linear)."""
    out: Dict[str, Any] = {}
    for (name, leaf), arr in _flatten(variables["params"]):
        if name == "layer5":
            out[f"block.layer5.{'weight' if leaf == 'kernel' else 'bias'}"
                ] = arr.T if leaf == "kernel" else arr
        elif name.startswith("layer"):
            out[f"block.{name}.0.{'weight' if leaf == 'kernel' else 'bias'}"
                ] = arr.T if leaf == "kernel" else arr
        else:  # bnN
            n = name[len("bn"):]
            out[f"block.layer{n}.1.{'weight' if leaf == 'scale' else 'bias'}"
                ] = arr
    for (name, leaf), arr in _flatten(variables["batch_stats"]):
        n = name[len("bn"):]
        out[f"block.layer{n}.1.running_{'mean' if leaf == 'mean' else 'var'}"
            ] = arr
        out[f"block.layer{n}.1.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def save_torch_checkpoint(state_dict: Mapping[str, Any], path: str) -> None:
    """torch.save a numpy state_dict as {'model': tensors} (the reference
    checkpoint schema, engine.py:100-105)."""
    import torch

    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in state_dict.items()}
    torch.save({"model": tensors}, path)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .pth file (expects dict possibly nested under 'model')."""
    import torch  # local import: torch only needed for checkpoint IO

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    return {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in state.items()}
