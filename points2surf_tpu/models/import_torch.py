"""Import reference PyTorch checkpoints into our flax parameter pytree.

The released Points2Surf checkpoints are torch ``state_dict``s saved from a
``torch.nn.DataParallel``-wrapped model (keys prefixed ``module.``,
reference points_to_surf_train.py:513) with the module names of
source/points_to_surf_model.py. Our flax modules use the same names, with
two structural differences:

* STN/QSTN internals live under a ``trunk`` submodule;
* linear/norm leaves live under ``linear`` / ``norm`` (flax submodules).

Weight layout: torch Conv1d(k=1) ``(out, in, 1)`` and Linear ``(out, in)``
both map to flax Dense kernels ``(in, out)`` (transpose); BatchNorm
``weight/bias/running_mean/running_var`` map to ``scale/bias`` (params) and
``mean/var`` (batch_stats).
"""

from __future__ import annotations

import numpy as np

_STN_MODULES = {"stn1", "stn2", "point_stn"}


def _set(tree: dict, path: list, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state_dict: dict):
    """torch state_dict (tensors or numpy) -> (params, batch_stats) pytrees.

    Accepts DataParallel-prefixed keys. Ignores num_batches_tracked.
    """
    params: dict = {}
    batch_stats: dict = {}

    for key, val in state_dict.items():
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "module":
            parts = parts[1:]
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        module_path = parts[:-1]

        # insert 'trunk' inside STN/QSTN modules
        out_path: list = []
        for i, comp in enumerate(module_path):
            out_path.append(comp)
            if comp in _STN_MODULES and i + 1 < len(module_path):
                out_path.append("trunk")

        layer = module_path[-1]
        is_norm = layer.startswith("bn")
        if is_norm:
            out_path.append("norm")
            if leaf == "weight":
                _set(params, out_path + ["scale"], val)
            elif leaf == "bias":
                _set(params, out_path + ["bias"], val)
            elif leaf == "running_mean":
                _set(batch_stats, out_path + ["mean"], val)
            elif leaf == "running_var":
                _set(batch_stats, out_path + ["var"], val)
            else:
                raise ValueError(f"unknown norm leaf: {key}")
        else:
            out_path.append("linear")
            if leaf == "weight":
                if val.ndim == 3:  # Conv1d(k=1): (out, in, 1)
                    kernel = val[:, :, 0].T
                elif val.ndim == 2:  # Linear: (out, in)
                    kernel = val.T
                else:
                    raise ValueError(f"unexpected weight shape {val.shape}: {key}")
                _set(params, out_path + ["kernel"], np.ascontiguousarray(kernel))
            elif leaf == "bias":
                _set(params, out_path + ["bias"], val)
            else:
                raise ValueError(f"unknown linear leaf: {key}")

    return params, batch_stats


def _flatten(tree: dict, prefix=()):
    for key, val in tree.items():
        if isinstance(val, dict):
            yield from _flatten(val, prefix + (key,))
        else:
            yield prefix + (key,), val


def export_state_dict(params: dict, batch_stats: dict | None = None,
                      data_parallel: bool = False) -> dict:
    """Inverse of :func:`convert_state_dict`: flax pytrees -> a torch-layout
    ``state_dict`` of numpy arrays loadable by the reference's
    ``PointsToSurfModel.load_state_dict`` (points_to_surf_train.py:513 saves
    the same layout). Lets a TPU-trained checkpoint drive the reference's
    torch eval stack (and users migrate back).

    ``data_parallel=True`` prefixes keys with ``module.`` like the released
    DataParallel checkpoints. ``num_batches_tracked`` is emitted as 0 for
    every norm module so ``load_state_dict(strict=True)`` passes.
    """
    state: dict = {}

    def torch_key(path):
        # drop the inserted 'trunk' levels; path ends (layer, kind, leaf)
        mods = [p for p in path[:-2] if p != "trunk"]
        return ".".join((["module"] if data_parallel else []) + mods)

    for path, val in _flatten(params):
        val = np.asarray(val)
        layer, kind, leaf = path[-3], path[-2], path[-1]
        base = torch_key(path)
        if kind == "norm":
            if leaf == "scale":
                state[base + ".weight"] = val
            elif leaf == "bias":
                state[base + ".bias"] = val
            else:
                raise ValueError(f"unknown norm param leaf: {path}")
            state.setdefault(base + ".num_batches_tracked",
                             np.asarray(0, np.int64))
        elif kind == "linear":
            if leaf == "kernel":
                if layer.startswith("conv"):  # torch Conv1d(k=1)
                    state[base + ".weight"] = np.ascontiguousarray(
                        val.T[:, :, None]
                    )
                else:  # torch Linear
                    state[base + ".weight"] = np.ascontiguousarray(val.T)
            elif leaf == "bias":
                state[base + ".bias"] = val
            else:
                raise ValueError(f"unknown linear leaf: {path}")
        else:
            raise ValueError(f"unexpected param path: {path}")

    for path, val in _flatten(batch_stats or {}):
        base = torch_key(path)
        leaf = path[-1]
        if leaf == "mean":
            state[base + ".running_mean"] = np.asarray(val)
        elif leaf == "var":
            state[base + ".running_var"] = np.asarray(val)
        else:
            raise ValueError(f"unknown batch_stats leaf: {path}")
        state.setdefault(base + ".num_batches_tracked",
                         np.asarray(0, np.int64))

    return state


def load_torch_checkpoint(path: str):
    """Load a reference ``*.pth`` checkpoint file -> (params, batch_stats)."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(state_dict)


def convert_params_namespace(pth_params_path: str):
    """Load the reference's pickled argparse namespace (``*_params.pth``)."""
    import torch

    return torch.load(pth_params_path, map_location="cpu", weights_only=False)
