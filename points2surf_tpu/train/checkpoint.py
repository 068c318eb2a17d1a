"""Checkpointing: params + batch stats + optimizer state + config.

Improves on the reference, which persists only the model state_dict and
loses optimizer/scheduler state across --refine restarts
(source/points_to_surf_train.py:511-517, SURVEY §5). Format: a flat
path-keyed ``.npz`` (tree paths as archive keys, see ``save_state``) holding
the whole train state, plus a JSON sidecar for the config namespace (the
reference pickles the argparse namespace into ``*_params.pth``; ours is
``*_params.json``).
"""

from __future__ import annotations

import json
import math
import os
import re

import jax
import numpy as np

from points2surf_tpu.utils import file_utils

MODEL_SUFFIX = "_model.npz"


def _flatten(tree) -> dict:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): leaf for path, leaf in leaves}


def save_state(path: str, state_dict: dict) -> None:
    """Persist a pytree as a flat npz keyed by tree paths.

    Path-keyed flat storage (instead of a structural blob) makes restores
    robust to optimizer-state structure differences: eval restores only the
    params/batch_stats subset it asks for.
    """
    file_utils.make_dir_for_file(path)
    flat = {k: np.asarray(v) for k, v in _flatten(state_dict).items()}
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)


def load_state(path: str, template: dict, strict: bool = True) -> dict:
    """Restore a pytree from npz; template supplies the structure.

    With strict=False, leaves missing from the file keep their template
    values (used by eval, which doesn't need optimizer state).
    """
    with np.load(path) as data:
        paths_leaves = jax.tree_util.tree_flatten_with_path(template)
        leaves, treedef = paths_leaves
        out = []
        for key_path, leaf in leaves:
            key = jax.tree_util.keystr(key_path)
            if key in data.files:
                out.append(data[key])
            elif strict:
                raise KeyError(f"checkpoint {path} is missing {key}")
            else:
                out.append(leaf)
    structure = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(structure, out)


def save_params_namespace(path: str, opt) -> None:
    file_utils.make_dir_for_file(path)
    d = {k: v for k, v in vars(opt).items()}
    with open(path, "w") as f:
        json.dump(d, f, indent=2, default=str)


def load_params_namespace(path: str):
    import argparse

    with open(path) as f:
        d = json.load(f)
    return argparse.Namespace(**d)


def epoch_from_filename(path: str) -> int:
    """Parse '<name>_model_<epoch>.*' -> epoch + 1, else 0
    (reference points_to_surf_train.py:267-282)."""
    stem = os.path.basename(path)
    m = re.search(r"_(\d+)\.[^.]+$", stem)
    return int(m.group(1)) + 1 if m else 0


def is_snapshot_epoch(epoch: int, nepoch: int) -> bool:
    """Log-spaced immutable snapshots: epochs 0,5,10,50,100,500,... plus
    every 100 and the final epoch (reference train.py:516)."""
    base = 5 * 10 ** math.floor(math.log10(max(2, epoch - 1)))
    return epoch % base == 0 or epoch % 100 == 0 or epoch == nepoch - 1
