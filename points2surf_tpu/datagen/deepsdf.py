"""DeepSDF-format dataset exporter (reference dataset_for_deepsdf.py).

Converts a Points2Surf dataset into DeepSDF's training layout:
``SdfSamples/<dataset>/<class>/<shape>.npz`` with ``pos``/``neg`` arrays of
(x, y, z, sdf) rows — NOTE DeepSDF's sign convention is negative-inside,
the opposite of ours/trimesh's, so distances are negated on export
(reference dataset_for_deepsdf.py convert_sdfs) — plus a specs.json
template and train/test split json files.
"""

from __future__ import annotations

import json
import os

import numpy as np

from points2surf_tpu.utils import file_utils

SPECS_TEMPLATE = {
    "Description": "exported by points2surf_tpu",
    "DataSource": "data/",
    "TrainSplit": "",
    "TestSplit": "",
    "NetworkArch": "deep_sdf_decoder",
    "NetworkSpecs": {
        "dims": [512, 512, 512, 512, 512, 512, 512, 512],
        "dropout": [0, 1, 2, 3, 4, 5, 6, 7],
        "dropout_prob": 0.2,
        "norm_layers": [0, 1, 2, 3, 4, 5, 6, 7],
        "latent_in": [4],
        "xyz_in_all": False,
        "use_tanh": False,
        "latent_dropout": False,
        "weight_norm": True,
    },
    "CodeLength": 256,
    "NumEpochs": 2001,
    "SnapshotFrequency": 100,
    "ScenesPerBatch": 64,
    "SamplesPerScene": 16384,
    "DataLoaderThreads": 16,
    "ClampingDistance": 0.1,
}


def make_sdf_samples(query_pts: np.ndarray, query_dist: np.ndarray):
    """Split (points, signed dists) into DeepSDF pos/neg arrays.

    DeepSDF: positive = outside. Our convention: positive = inside, so the
    sign is flipped here (reference convert_sdfs flips via its own chain).
    """
    sdf = -query_dist.astype(np.float32)
    rows = np.concatenate(
        [query_pts.astype(np.float32), sdf[:, None]], axis=1
    )
    return rows[sdf >= 0.0], rows[sdf < 0.0]


def convert_sdfs(base_dir, dataset_dir, out_dir, dataset_name=None,
                 class_name="all"):
    """Export 05_query_{pts,dist} into SdfSamples npz files + split jsons +
    specs.json."""
    dataset_name = dataset_name or dataset_dir
    d_pts = os.path.join(base_dir, dataset_dir, "05_query_pts")
    d_dist = os.path.join(base_dir, dataset_dir, "05_query_dist")
    d_out = os.path.join(out_dir, "SdfSamples", dataset_name, class_name)
    os.makedirs(d_out, exist_ok=True)

    shapes = []
    for f in sorted(os.listdir(d_pts)):
        if not f.endswith(".npy"):
            continue
        stem = f[:-8]
        pts = np.load(os.path.join(d_pts, f))
        dist = np.load(os.path.join(d_dist, f))
        pos, neg = make_sdf_samples(pts, dist)
        np.savez(os.path.join(d_out, stem + ".npz"), pos=pos, neg=neg)
        shapes.append(stem)

    def write_split(path, names):
        file_utils.make_dir_for_file(path)
        with open(path, "w") as fh:
            json.dump({dataset_name: {class_name: names}}, fh, indent=2)

    def read_set(name):
        p = os.path.join(base_dir, dataset_dir, name)
        if os.path.isfile(p):
            with open(p) as fh:
                return [ln.strip() for ln in fh if ln.strip()]
        return []

    train = [s for s in read_set("trainset.txt") if s in shapes] or shapes
    test = [s for s in read_set("testset.txt") if s in shapes] or shapes
    write_split(os.path.join(out_dir, "splits", dataset_name + "_train.json"),
                train)
    write_split(os.path.join(out_dir, "splits", dataset_name + "_test.json"),
                test)

    specs = dict(SPECS_TEMPLATE)
    specs["TrainSplit"] = f"splits/{dataset_name}_train.json"
    specs["TestSplit"] = f"splits/{dataset_name}_test.json"
    with open(os.path.join(out_dir, "specs.json"), "w") as fh:
        json.dump(specs, fh, indent=2)
    return shapes
