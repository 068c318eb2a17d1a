"""Dataset / model download helpers (reference datasets/download_*.py,
models/download_*.py): fetch zips from the TU Wien server and extract.

Usage: python -m points2surf_tpu.cli.download [datasets|models] [names...]
"""

from __future__ import annotations

import os
import sys
import urllib.error
import urllib.request
import zipfile

BASE_URL = "https://www.cg.tuwien.ac.at/research/publications/2020/erler-2020-p2s/"

DATASETS = {
    "abc_minimal": "erler-2020-p2s-abc_minimal.zip",
    "abc": "erler-2020-p2s-abc.zip",
    "abc_extra_noisy": "erler-2020-p2s-abc_extra_noisy.zip",
    "abc_noisefree": "erler-2020-p2s-abc_noisefree.zip",
    "famous_original": "erler-2020-p2s-famous_original.zip",
    "famous_noisefree": "erler-2020-p2s-famous_noisefree.zip",
    "famous_sparse": "erler-2020-p2s-famous_sparse.zip",
    "famous_dense": "erler-2020-p2s-famous_dense.zip",
    "famous_extra_noisy": "erler-2020-p2s-famous_extra_noisy.zip",
    "thingi10k_scans_original": "erler-2020-p2s-thingi10k_scans_original.zip",
    "real_world": "erler-2020-p2s-real_world.zip",
}
MODELS = {
    "vanilla": "erler-2020-p2s-vanilla.zip",
    "ablation": "erler-2020-p2s-ablation.zip",
    "max": "erler-2020-p2s-max.zip",
}


def download_and_unzip(url: str, target_dir: str) -> bool:
    os.makedirs(target_dir, exist_ok=True)
    zip_path = os.path.join(target_dir, os.path.basename(url))
    try:
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, zip_path)
    except (urllib.error.URLError, OSError) as e:
        print(f"download failed ({e}); if this host has no egress, fetch "
              f"{url} elsewhere and unzip into {target_dir}")
        return False
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(target_dir)
    os.remove(zip_path)
    return True


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    kind = argv[0] if argv else "datasets"
    table = DATASETS if kind == "datasets" else MODELS
    target = "datasets" if kind == "datasets" else "models"
    names = argv[1:] or list(table)
    for name in names:
        if name not in table:
            print(f"unknown {kind} name: {name} (known: {sorted(table)})")
            continue
        download_and_unzip(BASE_URL + table[name], target)


if __name__ == "__main__":
    main()
