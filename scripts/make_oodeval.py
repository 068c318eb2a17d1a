"""Rebuild the proc_120 OOD eval shapes as a tiny eval-only dataset.

Round 2/3 identified proc_00061 (csg-incidental thin features) as the
out-of-distribution reconstruction outlier, with proc_00026/59/79 as the
other documented test shapes (docs/VALIDATION.md). Procedural meshes are
deterministic in (seed, style) and virtual scans are seeded by filename
hash (datagen/make_dataset.py:168-170), so regenerating these shapes by
seed reproduces the round-3 eval inputs exactly — the flagship's OOD
claim can be tested apples-to-apples against the recorded round-3
numbers (sign-err 3.84% / HD 0.14 on proc_00061 for r3gate_f32).

Usage:
  python scripts/make_oodeval.py            # writes base meshes + ini
  python -m points2surf_tpu.cli.make_dataset --name proc_oodeval --workers 2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from points2surf_tpu.datagen.procedural import generate_mesh  # noqa: E402
from points2surf_tpu.utils import mesh_io  # noqa: E402

SEEDS = [26, 59, 61, 79, 11, 43]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "datasets/proc_oodeval/00_base_meshes")
    os.makedirs(out, exist_ok=True)
    for seed in SEEDS:
        f = os.path.join(out, f"proc_{seed:05d}.ply")
        if not os.path.isfile(f):
            m = generate_mesh(seed, None)  # styles=None = proc_120's draw
            mesh_io.write_ply(f, m.vertices, m.faces)
            print(f"wrote {f} ({len(m.faces)} faces)")
    ini = os.path.join(root, "datasets/proc_oodeval/settings.ini")
    with open(ini, "w") as fh:
        fh.write("[general]\nonly_for_evaluation = 1\n")
    print("done; run cli.make_dataset --name proc_oodeval next")


if __name__ == "__main__":
    main()
