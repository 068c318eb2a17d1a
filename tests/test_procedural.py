import os

import numpy as np
import pytest

from points2surf_tpu.datagen.procedural import (
    generate_mesh,
    icosphere,
    make_procedural_meshes,
)
from points2surf_tpu.utils import mesh_io
from points2surf_tpu.utils.mesh import Mesh


def test_icosphere_subdivision_counts():
    for sub, (nv, nf) in enumerate([(12, 20), (42, 80), (162, 320)]):
        v, f = icosphere(sub)
        assert v.shape == (nv, 3) and f.shape == (nf, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
        assert Mesh(v.astype(np.float32), f).is_watertight()


@pytest.mark.parametrize("style", ["csg", "bumpy", "hull"])
def test_generate_mesh_styles_watertight(style):
    for seed in range(3):
        m = generate_mesh(seed, style)
        assert m.is_watertight()
        assert m.volume > 1e-6  # outward-oriented solid
        lo, hi = m.bounds()  # arbitrary scale: the pipeline's normalize
        assert np.isfinite(lo).all() and np.isfinite(hi).all()
        assert (hi - lo).max() < 10.0  # stage maps to the unit cube


def test_generate_mesh_diversity():
    """Different seeds must give genuinely different shapes."""
    vols = [generate_mesh(s).volume for s in range(8)]
    assert len({round(v, 3) for v in vols}) >= 6


def test_make_procedural_meshes_layout(tmp_path):
    names = make_procedural_meshes(str(tmp_path), 4, seed=100)
    assert len(names) == 4
    for name in names:
        p = os.path.join(tmp_path, "00_base_meshes", name + ".ply")
        v, f = mesh_io.load_mesh(p)
        assert Mesh(v, f).is_watertight()
