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


def test_thin_style_meshes_are_watertight_and_thin():
    """The thin-feature family (plates/rods/rings, 2-5% extent) must
    produce watertight solids whose minimal thickness is genuinely small
    relative to the bounding extent — the proc_00061-class failure mode
    (docs/VALIDATION.md) made trainable."""
    import numpy as np

    thin_ratio = []
    for seed in range(400, 403):
        mesh = generate_mesh(seed, style="thin")
        assert mesh.is_watertight()
        v = mesh.vertices
        extent = (v.max(0) - v.min(0)).max()
        # thickness proxy: volume / surface area ~ half the plate
        # thickness for plate-like bodies
        fv = v[mesh.faces]
        area = float(np.linalg.norm(
            np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]), axis=1
        ).sum()) * 0.5
        thin_ratio.append(2.0 * mesh.volume / max(area, 1e-9) / extent)
    assert min(thin_ratio) < 0.08, thin_ratio
