from points2surf_tpu.data.shapes import Shape, ShapeStore  # noqa: F401
from points2surf_tpu.data.samplers import (  # noqa: F401
    RandomPatchSampler,
    SequentialPatchSampler,
    SequentialShapeRandomPatchSampler,
)
from points2surf_tpu.data.pipeline import PatchPipeline  # noqa: F401
