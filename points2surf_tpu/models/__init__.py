from points2surf_tpu.models.pointnet import STN, QSTN, PointNetFeat  # noqa: F401
from points2surf_tpu.models.p2s import PointsToSurfModel  # noqa: F401
from points2surf_tpu.models import losses  # noqa: F401
