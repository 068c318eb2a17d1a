from points2surf_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    replicate_array,
    shard_batch,
)
from points2surf_tpu.parallel import distributed  # noqa: F401
