from points2surf_tpu.ops import geometry, knn, subsample, patches, voxel  # noqa: F401
