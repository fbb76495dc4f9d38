from morig_tpu.kernels.neighbors import (  # noqa: F401
    fps, knn, knn_interpolate, masked_max, masked_mean, pairwise_sqdist,
    radius_group,
)
