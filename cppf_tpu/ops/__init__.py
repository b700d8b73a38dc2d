from cppf_tpu.ops.knn import knn_indices, pairwise_dist  # noqa: F401
from cppf_tpu.ops.normals import estimate_normals  # noqa: F401
from cppf_tpu.ops.quantize import voxel_downsample, voxel_downsample_np  # noqa: F401
from cppf_tpu.ops.voting import (  # noqa: F401
    backvote,
    ppf_vote,
    ppf_vote_peak,
    rot_vote,
    sphere_bin_count,
)
from cppf_tpu.ops.ransac import segment_plane  # noqa: F401
