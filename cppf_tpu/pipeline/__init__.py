from cppf_tpu.pipeline.pose import PoseConfig, PoseResult, estimate_pose, make_models  # noqa: F401
from cppf_tpu.pipeline.preprocess import preprocess_cloud  # noqa: F401
