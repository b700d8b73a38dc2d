from cppf_tpu.models.encoders import PointEncoder, PPFEncoder  # noqa: F401
