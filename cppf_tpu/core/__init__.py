from cppf_tpu.core import binning, geometry, targets  # noqa: F401
