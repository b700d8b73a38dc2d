"""cppf_tpu — a TPU-native framework for category-level 9D pose estimation.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
CPPF (You et al., CVPR 2022): sim-to-real training on rendered ShapeNet depth,
SE(3)-invariant point-pair encoders, and bottom-up Hough voting for center,
orientation axes and scale, evaluated with the NOCS REAL275 / SUN RGB-D mAP
protocols.

Layout
------
- ``cppf_tpu.core``     pure-JAX geometry, soft-binning codec, voting targets
- ``cppf_tpu.ops``      TPU-native replacements for the reference's C++/CUDA ops
                        (voxel downsample, KNN normals, RANSAC planes, the three
                        voting kernels, peak finding)
- ``cppf_tpu.models``   flax encoders (SPRIN point encoder, PPF pair head,
                        FCN-ResNet50 segmenter) + torch weight converter
- ``cppf_tpu.pipeline`` the single fully-jitted ``estimate_pose`` program
- ``cppf_tpu.data``     depth rendering (native C++ rasterizer), ShapeNet
                        dataset, on-device target generation, category stats
- ``cppf_tpu.train``    jitted train step, optax/orbax training loop
- ``cppf_tpu.eval``     NOCS / SUN RGB-D inference drivers and host-side mAP
- ``cppf_tpu.parallel`` device-mesh utilities and pair-sharded voting
"""

__version__ = "0.1.0"
