"""FCN-ResNet50 semantic segmenter (laptop lid/base auxiliary head).

Equivalent of the reference's ``torchvision fcn_resnet50(num_classes=2)``
with every BatchNorm swapped for InstanceNorm (reference
train_laptop_aux.py:26-27, utils/util.py:41-58): a dilated ResNet-50
(output stride 8) + FCN head, bilinearly upsampled to the input size.
InstanceNorm = GroupNorm with one channel per group (per-sample statistics,
no running stats), matching the training-mode behaviour the reference relies
on.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class InstanceNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [H, W, C] or [B, H, W, C]
        axes = tuple(range(x.ndim - 3, x.ndim - 1))  # spatial dims
        mu = jnp.mean(x, axes, keepdims=True)
        var = jnp.var(x, axes, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale + bias


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * self.expansion
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = InstanceNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=self.dilation, use_bias=False, name="conv2",
        )(y)
        y = InstanceNorm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = InstanceNorm(name="bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            residual = InstanceNorm(name="down_bn")(residual)
        return nn.relu(y + residual)


class FCNResNet50(nn.Module):
    """Dilated ResNet-50 backbone + FCN head, NHWC."""

    num_classes: int = 2
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="stem_conv")(x)
        y = InstanceNorm(name="stem_bn")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # torchvision fcn_resnet50: replace_stride_with_dilation=[False, True, True]
        specs = [
            (64, 1, 1),    # layer1
            (128, 2, 1),   # layer2
            (256, 1, 2),   # layer3 (dilated, stride folded into dilation)
            (512, 1, 4),   # layer4
        ]
        for li, ((feats, stride, dil), blocks) in enumerate(zip(specs, self.layers)):
            for b in range(blocks):
                y = Bottleneck(
                    feats,
                    stride=stride if b == 0 else 1,
                    dilation=dil,
                    name=f"layer{li+1}_{b}",
                )(y)

        # FCN head (torchvision FCNHead): 3x3 conv -> norm -> relu -> 1x1
        y = nn.Conv(512, (3, 3), padding=1, use_bias=False, name="head_conv")(y)
        y = InstanceNorm(name="head_bn")(y)
        y = nn.relu(y)
        if train:
            y = nn.Dropout(0.1, deterministic=False)(y)
        y = nn.Conv(self.num_classes, (1, 1), name="head_out")(y)
        y = jax.image.resize(y, (*y.shape[:-3], h, w, self.num_classes), "bilinear")
        return y


class SegmenterRunner:
    """Loads a trained segmenter checkpoint and predicts label maps."""

    def __init__(self, ckpt_dir: str, num_classes: int = 2):
        from cppf_tpu.train.checkpoints import load_params

        self.model = FCNResNet50(num_classes=num_classes)
        self.params = load_params(ckpt_dir, name="params_best")
        self._apply = jax.jit(lambda p, x: jnp.argmax(self.model.apply(p, x), -1))

    def predict(self, rgb: np.ndarray) -> np.ndarray:
        """rgb: [H, W, 3] float in [0,1] → int labels [H, W]."""
        out = self._apply(self.params, jnp.asarray(rgb, jnp.float32)[None])
        return np.asarray(out[0])
