"""FCN-ResNet50 semantic segmenter (laptop lid/base auxiliary head).

Equivalent of the reference's ``torchvision fcn_resnet50(num_classes=2)``
with every BatchNorm swapped for InstanceNorm (reference
train_laptop_aux.py:26-27, utils/util.py:41-58): a dilated ResNet-50
(output stride 8) + FCN head, bilinearly upsampled to the input size.
See :class:`InstanceNorm` for the running-stats subtlety of the reference's
eval path; weight-level parity with the torch model is tested in
tests/test_segmenter.py via models/convert.py::fcn_resnet50_from_torch.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class InstanceNorm(nn.Module):
    """InstanceNorm2d equivalent.

    The reference builds its segmenter by swapping every BatchNorm2d for an
    InstanceNorm2d that inherits ``track_running_stats=True``
    (utils/util.py:49-50), then runs inference under ``.eval()``
    (nocs/inference.py:94-95) — i.e. normalising with the **running**
    per-channel statistics accumulated during training, not per-sample
    stats.  ``track_stats=True`` reproduces that eval behaviour (the
    ``mean``/``var`` params are filled by the torch converter or learned as
    EMA); False is the train-mode per-sample form our own training uses.
    """

    eps: float = 1e-5
    track_stats: bool = False

    @nn.compact
    def __call__(self, x):  # [H, W, C] or [B, H, W, C]
        c = x.shape[-1]
        if self.track_stats:
            # running statistics live in the params tree (the torch converter
            # fills them) but are frozen buffers, not weights: stop_gradient
            # keeps fine-tuning from applying gradients to them, matching
            # torch's non-trainable running buffers
            mu = jax.lax.stop_gradient(self.param("mean", nn.initializers.zeros, (c,)))
            var = jax.lax.stop_gradient(self.param("var", nn.initializers.ones, (c,)))
        else:
            axes = tuple(range(x.ndim - 3, x.ndim - 1))  # spatial dims
            mu = jnp.mean(x, axes, keepdims=True)
            var = jnp.var(x, axes, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale + bias


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 4
    track_stats: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * self.expansion
        norm = lambda name: InstanceNorm(name=name, track_stats=self.track_stats)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=self.dilation, use_bias=False, name="conv2",
        )(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            residual = norm("down_bn")(residual)
        return nn.relu(y + residual)


class FCNResNet50(nn.Module):
    """Dilated ResNet-50 backbone + FCN head, NHWC."""

    num_classes: int = 2
    layers: Sequence[int] = (3, 4, 6, 3)
    track_stats: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="stem_conv")(x)
        y = InstanceNorm(name="stem_bn", track_stats=self.track_stats)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # torchvision fcn_resnet50: replace_stride_with_dilation=[False, True, True].
        # torchvision's _make_layer folds the stride of a dilated layer into
        # self.dilation AFTER recording previous_dilation — so the FIRST block
        # of layer3 runs at dilation 1 (and of layer4 at dilation 2), while
        # the remaining blocks use the new dilation.
        specs = [
            (64, 1, 1, 1),     # layer1: (feats, stride, first_dil, rest_dil)
            (128, 2, 1, 1),    # layer2
            (256, 1, 1, 2),    # layer3 (dilated, stride folded into dilation)
            (512, 1, 2, 4),    # layer4
        ]
        for li, ((feats, stride, dil0, dil), blocks) in enumerate(zip(specs, self.layers)):
            for b in range(blocks):
                y = Bottleneck(
                    feats,
                    stride=stride if b == 0 else 1,
                    dilation=dil0 if b == 0 else dil,
                    track_stats=self.track_stats,
                    name=f"layer{li+1}_{b}",
                )(y)

        # FCN head (torchvision FCNHead): 3x3 conv -> norm -> relu -> 1x1
        y = nn.Conv(512, (3, 3), padding=1, use_bias=False, name="head_conv")(y)
        y = InstanceNorm(name="head_bn", track_stats=self.track_stats)(y)
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

        self.params = load_params(ckpt_dir, name="params_best")
        # reference-converted checkpoints carry running stats (eval-mode IN)
        track = "mean" in self.params.get("params", {}).get("stem_bn", {})
        self.model = FCNResNet50(num_classes=num_classes, track_stats=track)
        self._apply = jax.jit(lambda p, x: jnp.argmax(self.model.apply(p, x), -1))

    def predict(self, rgb: np.ndarray) -> np.ndarray:
        """rgb: [H, W, 3] float in [0,1] → int labels [H, W]."""
        out = self._apply(self.params, jnp.asarray(rgb, jnp.float32)[None])
        return np.asarray(out[0])
