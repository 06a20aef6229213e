"""InceptionV1 (GoogLeNet) backbone, architecture-exact to TF-slim.

The reference extracts 1024-d CUB / Stanford40 image features from slim
inception_v1's global-average ``AvgPool_0a_7x7`` endpoint
(preprocess/feat_extract_GoogleNet.py:10-45, features consumed by
src/base_model_CUB.py:161-165).  Same slim block table here, including
slim's Branch_2 3x3 quirk (the original paper uses 5x5; the released
checkpoint was trained with 3x3), beta-only BatchNorm, SAME padding
throughout.  Slim checkpoints graft via
:func:`slim_graft.graft_slim_variables` with prefix ``InceptionV1``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

# (name, b0, (b1a, b1b), (b2a, b2b), b3) — slim inception_v1.py table
_BLOCKS_3 = (
    ("Mixed_3b", 64, (96, 128), (16, 32), 32),
    ("Mixed_3c", 128, (128, 192), (32, 96), 64),
)
_BLOCKS_4 = (
    ("Mixed_4b", 192, (96, 208), (16, 48), 64),
    ("Mixed_4c", 160, (112, 224), (24, 64), 64),
    ("Mixed_4d", 128, (128, 256), (24, 64), 64),
    ("Mixed_4e", 112, (144, 288), (32, 64), 64),
    ("Mixed_4f", 256, (160, 320), (32, 128), 128),
)
_BLOCKS_5 = (
    ("Mixed_5b", 256, (160, 320), (32, 128), 128),
    ("Mixed_5c", 384, (192, 384), (48, 128), 128),
)

ENDPOINT_CHANNELS: Dict[str, int] = {
    "Conv2d_1a_7x7": 64, "Conv2d_2b_1x1": 64, "Conv2d_2c_3x3": 192,
    "Mixed_3b": 256, "Mixed_3c": 480, "Mixed_4b": 512, "Mixed_4c": 512,
    "Mixed_4d": 512, "Mixed_4e": 528, "Mixed_4f": 832, "Mixed_5b": 832,
    "Mixed_5c": 1024,
}


class InceptionV1(nn.Module):
    """Trunk to the 1024-d global-average endpoint (AvgPool_0a_7x7)."""

    capture_endpoints: bool = False

    def _conv_bn(self, name: str, x, features: int, kernel, stride=1,
                 train: bool = False):
        x = nn.Conv(features, kernel, strides=(stride, stride),
                    padding="SAME", use_bias=False, name=name)(x)
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         momentum=0.9997, epsilon=0.001,
                         name=f"{name}_BatchNorm")(x)
        return nn.relu(x)

    def _block(self, name: str, x, b0, b1, b2, b3, train: bool):
        r0 = self._conv_bn(f"{name}_Branch_0_Conv2d_0a_1x1", x, b0, (1, 1),
                           train=train)
        r1 = self._conv_bn(f"{name}_Branch_1_Conv2d_0a_1x1", x, b1[0],
                           (1, 1), train=train)
        r1 = self._conv_bn(f"{name}_Branch_1_Conv2d_0b_3x3", r1, b1[1],
                           (3, 3), train=train)
        r2 = self._conv_bn(f"{name}_Branch_2_Conv2d_0a_1x1", x, b2[0],
                           (1, 1), train=train)
        # slim scope quirk: Mixed_5b's Branch_2 second conv is Conv2d_0a_3x3
        # in the released checkpoint (every other block uses 0b)
        b2_suffix = "0a" if name == "Mixed_5b" else "0b"
        r2 = self._conv_bn(f"{name}_Branch_2_Conv2d_{b2_suffix}_3x3", r2,
                           b2[1], (3, 3), train=train)
        p = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        r3 = self._conv_bn(f"{name}_Branch_3_Conv2d_0b_1x1", p, b3, (1, 1),
                           train=train)
        return jnp.concatenate([r0, r1, r2, r3], axis=-1)

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        endpoints: Dict[str, Array] = {}
        h = self._conv_bn("Conv2d_1a_7x7", x, 64, (7, 7), stride=2,
                          train=train)
        endpoints["Conv2d_1a_7x7"] = h
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        h = self._conv_bn("Conv2d_2b_1x1", h, 64, (1, 1), train=train)
        endpoints["Conv2d_2b_1x1"] = h
        h = self._conv_bn("Conv2d_2c_3x3", h, 192, (3, 3), train=train)
        endpoints["Conv2d_2c_3x3"] = h
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        for name, b0, b1, b2, b3 in _BLOCKS_3:
            h = self._block(name, h, b0, b1, b2, b3, train)
            endpoints[name] = h
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        for name, b0, b1, b2, b3 in _BLOCKS_4:
            h = self._block(name, h, b0, b1, b2, b3, train)
            endpoints[name] = h
        h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        for name, b0, b1, b2, b3 in _BLOCKS_5:
            h = self._block(name, h, b0, b1, b2, b3, train)
            endpoints[name] = h
        pool5 = jnp.mean(h, axis=(1, 2))        # AvgPool_0a_7x7 -> [B, 1024]
        if self.capture_endpoints:
            return pool5, endpoints
        return pool5
