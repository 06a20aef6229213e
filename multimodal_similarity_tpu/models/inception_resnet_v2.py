"""InceptionResNetV2 trunk, architecture-exact to TF-slim.

The Honda pipeline's per-frame video features are the 8x8x1536
``Conv2d_7b_1x1`` conv endpoint of slim inception_resnet_v2 at 299x299
input (reference preprocess/feat_extract_ResNetV2.py:10-72; consumed as
feat_dim['resnet'] = (8, 8, 1536), configs/base_config.py:51).  This is
that trunk in flax: VALID-padded stem, Mixed_5b, 10x block35 (scale
0.17), Mixed_6a, 20x block17 (scale 0.10), Mixed_7a, 9x block8 (scale
0.20) + the final unactivated Block8, Conv2d_7b_1x1 — stopping at the
conv endpoint (no PreLogits/Logits: the reference never uses them for
Honda features).

Naming follows the slim scope tree joined with underscores (e.g.
``Repeat_block35_3_Branch_2_Conv2d_0b_3x3``), so slim checkpoints graft
via :func:`slim_graft.graft_slim_variables` with prefix
``InceptionResnetV2``.  BatchNorm: beta-only, eps 0.001 (slim
inception_resnet_v2_arg_scope); the residual-projection ``Conv2d_1x1``
convs carry biases and no BatchNorm, exactly as in slim.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

ENDPOINT_CHANNELS: Dict[str, int] = {
    "Conv2d_1a_3x3": 32, "Conv2d_2a_3x3": 32, "Conv2d_2b_3x3": 64,
    "Conv2d_3b_1x1": 80, "Conv2d_4a_3x3": 192, "Mixed_5b": 320,
    "Mixed_6a": 1088, "Mixed_7a": 2080, "Conv2d_7b_1x1": 1536,
}


class InceptionResNetV2(nn.Module):
    """Trunk to the Conv2d_7b_1x1 endpoint ([B, 8, 8, 1536] at 299x299)."""

    capture_endpoints: bool = False

    def _conv_bn(self, name: str, x, features: int, kernel, stride=1,
                 padding="SAME", train: bool = False):
        x = nn.Conv(features, kernel, strides=(stride, stride),
                    padding=padding, use_bias=False, name=name)(x)
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         momentum=0.9997, epsilon=0.001,
                         name=f"{name}_BatchNorm")(x)
        return nn.relu(x)

    def _proj(self, name: str, x, features: int):
        """Residual projection: biased 1x1 conv, no BN, no activation."""
        return nn.Conv(features, (1, 1), padding="SAME", use_bias=True,
                       name=name)(x)

    def _block35(self, scope: str, x, train: bool):
        r0 = self._conv_bn(f"{scope}_Branch_0_Conv2d_1x1", x, 32, (1, 1),
                           train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0a_1x1", x, 32, (1, 1),
                           train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0b_3x3", r1, 32,
                           (3, 3), train=train)
        r2 = self._conv_bn(f"{scope}_Branch_2_Conv2d_0a_1x1", x, 32, (1, 1),
                           train=train)
        r2 = self._conv_bn(f"{scope}_Branch_2_Conv2d_0b_3x3", r2, 48,
                           (3, 3), train=train)
        r2 = self._conv_bn(f"{scope}_Branch_2_Conv2d_0c_3x3", r2, 64,
                           (3, 3), train=train)
        up = self._proj(f"{scope}_Conv2d_1x1",
                        jnp.concatenate([r0, r1, r2], -1), x.shape[-1])
        return nn.relu(x + 0.17 * up)

    def _block17(self, scope: str, x, train: bool):
        r0 = self._conv_bn(f"{scope}_Branch_0_Conv2d_1x1", x, 192, (1, 1),
                           train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0a_1x1", x, 128,
                           (1, 1), train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0b_1x7", r1, 160,
                           (1, 7), train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0c_7x1", r1, 192,
                           (7, 1), train=train)
        up = self._proj(f"{scope}_Conv2d_1x1",
                        jnp.concatenate([r0, r1], -1), x.shape[-1])
        return nn.relu(x + 0.10 * up)

    def _block8(self, scope: str, x, train: bool, scale=0.20,
                activate=True):
        r0 = self._conv_bn(f"{scope}_Branch_0_Conv2d_1x1", x, 192, (1, 1),
                           train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0a_1x1", x, 192,
                           (1, 1), train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0b_1x3", r1, 224,
                           (1, 3), train=train)
        r1 = self._conv_bn(f"{scope}_Branch_1_Conv2d_0c_3x1", r1, 256,
                           (3, 1), train=train)
        up = self._proj(f"{scope}_Conv2d_1x1",
                        jnp.concatenate([r0, r1], -1), x.shape[-1])
        out = x + scale * up
        return nn.relu(out) if activate else out

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        endpoints: Dict[str, Array] = {}
        h = self._conv_bn("Conv2d_1a_3x3", x, 32, (3, 3), stride=2,
                          padding="VALID", train=train)
        endpoints["Conv2d_1a_3x3"] = h
        h = self._conv_bn("Conv2d_2a_3x3", h, 32, (3, 3), padding="VALID",
                          train=train)
        endpoints["Conv2d_2a_3x3"] = h
        h = self._conv_bn("Conv2d_2b_3x3", h, 64, (3, 3), train=train)
        endpoints["Conv2d_2b_3x3"] = h
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        h = self._conv_bn("Conv2d_3b_1x1", h, 80, (1, 1), padding="VALID",
                          train=train)
        endpoints["Conv2d_3b_1x1"] = h
        h = self._conv_bn("Conv2d_4a_3x3", h, 192, (3, 3), padding="VALID",
                          train=train)
        endpoints["Conv2d_4a_3x3"] = h
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")

        # Mixed_5b (Inception-A base)
        r0 = self._conv_bn("Mixed_5b_Branch_0_Conv2d_1x1", h, 96, (1, 1),
                           train=train)
        r1 = self._conv_bn("Mixed_5b_Branch_1_Conv2d_0a_1x1", h, 48, (1, 1),
                           train=train)
        r1 = self._conv_bn("Mixed_5b_Branch_1_Conv2d_0b_5x5", r1, 64,
                           (5, 5), train=train)
        r2 = self._conv_bn("Mixed_5b_Branch_2_Conv2d_0a_1x1", h, 64, (1, 1),
                           train=train)
        r2 = self._conv_bn("Mixed_5b_Branch_2_Conv2d_0b_3x3", r2, 96,
                           (3, 3), train=train)
        r2 = self._conv_bn("Mixed_5b_Branch_2_Conv2d_0c_3x3", r2, 96,
                           (3, 3), train=train)
        # TF/slim average pooling EXCLUDES padded cells from the
        # denominator; flax defaults to including them (border divergence
        # caught by the keras cross-implementation parity test)
        p = nn.avg_pool(h, (3, 3), strides=(1, 1), padding="SAME",
                        count_include_pad=False)
        r3 = self._conv_bn("Mixed_5b_Branch_3_Conv2d_0b_1x1", p, 64, (1, 1),
                           train=train)
        h = jnp.concatenate([r0, r1, r2, r3], -1)
        endpoints["Mixed_5b"] = h

        for i in range(1, 11):
            h = self._block35(f"Repeat_block35_{i}", h, train)

        # Mixed_6a (reduction)
        r0 = self._conv_bn("Mixed_6a_Branch_0_Conv2d_1a_3x3", h, 384,
                           (3, 3), stride=2, padding="VALID", train=train)
        r1 = self._conv_bn("Mixed_6a_Branch_1_Conv2d_0a_1x1", h, 256,
                           (1, 1), train=train)
        r1 = self._conv_bn("Mixed_6a_Branch_1_Conv2d_0b_3x3", r1, 256,
                           (3, 3), train=train)
        r1 = self._conv_bn("Mixed_6a_Branch_1_Conv2d_1a_3x3", r1, 384,
                           (3, 3), stride=2, padding="VALID", train=train)
        r2 = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        h = jnp.concatenate([r0, r1, r2], -1)
        endpoints["Mixed_6a"] = h

        for i in range(1, 21):
            h = self._block17(f"Repeat_1_block17_{i}", h, train)

        # Mixed_7a (reduction)
        r0 = self._conv_bn("Mixed_7a_Branch_0_Conv2d_0a_1x1", h, 256,
                           (1, 1), train=train)
        r0 = self._conv_bn("Mixed_7a_Branch_0_Conv2d_1a_3x3", r0, 384,
                           (3, 3), stride=2, padding="VALID", train=train)
        r1 = self._conv_bn("Mixed_7a_Branch_1_Conv2d_0a_1x1", h, 256,
                           (1, 1), train=train)
        r1 = self._conv_bn("Mixed_7a_Branch_1_Conv2d_1a_3x3", r1, 288,
                           (3, 3), stride=2, padding="VALID", train=train)
        r2 = self._conv_bn("Mixed_7a_Branch_2_Conv2d_0a_1x1", h, 256,
                           (1, 1), train=train)
        r2 = self._conv_bn("Mixed_7a_Branch_2_Conv2d_0b_3x3", r2, 288,
                           (3, 3), train=train)
        r2 = self._conv_bn("Mixed_7a_Branch_2_Conv2d_1a_3x3", r2, 320,
                           (3, 3), stride=2, padding="VALID", train=train)
        r3 = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        h = jnp.concatenate([r0, r1, r2, r3], -1)
        endpoints["Mixed_7a"] = h

        for i in range(1, 10):
            h = self._block8(f"Repeat_2_block8_{i}", h, train)
        h = self._block8("Block8", h, train, scale=1.0, activate=False)

        h = self._conv_bn("Conv2d_7b_1x1", h, 1536, (1, 1), train=train)
        endpoints["Conv2d_7b_1x1"] = h
        if self.capture_endpoints:
            return h, endpoints
        return h
