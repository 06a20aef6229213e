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

# pipeline-parallel unit layout (parallel/pipeline.py): the trunk
# decomposes into 44 sequential units — stem, Mixed_5b, 10x block35,
# Mixed_6a, 20x block17, Mixed_7a, 9x block8, final Block8+Conv2d_7b.
N_PIPELINE_UNITS = 44


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

    def _stem(self, x, train: bool, endpoints: Dict[str, Array]):
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
        return nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")

    def _mixed_5b(self, h, train: bool):
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
        return jnp.concatenate([r0, r1, r2, r3], -1)

    def _mixed_6a(self, h, train: bool):
        r0 = self._conv_bn("Mixed_6a_Branch_0_Conv2d_1a_3x3", h, 384,
                           (3, 3), stride=2, padding="VALID", train=train)
        r1 = self._conv_bn("Mixed_6a_Branch_1_Conv2d_0a_1x1", h, 256,
                           (1, 1), train=train)
        r1 = self._conv_bn("Mixed_6a_Branch_1_Conv2d_0b_3x3", r1, 256,
                           (3, 3), train=train)
        r1 = self._conv_bn("Mixed_6a_Branch_1_Conv2d_1a_3x3", r1, 384,
                           (3, 3), stride=2, padding="VALID", train=train)
        r2 = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([r0, r1, r2], -1)

    def _mixed_7a(self, h, train: bool):
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
        return jnp.concatenate([r0, r1, r2, r3], -1)

    def _units(self, train: bool, endpoints: Dict[str, Array]):
        """The trunk as N_PIPELINE_UNITS sequential (name, fn) units.

        Every unit is a pure h -> h closure creating its own (explicitly
        named) parameters, so any contiguous run [lo, hi) is a valid
        sub-network: parallel/pipeline.py partitions the units into
        pipeline stages and inits/applies each stage independently."""
        units = [("stem", lambda h: self._stem(h, train, endpoints))]
        units.append(("Mixed_5b", lambda h: self._mixed_5b(h, train)))
        for i in range(1, 11):
            units.append((f"block35_{i}",
                          lambda h, i=i: self._block35(
                              f"Repeat_block35_{i}", h, train)))
        units.append(("Mixed_6a", lambda h: self._mixed_6a(h, train)))
        for i in range(1, 21):
            units.append((f"block17_{i}",
                          lambda h, i=i: self._block17(
                              f"Repeat_1_block17_{i}", h, train)))
        units.append(("Mixed_7a", lambda h: self._mixed_7a(h, train)))
        for i in range(1, 10):
            units.append((f"block8_{i}",
                          lambda h, i=i: self._block8(
                              f"Repeat_2_block8_{i}", h, train)))

        def final(h):
            h = self._block8("Block8", h, train, scale=1.0, activate=False)
            return self._conv_bn("Conv2d_7b_1x1", h, 1536, train=train,
                                 kernel=(1, 1))
        units.append(("final", final))
        assert len(units) == N_PIPELINE_UNITS
        return units

    @nn.compact
    def __call__(self, x: Array, train: bool = False, unit_lo: int = 0,
                 unit_hi: int = N_PIPELINE_UNITS):
        """Full forward by default; ``unit_lo``/``unit_hi`` run only the
        units in [lo, hi) — the segmented form pipeline parallelism
        applies per stage (the input is then the previous stage's
        activation, not an image)."""
        if self.capture_endpoints and (unit_lo, unit_hi) != (
                0, N_PIPELINE_UNITS):
            raise ValueError("capture_endpoints needs the full unit range")
        endpoints: Dict[str, Array] = {}
        h = x
        names = {"Mixed_5b", "Mixed_6a", "Mixed_7a"}
        for name, fn in self._units(train, endpoints)[unit_lo:unit_hi]:
            h = fn(h)
            if name in names:
                endpoints[name] = h
        endpoints["Conv2d_7b_1x1"] = h
        if self.capture_endpoints:
            return h, endpoints
        return h
