"""InceptionV2 (BN-Inception) backbone, architecture-exact to TF-slim.

The reference builds the slim InceptionV2 graph in-model for end-to-end
CUB training and takes the global-average ``AvgPool_1a`` 1024-d endpoint
(reference src/networks.py:916-947, consumed by src/base_CUB.py:145).
This is that architecture in flax — same stem (depthwise-separable 7x7),
same Mixed_3b..Mixed_5c inception blocks, same SAME-padded pooling — so
an ImageNet slim checkpoint grafts in one-to-one (no pretrained weights
can be bundled in this zero-egress build; :func:`graft_slim_variables`
maps the slim variable names the moment a converted checkpoint is
mounted).

Naming: every slim conv scope ``A/B/Conv2d_x`` becomes the flat flax
module name ``A_B_Conv2d_x`` (+ ``_BatchNorm`` for its batch norm), which
keeps the slim->flax mapping a pure string rewrite (see _slim_to_flax).

BatchNorm follows the slim inception arg scope: beta only (no gamma),
eps=0.001, decay=0.9997.  Running statistics live in the ``batch_stats``
collection; pass ``train=True`` with ``mutable=["batch_stats"]`` to
update them.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray

# (name, b0, (b1a, b1b), (b2a, b2b), b3, pool kind) — slim inception_v2.py
# block table at depth_multiplier=1; b2's two 3x3 convs share b2b.
_BLOCKS = (
    ("Mixed_3b", 64, (64, 64), (64, 96), 32, "avg"),
    ("Mixed_3c", 64, (64, 96), (64, 96), 64, "avg"),
    ("Mixed_4a", None, (128, 160), (64, 96), None, "reduce"),
    ("Mixed_4b", 224, (64, 96), (96, 128), 128, "avg"),
    ("Mixed_4c", 192, (96, 128), (96, 128), 128, "avg"),
    ("Mixed_4d", 160, (128, 160), (128, 160), 96, "avg"),
    ("Mixed_4e", 96, (128, 192), (160, 192), 96, "avg"),
    ("Mixed_5a", None, (128, 192), (192, 256), None, "reduce"),
    ("Mixed_5b", 352, (192, 320), (160, 224), 128, "avg"),
    ("Mixed_5c", 352, (192, 320), (192, 224), 128, "max"),
)

# endpoint -> channel count, for shape tests and graft validation
ENDPOINT_CHANNELS = {
    "Conv2d_1a_7x7": 64, "Conv2d_2b_1x1": 64, "Conv2d_2c_3x3": 192,
    "Mixed_3b": 256, "Mixed_3c": 320, "Mixed_4a": 576, "Mixed_4b": 576,
    "Mixed_4c": 576, "Mixed_4d": 576, "Mixed_4e": 576, "Mixed_5a": 1024,
    "Mixed_5b": 1024, "Mixed_5c": 1024,
}


class InceptionV2(nn.Module):
    """Trunk to the 1024-d AvgPool_1a endpoint (optionally all endpoints)."""

    capture_endpoints: bool = False

    def _conv_bn(self, name: str, x, features: int, kernel, stride=1,
                 train: bool = False):
        x = nn.Conv(features, kernel, strides=(stride, stride),
                    padding="SAME", use_bias=False, name=name)(x)
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         momentum=0.9997, epsilon=0.001,
                         name=f"{name}_BatchNorm")(x)
        return nn.relu(x)

    def _block(self, name: str, x, spec, train: bool):
        _, b0, b1, b2, b3, pool = spec
        if pool == "reduce":
            r0 = self._conv_bn(f"{name}_Branch_0_Conv2d_0a_1x1", x, b1[0],
                               (1, 1), train=train)
            r0 = self._conv_bn(f"{name}_Branch_0_Conv2d_1a_3x3", r0, b1[1],
                               (3, 3), stride=2, train=train)
            r1 = self._conv_bn(f"{name}_Branch_1_Conv2d_0a_1x1", x, b2[0],
                               (1, 1), train=train)
            r1 = self._conv_bn(f"{name}_Branch_1_Conv2d_0b_3x3", r1, b2[1],
                               (3, 3), train=train)
            r1 = self._conv_bn(f"{name}_Branch_1_Conv2d_1a_3x3", r1, b2[1],
                               (3, 3), stride=2, train=train)
            r2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            return jnp.concatenate([r0, r1, r2], axis=-1)

        r0 = self._conv_bn(f"{name}_Branch_0_Conv2d_0a_1x1", x, b0, (1, 1),
                           train=train)
        r1 = self._conv_bn(f"{name}_Branch_1_Conv2d_0a_1x1", x, b1[0],
                           (1, 1), train=train)
        r1 = self._conv_bn(f"{name}_Branch_1_Conv2d_0b_3x3", r1, b1[1],
                           (3, 3), train=train)
        r2 = self._conv_bn(f"{name}_Branch_2_Conv2d_0a_1x1", x, b2[0],
                           (1, 1), train=train)
        r2 = self._conv_bn(f"{name}_Branch_2_Conv2d_0b_3x3", r2, b2[1],
                           (3, 3), train=train)
        r2 = self._conv_bn(f"{name}_Branch_2_Conv2d_0c_3x3", r2, b2[1],
                           (3, 3), train=train)
        if pool == "avg":
            # slim avg_pool excludes padded cells from the denominator
            p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                            count_include_pad=False)
            pname = f"{name}_Branch_3_Conv2d_0b_1x1"
        else:  # Mixed_5c uses a max pool in its pool branch
            p = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
            pname = f"{name}_Branch_3_Conv2d_0b_1x1"
        r3 = self._conv_bn(pname, p, b3, (1, 1), train=train)
        return jnp.concatenate([r0, r1, r2, r3], axis=-1)

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        endpoints: Dict[str, Array] = {}
        cin = x.shape[-1]
        # Conv2d_1a_7x7: depthwise-separable, channel multiplier
        # min(64 // cin, 8) (slim: depthwise_multiplier), stride 2
        mult = min(64 // cin, 8)
        h = nn.Conv(cin * mult, (7, 7), strides=(2, 2), padding="SAME",
                    feature_group_count=cin, use_bias=False,
                    name="Conv2d_1a_7x7_depthwise")(x)
        h = nn.Conv(64, (1, 1), padding="SAME", use_bias=False,
                    name="Conv2d_1a_7x7_pointwise")(h)
        h = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         momentum=0.9997, epsilon=0.001,
                         name="Conv2d_1a_7x7_BatchNorm")(h)
        h = nn.relu(h)
        endpoints["Conv2d_1a_7x7"] = h
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        h = self._conv_bn("Conv2d_2b_1x1", h, 64, (1, 1), train=train)
        endpoints["Conv2d_2b_1x1"] = h
        h = self._conv_bn("Conv2d_2c_3x3", h, 192, (3, 3), train=train)
        endpoints["Conv2d_2c_3x3"] = h
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        for spec in _BLOCKS:
            h = self._block(spec[0], h, spec, train)
            endpoints[spec[0]] = h
        pool5 = jnp.mean(h, axis=(1, 2))          # AvgPool_1a -> [B, 1024]
        if self.capture_endpoints:
            return pool5, endpoints
        return pool5


# ---------------------------------------------------------------------------
# slim checkpoint grafting (generic machinery in models/slim_graft.py)
# ---------------------------------------------------------------------------

from multimodal_similarity_tpu.models import slim_graft as _graft


def graft_slim_variables(variables: Dict[str, Any],
                         slim_vars: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Graft a slim InceptionV2 checkpoint (name -> array dict, e.g. from
    an .npz conversion of inception_v2.ckpt) into this module's init
    variables.  See slim_graft.graft_slim_variables."""
    return _graft.graft_slim_variables(variables, slim_vars, "InceptionV2")


def graft_slim_npz(variables: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Graft from an .npz of {slim variable name: array}."""
    return _graft.graft_slim_npz(variables, path, "InceptionV2")
