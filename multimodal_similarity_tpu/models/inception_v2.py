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

from typing import Any, Dict, Optional, Tuple

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
            p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
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
# slim checkpoint grafting
# ---------------------------------------------------------------------------

def _slim_to_flax(slim_name: str) -> Optional[Tuple[str, ...]]:
    """Map one slim variable name to (collection, module, param) or None
    for variables that have no trunk counterpart (Logits / optimizer
    slots)."""
    name = slim_name
    if name.startswith("InceptionV2/"):
        name = name[len("InceptionV2/"):]
    if name.startswith("Logits") or "/ExponentialMovingAverage" in name \
            or name.endswith(("/Momentum", "/RMSProp", "/RMSProp_1",
                              "/Adam", "/Adam_1")) or name == "global_step":
        return None
    parts = name.split("/")
    leaf = parts[-1]
    if leaf == "depthwise_weights":
        return ("params", "_".join(parts[:-1]) + "_depthwise", "kernel")
    if leaf == "pointwise_weights":
        return ("params", "_".join(parts[:-1]) + "_pointwise", "kernel")
    if leaf == "weights":
        return ("params", "_".join(parts[:-1]), "kernel")
    if leaf == "biases":
        return ("params", "_".join(parts[:-1]), "bias")
    if len(parts) >= 2 and parts[-2] == "BatchNorm":
        scope = "_".join(parts[:-2]) + "_BatchNorm"
        if leaf == "beta":
            return ("params", scope, "bias")
        if leaf == "gamma":
            return ("params", scope, "scale")
        if leaf == "moving_mean":
            return ("batch_stats", scope, "mean")
        if leaf == "moving_variance":
            return ("batch_stats", scope, "var")
    raise KeyError(f"unrecognized slim variable: {slim_name}")


def graft_slim_variables(variables: Dict[str, Any],
                         slim_vars: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Graft a slim InceptionV2 checkpoint (name -> array dict, e.g. from
    an .npz conversion of inception_v2.ckpt) into this module's variables.

    ``variables`` is the dict returned by ``InceptionV2().init(...)``
    (collections ``params`` and ``batch_stats``).  Every trunk variable in
    ``slim_vars`` must land (shape-checked); every flax parameter must be
    covered — partial grafts raise.  Returns a new variables dict.
    """
    params = {k: dict(v) for k, v in variables["params"].items()}
    stats = {k: dict(v) for k, v in variables["batch_stats"].items()}
    out = {"params": params, "batch_stats": stats}
    covered = {("params", m, p): False
               for m, d in params.items() for p in d}
    covered.update({("batch_stats", m, p): False
                    for m, d in stats.items() for p in d})

    for slim_name, value in slim_vars.items():
        dest = _slim_to_flax(slim_name)
        if dest is None:
            continue
        coll, module, leaf = dest
        tree = out[coll]
        if module not in tree or leaf not in tree[module]:
            raise KeyError(f"{slim_name} -> {dest}: no such flax parameter")
        value = np.asarray(value)
        if slim_name.split("/")[-1] == "depthwise_weights":
            # slim depthwise [H, W, C, M] -> flax grouped-conv kernel
            # [H, W, 1, C*M] (output channel ordering c*M + m matches
            # tf.nn.depthwise_conv2d)
            h, w, c, m = value.shape
            value = value.reshape(h, w, 1, c * m)
        want = tuple(np.shape(tree[module][leaf]))
        if tuple(value.shape) != want:
            raise ValueError(
                f"{slim_name}: shape {value.shape} != flax {want}")
        tree[module][leaf] = jnp.asarray(value)
        covered[(coll, module, leaf)] = True

    missing = sorted(k for k, v in covered.items() if not v)
    if missing:
        raise KeyError(f"slim checkpoint leaves {len(missing)} flax "
                       f"parameters unset, e.g. {missing[:4]}")
    return out


def graft_slim_npz(variables: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Graft from an .npz of {slim variable name: array}."""
    with np.load(path) as data:
        return graft_slim_variables(variables, dict(data))
