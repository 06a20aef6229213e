"""Generic TF-slim checkpoint -> flax variable grafting.

Works for any flax module following this package's slim-naming
convention: every slim conv scope ``A/B/Conv2d_x`` is the flat flax
module name ``A_B_Conv2d_x`` (+ ``_BatchNorm`` for its batch norm, or
``_depthwise``/``_pointwise`` for separable stems), so slim->flax is a
pure string rewrite.  Used by InceptionV2 (reference networks.py:916-947),
InceptionV1 (reference preprocess/feat_extract_GoogleNet.py:10-45), and
InceptionResNetV2 (reference preprocess/feat_extract_ResNetV2.py:10-72).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# scopes with no trunk counterpart in any of the slim nets
_SKIP_PREFIXES = ("Logits", "AuxLogits")
_SKIP_SUFFIXES = ("/Momentum", "/RMSProp", "/RMSProp_1", "/Adam", "/Adam_1")


def slim_to_flax(slim_name: str, prefix: str) -> Optional[Tuple[str, ...]]:
    """Map one slim variable name to (collection, module, param); None for
    variables with no trunk counterpart (Logits / optimizer slots)."""
    name = slim_name
    if name.startswith(prefix + "/"):
        name = name[len(prefix) + 1:]
    if name.startswith(_SKIP_PREFIXES) or name == "global_step" \
            or "/ExponentialMovingAverage" in name \
            or name.endswith(_SKIP_SUFFIXES):
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
                         slim_vars: Dict[str, np.ndarray],
                         prefix: str) -> Dict[str, Any]:
    """Graft a slim checkpoint (name -> array dict, e.g. from an .npz
    conversion of the slim .ckpt) into a module's init variables.

    Every trunk variable in ``slim_vars`` must land (shape-checked) and
    every flax parameter must be covered — partial grafts raise.  Returns
    a new variables dict (collections ``params`` / ``batch_stats``).
    """
    params = {k: dict(v) for k, v in variables["params"].items()}
    stats = {k: dict(v) for k, v in variables.get("batch_stats", {}).items()}
    out = {"params": params, "batch_stats": stats}
    covered = {("params", m, p): False
               for m, d in params.items() for p in d}
    covered.update({("batch_stats", m, p): False
                    for m, d in stats.items() for p in d})

    for slim_name, value in slim_vars.items():
        dest = slim_to_flax(slim_name, prefix)
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


def graft_slim_npz(variables: Dict[str, Any], path: str,
                   prefix: str) -> Dict[str, Any]:
    """Graft from an .npz of {slim variable name: array}."""
    with np.load(path) as data:
        return graft_slim_variables(variables, dict(data), prefix)
