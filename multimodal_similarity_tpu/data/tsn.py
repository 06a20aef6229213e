"""Input preparation: TSN segment sampling and fixed-length RNN padding.

Reference: utils.py:362-422.  Host (NumPy) versions reproduce the exact
sampling scheme; a device version expresses the random offsets as a pure
function of a PRNG key so on-device re-sampling per step is deterministic
and jit-safe.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def tsn_prepare_input(n_seg: int, feat: np.ndarray,
                      rng: np.random.RandomState | None = None) -> np.ndarray:
    """Random per-segment frame sampling (train time, utils.py:386-399).

    feat -- [time_steps, ...]; returns [1, n_seg, ...]."""
    randint = (rng.randint if rng is not None else np.random.randint)
    average_duration = feat.shape[0] // n_seg
    if average_duration <= 0:
        raise NotImplementedError(
            f"sequence of {feat.shape[0]} frames too short for {n_seg} segments")
    offsets = np.multiply(range(n_seg), average_duration) + \
        randint(average_duration, size=n_seg)
    return np.expand_dims(feat[offsets].astype("float32"), 0)


def tsn_prepare_input_test(n_seg: int, feat: np.ndarray) -> np.ndarray:
    """Center-frame sampling (test time, utils.py:401-411)."""
    average_duration = feat.shape[0] // n_seg
    offsets = np.array([int(average_duration / 2.0 + average_duration * x)
                        for x in range(n_seg)])
    return np.expand_dims(feat[offsets].astype("float32"), 0)


def rnn_prepare_input(max_time: int, feat: np.ndarray) -> np.ndarray:
    """Zero-pad / truncate to max_time frames (utils.py:362-373).

    Returns [1, max_time, ...]."""
    new_feat = np.zeros((max_time,) + feat.shape[1:], dtype="float32")
    if feat.shape[0] > max_time:
        new_feat = feat[:max_time].astype("float32")
    else:
        new_feat[: feat.shape[0]] = feat
    return np.expand_dims(new_feat, 0)


def make_prepare_input(network: str, n_seg: int = 3, max_time: int = 90,
                       train: bool = True) -> Callable:
    """prepare_input factory mirroring the per-model functools.partial
    bindings (networks.py:22-24, :576)."""
    if network == "convlstm":
        return functools.partial(rnn_prepare_input, max_time)
    if train:
        return functools.partial(tsn_prepare_input, n_seg)
    return functools.partial(tsn_prepare_input_test, n_seg)


# ---------------------------------------------------------------------------
# Device versions
# ---------------------------------------------------------------------------

def tsn_sample_offsets(key: jax.Array, seq_len: jnp.ndarray,
                       n_seg: int) -> jnp.ndarray:
    """Per-event random TSN offsets on device.

    seq_len -- [B] true frame counts; returns [B, n_seg] int32 frame indices
    (segment start + uniform offset within the segment), matching the host
    sampler for seq_len >= n_seg.
    """
    b = seq_len.shape[0]
    avg = jnp.maximum(seq_len // n_seg, 1)                     # [B]
    base = jnp.arange(n_seg)[None, :] * avg[:, None]           # [B, S]
    u = jax.random.uniform(key, (b, n_seg))
    offs = (u * avg[:, None]).astype(jnp.int32)
    return jnp.minimum(base + offs, (seq_len - 1)[:, None])


def tsn_center_offsets(seq_len: jnp.ndarray, n_seg: int) -> jnp.ndarray:
    """Deterministic center-frame offsets on device (test time)."""
    avg = jnp.maximum(seq_len // n_seg, 1)
    base = jnp.arange(n_seg)[None, :] * avg[:, None]
    return jnp.minimum(base + avg[:, None] // 2, (seq_len - 1)[:, None])


def mean_pool_input(feat: np.ndarray, flatten: bool = True) -> np.ndarray:
    """Mean pooling preprocess (utils.py:268-277)."""
    new_feat = np.mean(feat, axis=0)
    if flatten:
        new_feat = new_feat.flatten()
    return np.expand_dims(new_feat, 0)


def max_pool_input(feat: np.ndarray, flatten: bool = True) -> np.ndarray:
    """Max pooling preprocess (utils.py:279-288)."""
    new_feat = np.max(feat, axis=0)
    if flatten:
        new_feat = new_feat.flatten()
    return np.expand_dims(new_feat, 0)
