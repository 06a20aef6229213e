"""LSTM layers as lax.scan over time.

The reference's recurrent encoders all use ``tf.contrib.rnn.LSTMCell`` with
``forget_bias=1.0`` (e.g. networks.py:405,541).  This module provides a cell
with the same update rule — gate order (i, j, f, o), +1.0 added to the forget
gate pre-activation, no peepholes, tanh activations — so that behaviour (and,
if ever needed, checkpoint translation) lines up, while the time loop is an
XLA-friendly ``jax.lax.scan`` instead of ``tf.nn.dynamic_rnn``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class TFLSTMCell(nn.Module):
    """LSTM cell matching tf.contrib.rnn.LSTMCell(num_units, forget_bias=1.0).

    State is (c, h).  One fused [x; h] @ W matmul computes all four gates
    (i, j, f, o) — a single MXU call per step.
    """

    features: int
    forget_bias: float = 1.0

    @nn.compact
    def __call__(self, carry: Tuple[Array, Array], x: Array):
        c, h = carry
        gates = nn.Dense(4 * self.features, name="kernel")(
            jnp.concatenate([x, h], axis=-1))
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = (jax.nn.sigmoid(f + self.forget_bias) * c
                 + jax.nn.sigmoid(i) * jnp.tanh(j))
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return (new_c, new_h), new_h


def zero_state(batch: int, features: int, dtype=jnp.float32):
    return (jnp.zeros((batch, features), dtype),
            jnp.zeros((batch, features), dtype))


class LSTM(nn.Module):
    """Unidirectional LSTM over [B, T, D]; returns (outputs [B, T, H],
    final (c, h) state).

    ``initial_state`` lets the Seq2seq decoder start from the encoder's final
    state (networks.py:92).  ``remat`` wraps the cell in jax.checkpoint so
    long sequences trade recompute for activation memory (HBM pressure,
    SURVEY.md §7 / scaling guidance) — numerics are unchanged.
    """

    features: int
    forget_bias: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array,
                 initial_state: Optional[Tuple[Array, Array]] = None):
        if initial_state is None:
            initial_state = zero_state(x.shape[0], self.features, x.dtype)
        cell_cls = nn.remat(TFLSTMCell) if self.remat else TFLSTMCell
        scan = nn.scan(
            cell_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self.features, self.forget_bias, name="cell")
        final_state, outputs = scan(initial_state, x)
        return outputs, final_state


class BiLSTM(nn.Module):
    """Bidirectional LSTM; outputs concat([fw, bw]) aligned to input steps.

    Matches tf.nn.bidirectional_dynamic_rnn semantics: the backward output at
    position t is produced having consumed x[t:] — so outputs[:, -1] holds
    (fw after the full sequence, bw after only the last frame), which is what
    ConvBiRTSN reads (networks.py:504-508).
    """

    features: int  # per-direction size
    forget_bias: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fw, _ = LSTM(self.features, self.forget_bias, name="fw")(x)
        bw, _ = LSTM(self.features, self.forget_bias, name="bw")(x[:, ::-1, :])
        return jnp.concatenate([fw, bw[:, ::-1, :]], axis=-1)
